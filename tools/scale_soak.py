"""Nx scale soak: replicate the sf0.1 tables N-fold into /tmp (ids
offset, document texts perturbed per copy so duplicate statistics stay
realistic instead of every doc gaining N-1 exact clones), then time the
headline operators at both scales and report the wall-time ratio.

A scan-bound narrow operator should scale ~linearly (ratio ≈ N on a
fixed-size executor pool, usually less while cores are underutilized at
1x); superlinear ratios flag operators whose shuffle or candidate
generation grows faster than the input — exactly what breaks first on a
100 TB cluster.

Usage: python tools/scale_soak.py [out_dir] [--factor N] [--fresh]
       [--entries a,b,c]
Default factor 10, out_dir /tmp/vl_scale<N>. Updates ONLY this factor's
section of SCALE.md; other sections (other factors, ingestion
throughput) are preserved.
"""

from __future__ import annotations

import os
import sys
import time

FACTOR = 10
if "--factor" in sys.argv:
    FACTOR = int(sys.argv[sys.argv.index("--factor") + 1])

ENTRIES = [
    "f_word",
    "f_time_range",
    "s_stats_by",
    "s_time_bucket",
    "s_histogram",
    "p_top",
    "p_unpack_json",
    "p_sort_desc_rank",
    "tpch_pricing_summary",
    "tpch_ship_histogram",
    "dp_exact_dedup",
    "dp_minhash_lsh",
    "dp_ngram_jaccard",
    "dp_cosine_threshold",
    "dp_repetition",
    "dp_ngram_repetition",
    "dp_gopher_quality",
    "dp_dup_clusters",
    "dp_unigram_logprob",
    "dp_pack_sequences",
    "dp_repeated_spans",
    "dp_span_dedup",
    "dp_cut_spans",
    "dp_tfidf_terms",
    "dp_dsir_weights",
    "dp_perplexity_buckets",
    "dp_ann_quantized_topk",
    "dp_bigram_logprob",
    "dp_mix_sources",
    "dp_label_centroids",
    "dp_knn_purity",
    "dp_semdedup",
    "dp_semdedup_auto",
    "dp_winnowing",
    "dp_ngram_counts",
    # dp_embedding_near_dup_exact / dp_embedding_clusters_exact are NOT
    # soaked via their registry entries: those pin n_sign_bits=8 for
    # cross-engine snapshot determinism, which is quadratic by design at
    # 100x (the library default is scale-adaptive bits — hand-soaked at
    # 10.2x in the dedicated SCALE.md section)
    "dp_ann_lsh_quantized_topk",
    "dp_ann_ivf_quantized_topk",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    from victorialogs_spark.schema import load_table

    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        out = f"{dst}/{name}.parquet"
        if os.path.exists(out):
            continue
        df = load_table(spark, src, name)
        if name in ("region", "nation", "customer", "supplier", "part", "orders"):
            # dimension-ish tables: copy through unchanged (the soaked
            # queries scale on lineitem/events/documents/embeddings)
            df.write.mode("overwrite").parquet(out)
            continue
        copies = []
        for k in range(FACTOR):
            c = df
            for idc in ("event_id", "doc_id", "vec_id", "l_orderkey"):
                if idc in c.columns:
                    c = c.withColumn(idc, F.col(idc) + F.lit(k * 10_000_000))
            if name == "documents" and k > 0:
                # per-copy suffix: keeps copies near-dup-similar to the
                # original without creating 10-deep exact-dup groups
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copyvariant{k}"))
                )
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(out)
    print(f"built {dst}")


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from victorialogs_spark.driver_entry import QUERIES
    from victorialogs_spark.session import get_spark

    args = sys.argv[1:]
    pos = []
    skip = False
    for i, a in enumerate(args):
        if skip:
            skip = False
            continue
        if a in ("--factor", "--entries"):
            skip = True  # consumes a value
        elif not a.startswith("--"):
            pos.append(a)
    dst = pos[0] if pos else f"/tmp/vl_scale{FACTOR}"
    src = "/root/testdata/sf0.1"
    spark = get_spark("scale-soak")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, dst)

    shuffle_parts = spark.conf.get("spark.sql.shuffle.partitions")

    def best_of(name: str, sf_dir: str, runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        return best

    # min-merge with a prior SCALE.md: the host's co-tenant contention is
    # bursty enough to dominate a whole session's best-of-3, so the
    # reproducible number is the cross-session minimum. Pass --fresh
    # after ANY operator or dataset change — the merge is keyed by query
    # name only and would otherwise mask a real regression forever.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    marker = f"## {FACTOR}x input soak"
    old_text = ""
    try:
        old_text = open(os.path.join(repo, "SCALE.md")).read()
    except OSError:
        pass
    prior: dict[str, tuple[float, float]] = {}
    if "--fresh" not in sys.argv and marker in old_text:
        import re

        section = old_text.split(marker, 1)[1].split("\n## ", 1)[0]
        for line in section.splitlines():
            m = re.match(r"\| (\w+) \| ([0-9.]+) \| ([0-9.]+) \|", line)
            if m:
                prior[m.group(1)] = (float(m.group(2)), float(m.group(3)))

    entries = ENTRIES
    if "--entries" in sys.argv:
        want = sys.argv[sys.argv.index("--entries") + 1].split(",")
        entries = [e for e in want if e in QUERIES]

    rows = []
    for name in entries:
        t1 = best_of(name, src)
        t10 = best_of(name, dst)
        if name in prior:
            t1 = min(t1, prior[name][0])
            t10 = min(t10, prior[name][1])
        ratio = t10 / t1 if t1 > 0 else float("nan")
        rows.append((name, t1, t10, ratio))
        print(f"{name}: {t1:.2f}s -> {t10:.2f}s  ({ratio:.1f}x)", file=sys.stderr)

    # an --entries subset run must not erase the other operators' prior
    # rows from this factor's section — carry them over untouched
    ran = {r[0] for r in rows}
    for name, (p1, pn) in prior.items():
        if name not in ran:
            rows.append((name, p1, pn, pn / p1 if p1 > 0 else float("nan")))
    order = {n: i for i, n in enumerate(ENTRIES)}
    rows.sort(key=lambda r: order.get(r[0], len(ENTRIES)))

    lines = [
        marker,
        "",
        f"Input: sf0.1 tables replicated {FACTOR}x (ids offset; document",
        "texts perturbed per copy so duplicate statistics stay realistic).",
        "Wall-times are the best observed hot run per query, min-merged",
        "across soak sessions unless --fresh is passed (the host's bursty",
        "co-tenant contention — the same query has measured 2.5 s and",
        "14.9 s in different sessions with zero local load — can dominate",
        "a single session's best-of-3). The ratio column",
        f"is t({FACTOR}x)/t(1x). Sub-linear ratios mean the 1x run was",
        "dominated by fixed per-job overhead (idle cores); ratios well",
        f"above {FACTOR} flag superlinear growth UNLESS the operator's",
        "output itself grows superlinearly in this replicated corpus —",
        "see 'Reading the 100x ratios' for the pair-producing operators.",
        "",
        f"| query | t(1x) s | t({FACTOR}x) s | ratio |",
        "|---|---|---|---|",
    ]
    for name, t1, tn, ratio in rows:
        lines.append(f"| {name} | {t1:.2f} | {tn:.2f} | {ratio:.1f}x |")
    total1 = sum(r[1] for r in rows)
    totaln = sum(r[2] for r in rows)
    lines.append(
        f"| **total** | **{total1:.2f}** | **{totaln:.2f}** |"
        f" **{totaln / total1:.1f}x** |"
    )
    section = "\n".join(lines) + "\n"

    # splice: replace this factor's section, keep everything else
    header = "# SCALE — input soaks (generated by tools/scale_soak.py)\n"
    body = old_text
    if body.startswith("# SCALE"):
        body = body.split("\n", 1)[1] if "\n" in body else ""
        # drop the legacy single-table prologue (pre-section format)
        if not body.lstrip().startswith("##"):
            first = body.find("\n## ")
            body = body[first + 1:] if first >= 0 else ""
    if marker in body:
        before, rest = body.split(marker, 1)
        tail = rest.split("\n## ", 1)
        after = ("## " + tail[1]) if len(tail) > 1 else ""
        body = before + section + after
    else:
        body = section + ("\n" + body if body.strip() else "")
    with open(os.path.join(repo, "SCALE.md"), "w") as f:
        f.write(header + "\n" + body.strip() + "\n")
    print("wrote SCALE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
