"""Matched-session A/B variants for the r14 sf1 wave (prototypes live
here; winners move into the library and get re-verified).

Variants:
  lsh/V0  current minhash_near_dups
  lsh/V1  band buckets computed in numpy inside the sketch UDF
          (replaces the per-doc 32x long->string concat_ws + xxhash64)
  lsh/V2  V1 + codegen'd est (32 explicit element comparisons instead of
          interpreted zip_with/filter HOFs)
  lsh/V3  V2 with .distinct() dropped — ATTRIBUTION ONLY (not
          semantics-preserving): prices the second exchange
  clus/W0 current dup_clusters
  clus/W1 connected_components normalizing u<v before distinct
          (halves the checkpointed edge set; driver path skips the
          symmetrize entirely)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 4
    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else ""
    sf_dir = os.path.join(HERE, ".bench_sf1")

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.session import get_spark

    spark = get_spark("sf1-wave2-ab")
    spark.sparkContext.setLogLevel("ERROR")

    from victorialogs_spark.schema import load_table

    load_table(spark, sf_dir, "lineitem").count()

    def _noop(s):
        return s

    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    noop = F.pandas_udf(_noop, "string")
    docs0 = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs0.select(noop(F.col("text"))).write.format("noop").mode("overwrite").save()

    from victorialogs_spark.datapipe import dedup as D
    from victorialogs_spark.driver_entry import _spread, _table

    shuffle_parts = spark.conf.get("spark.sql.shuffle.partitions")

    def probe(name, fn):
        if only and only not in name:
            return None
        samples = []
        spark.catalog.clearCache()
        df = None
        for _ in range(runs):
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            t0 = time.monotonic()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        samples.sort()
        mid = len(samples) // 2
        med = samples[mid] if len(samples) % 2 else (samples[mid - 1] + samples[mid]) / 2
        print(f"{name:38s} best={samples[0]:7.3f}  median={med:7.3f}")
        sys.stdout.flush()
        return df

    docs = lambda: _spread(spark, sf_dir, "documents")  # noqa: E731

    NUM_HASHES, BANDS, THRESHOLD = 32, 4, 0.7
    ROWS = NUM_HASHES // BANDS  # 8

    # ---- V1 sketch: sig + numpy band buckets -------------------------
    def sketch_with_buckets(df):
        rng = np.random.RandomState(42)
        A = (
            rng.randint(0, 1 << 62, size=NUM_HASHES).astype(np.uint64) << np.uint64(1)
        ) | np.uint64(1)
        P = np.uint64(0x9E3779B97F4A7C15)

        def _grams(text):
            toks = (text or "").lower().split()
            if len(toks) < 3:
                return {" ".join(toks)} if toks else {""}
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        def _sig(series):
            texts = series.tolist()
            if not texts:
                return pd.DataFrame({"sig": [], "bk": []})
            flat: list = []
            starts = np.empty(len(texts), dtype=np.int64)
            for i, text in enumerate(texts):
                starts[i] = len(flat)
                flat.extend(_grams(text))
            hs = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(np.uint64)
            sig = np.empty((len(texts), NUM_HASHES), dtype=np.uint64)
            for j in range(NUM_HASHES):
                sig[:, j] = np.minimum.reduceat(A[j] * hs, starts)
            # polynomial mix per band: bucket equality iff the band's
            # slot slice is equal (64-bit collision ~2^-64/pair)
            bk = np.zeros((len(texts), BANDS), dtype=np.uint64)
            for b in range(BANDS):
                acc = np.zeros(len(texts), dtype=np.uint64)
                for j in range(ROWS):
                    acc = acc * P + sig[:, b * ROWS + j]
                bk[:, b] = acc
            return pd.DataFrame(
                {"sig": sig.view(np.int64).tolist(), "bk": bk.view(np.int64).tolist()}
            )

        _sig.__annotations__ = {"series": pd.Series, "return": pd.DataFrame}
        udf = F.pandas_udf(_sig, "sig array<long>, bk array<long>")
        out = df.select(F.col("doc_id"), udf(F.col("text")).alias("s"))
        return out.select("doc_id", F.col("s.sig").alias("sig"), F.col("s.bk").alias("bk"))

    def est_codegen(a, b):
        return sum(
            (a.getItem(i) == b.getItem(i)).cast("int") for i in range(NUM_HASHES)
        ) / F.lit(NUM_HASHES)

    def lsh_variant(codegen_est: bool, keep_distinct: bool = True):
        sigs = sketch_with_buckets(docs())
        buckets = sigs.select(
            F.col("doc_id"),
            F.col("sig"),
            F.posexplode("bk").alias("band", "bucket"),
        ).select(
            "band",
            "bucket",
            F.struct(F.col("doc_id").alias("id"), F.col("sig")).alias("doc"),
        )
        grouped = buckets.groupBy("band", "bucket").agg(
            F.array_sort(F.collect_list("doc")).alias("docs")
        )
        pairs = grouped.where(F.size("docs") >= 2).select(
            F.explode(D._bucket_pairs(F.col("docs"))).alias("p")
        )
        if codegen_est:
            est = est_codegen(F.col("p.a.sig"), F.col("p.b.sig"))
        else:
            est = F.size(
                F.filter(
                    F.zip_with(F.col("p.a.sig"), F.col("p.b.sig"), lambda x, y: x == y),
                    lambda v: v,
                )
            ) / F.lit(NUM_HASHES)
        out = pairs.select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            est.cast("double").alias("est_jaccard"),
        ).where(F.col("est_jaccard") >= THRESHOLD)
        return out.distinct() if keep_distinct else out

    probe(
        "lsh/V0 current",
        lambda: D.minhash_near_dups(
            docs(), "doc_id", "text", num_hashes=NUM_HASHES, bands=BANDS,
            threshold=THRESHOLD,
        ),
    )
    probe("lsh/V1 numpy buckets", lambda: lsh_variant(codegen_est=False))
    probe("lsh/V2 V1+codegen est", lambda: lsh_variant(codegen_est=True))
    probe(
        "lsh/V3 V2 no distinct (attribution)",
        lambda: lsh_variant(codegen_est=True, keep_distinct=False),
    )

    # equivalence check: V2 pair set == V0 pair set
    if not only or "lsh" in only:
        v0 = D.minhash_near_dups(
            docs(), "doc_id", "text", num_hashes=NUM_HASHES, bands=BANDS,
            threshold=THRESHOLD,
        )
        v2 = lsh_variant(codegen_est=True)
        a = {(r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in v0.collect()}
        b = {(r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in v2.collect()}
        print(f"lsh equivalence: v0={len(a)} v2={len(b)} equal={a == b}")

    # ---- clusters ----------------------------------------------------
    from victorialogs_spark.datapipe.clusters import (
        _driver_union_find,
        dup_clusters,
    )

    def pairs_df():
        return D.ngram_jaccard_pairs(docs(), "doc_id", "text", n=5, threshold=0.05)

    probe(
        "clus/W0 current",
        lambda: dup_clusters(_table(spark, sf_dir, "documents"), "doc_id", pairs_df()),
    )

    def cc_w1(pairs, cap=2_000_000):
        edges = pairs.select(
            F.least(F.col("id_a"), F.col("id_b")).cast("long").alias("u"),
            F.greatest(F.col("id_a"), F.col("id_b")).cast("long").alias("v"),
        ).where(F.col("u") != F.col("v")).where(
            F.col("u").isNotNull() & F.col("v").isNotNull()
        )
        cur = edges.distinct().localCheckpoint(eager=True)
        if cur.count() <= cap:
            pdf = cur.toPandas()
            comp = _driver_union_find(
                zip(pdf["u"].to_numpy().tolist(), pdf["v"].to_numpy().tolist())
            )
            if not comp:
                return spark.createDataFrame([], "node long, component long")
            return spark.createDataFrame(list(comp.items()), "node long, component long")
        raise NotImplementedError("distributed path unchanged — not probed here")

    def dup_clusters_w1():
        d = _table(spark, sf_dir, "documents")
        cc = cc_w1(pairs_df())
        out = d.select(F.col("doc_id")).join(
            cc.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster")),
            "doc_id",
            "left",
        )
        return out.select(
            F.col("doc_id"),
            F.coalesce(F.col("cluster"), F.col("doc_id").cast("long")).alias("cluster"),
        )

    probe("clus/W1 u<v normalize", dup_clusters_w1)

    if not only or "clus" in only:
        a = {(r.doc_id, r.cluster) for r in dup_clusters(
            _table(spark, sf_dir, "documents"), "doc_id", pairs_df()).collect()}
        b = {(r.doc_id, r.cluster) for r in dup_clusters_w1().collect()}
        print(f"clus equivalence: w0={len(a)} w1={len(b)} equal={a == b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
