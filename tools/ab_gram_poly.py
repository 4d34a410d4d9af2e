"""Interleaved A/B: gram-string hashing vs seeded-polynomial token-hash
folding inside token_ngram_hashes_arrow (r15 wave 6).

Both variants are defined HERE and monkeypatched into datapipe.dedup so
the comparison runs in ONE warm session with variants interleaved
round-robin (this host's bursty co-tenant contention makes sequential
A/Bs unusable — SCALE.md r14 wave-2 note). Probes:

- gram+explode: the UDF pass + explode only (no shuffle) — isolates the
  Python-boundary stage the change targets;
- ngram_jaccard: the full dp_ngram_jaccard headline plan;
- dup_clusters: the full dp_dup_clusters headline plan (pair gen is 64%
  of it, SCALE.md r15 wave 4).

Usage: python tools/ab_gram_poly.py [reps] [--sf 0.1|1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from victorialogs_spark import session
from victorialogs_spark.datapipe import dedup as D
from victorialogs_spark.datapipe.dedup import ascii_tokens


def old_variant(c_name: str, n: int = 3):
    """The committed r14 implementation (joined gram strings hashed)."""

    def _gram_hashes(series):
        texts = series.tolist()
        if not texts:
            return pd.Series([], dtype=object)
        flat: list = []
        counts = []
        for text in texts:
            toks = ascii_tokens(text)
            if len(toks) < n:
                g = [" ".join(toks)] if toks else [""]
            else:
                g = list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            flat.extend(g)
            counts.append(len(g))
        hs = pd.util.hash_array(np.asarray(flat, dtype=object)).view(np.int64)
        out = []
        pos = 0
        for c in counts:
            out.append(hs[pos : pos + c].tolist())
            pos += c
        return pd.Series(out)

    _gram_hashes.__annotations__ = {"series": pd.Series, "return": pd.Series}
    return F.pandas_udf(_gram_hashes, "array<long>").asNondeterministic()(
        F.col(c_name)
    )


_P = 0x100000001B3  # FNV-64 prime
_SEED = 0xCBF29CE484222325  # FNV-64 offset basis
_MASK = (1 << 64) - 1


def new_variant(c_name: str, n: int = 3):
    """Candidate: hash tokens once, fold windows with a seeded 64-bit
    polynomial (vectorized sliding_window_view @ powers, the idiom
    _token_window_hashes already uses)."""
    powers = np.array(
        [pow(_P, j, 1 << 64) for j in range(n - 1, -1, -1)], dtype=np.uint64
    )
    seed_full = np.uint64((_SEED * pow(_P, n, 1 << 64)) & _MASK)

    def _gram_hashes(series):
        texts = series.tolist()
        if not texts:
            return pd.Series([], dtype=object)
        tok_lists = [ascii_tokens(t) for t in texts]
        flat: list = []
        for toks in tok_lists:
            flat.extend(toks)
        th = (
            pd.util.hash_array(np.asarray(flat, dtype=object)).view(np.uint64)
            if flat
            else np.empty(0, dtype=np.uint64)
        )
        win = (
            np.lib.stride_tricks.sliding_window_view(th, n) @ powers + seed_full
            if len(th) >= n
            else np.empty(0, dtype=np.uint64)
        )
        out: list = []
        pos = 0
        for toks in tok_lists:
            c = len(toks)
            if c == 0:
                out.append([_SEED - (1 << 64) if _SEED >> 63 else _SEED])
            elif c < n:
                acc = _SEED
                for h in th[pos : pos + c].tolist():
                    acc = (acc * _P + h) & _MASK
                out.append([acc - (1 << 64) if acc >> 63 else acc])
            else:
                out.append(
                    np.unique(win[pos : pos + c - n + 1]).view(np.int64).tolist()
                )
            pos += c
        return pd.Series(out)

    _gram_hashes.__annotations__ = {"series": pd.Series, "return": pd.Series}
    return F.pandas_udf(_gram_hashes, "array<long>").asNondeterministic()(
        F.col(c_name)
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 5
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        arg = sys.argv[sys.argv.index("--sf") + 1]
        if arg in ("1", "1.0"):
            sf_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".bench_sf1",
            )
        else:
            sf_dir = f"/root/testdata/sf{arg}"

    spark = session.get_spark("ab-gram-poly")
    spark.sparkContext.setLogLevel("ERROR")

    from victorialogs_spark.driver_entry import QUERIES, _spread

    def docs():
        return _spread(spark, sf_dir, "documents")

    def gram_explode():
        gen = D.token_ngram_hashes_arrow("text", 5)
        return (
            docs()
            .select(F.col("doc_id"), gen.alias("__grams"))
            .select(
                F.col("doc_id"),
                F.size("__grams").alias("sz"),
                F.explode("__grams").alias("g"),
            )
        )

    probes = {
        "gram+explode": gram_explode,
        "ngram_jaccard": lambda: QUERIES["dp_ngram_jaccard"](spark, sf_dir),
        "dup_clusters": lambda: QUERIES["dp_dup_clusters"](spark, sf_dir),
    }
    variants = {"old": old_variant, "new": new_variant}

    # warm-up both variants once (codegen + Python worker pool)
    for fn in variants.values():
        D.token_ngram_hashes_arrow = fn
        gram_explode().write.format("noop").mode("overwrite").save()

    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for pname, probe in probes.items():
            for vname, fn in variants.items():
                D.token_ngram_hashes_arrow = fn
                spark.sparkContext.setJobDescription(f"{pname}/{vname}/r{rep}")
                t0 = time.monotonic()
                probe().write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                results.setdefault((pname, vname), []).append(dt)
        print(f"# rep {rep} done", file=sys.stderr)

    for pname in probes:
        o = sorted(results[(pname, "old")])
        w = sorted(results[(pname, "new")])
        print(
            f"{pname}: old best {o[0]:.3f} median {o[len(o) // 2]:.3f} | "
            f"new best {w[0]:.3f} median {w[len(w) // 2]:.3f} | "
            f"best ratio {w[0] / o[0]:.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
