"""Stage attribution + plan A/B for the ngram-jaccard pair pipeline
(the dominant chunk of dp_dup_clusters per the r15 attribution, and the
body of dp_ngram_jaccard).

Probes (interleaved rounds, one session, noop sink):
  grams    — gram UDF + explode + (gh, doc) projection
  window   — + window df>=2 pre-filter        (current plan's phase)
  postings — + groupBy(gh).collect_list
  pairs    — + local pair explode
  full     — + pair groupBy + threshold        (= ngram_jaccard_pairs)
  agg_v    — VARIANT: no window; groupBy(gh).agg(count, collect_list)
             .where(count >= 2) — drops the Sort, builds singleton
             arrays instead
  clusters — dup_clusters end-to-end (current plan)

Usage: python tools/ab_jaccard_stages.py [sf_dir]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from victorialogs_spark.datapipe.dedup import (  # noqa: E402
    _bucket_pairs,
    ngram_jaccard_pairs,
    token_ngram_hashes_arrow,
)
from victorialogs_spark.schema import load_table  # noqa: E402
from victorialogs_spark.session import get_spark  # noqa: E402

N = 5
THRESHOLD = 0.05


def _grams(docs):
    gen = token_ngram_hashes_arrow("text", N)
    return (
        docs.select(F.col("doc_id"), gen.alias("__grams"))
        .select(
            F.col("doc_id"),
            F.size("__grams").alias("sz"),
            F.explode("__grams").alias("g"),
        )
        .select(
            F.col("g").alias("gh"),
            F.struct(F.col("doc_id").alias("id"), F.col("sz")).alias("doc"),
        )
    )


def _windowed(docs):
    g = _grams(docs)
    win = Window.partitionBy("gh")
    return (
        g.withColumn("__df", F.count(F.lit(1)).over(win))
        .where(F.col("__df") >= 2)
        .drop("__df")
    )


def _postings(docs):
    return _windowed(docs).groupBy("gh").agg(
        F.array_sort(F.collect_list("doc")).alias("docs")
    )


def _pairs(docs):
    return (
        _postings(docs)
        .where(F.size("docs") >= 2)
        .select(F.explode(_bucket_pairs(F.col("docs"))).alias("p"))
    )


def _shared_tail(pairs):
    shared = pairs.groupBy(
        F.col("p.a.id").alias("id_a"),
        F.col("p.b.id").alias("id_b"),
        F.col("p.a.sz").alias("sz_a"),
        F.col("p.b.sz").alias("sz_b"),
    ).agg(F.count(F.lit(1)).alias("shared"))
    return (
        shared.withColumn(
            "jaccard",
            (
                F.col("shared")
                / (F.col("sz_a") + F.col("sz_b") - F.col("shared"))
            ).cast("double"),
        )
        .where(F.col("jaccard") >= THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )


def _agg_variant(docs):
    g = _grams(docs)
    postings = (
        g.groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("__df"),
            F.array_sort(F.collect_list("doc")).alias("docs"),
        )
        .where(F.col("__df") >= 2)
        .drop("__df")
    )
    pairs = postings.select(F.explode(_bucket_pairs(F.col("docs"))).alias("p"))
    return _shared_tail(pairs)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_jaccard")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    # warm the Python worker pool
    _grams(docs).write.format("noop").mode("overwrite").save()

    def full(d):
        return ngram_jaccard_pairs(d, "doc_id", "text", n=N, threshold=THRESHOLD)

    def clusters(d):
        from victorialogs_spark.datapipe.clusters import dup_clusters

        return dup_clusters(d, "doc_id", full(d))

    PROBES = {
        "grams": _grams,
        "window": _windowed,
        "postings": _postings,
        "pairs": _pairs,
        "full": full,
        "agg_v": _agg_variant,
        "clusters": clusters,
    }
    ROUNDS = 5
    res = {p: [] for p in PROBES}
    for _ in range(ROUNDS):
        for pname, fn in PROBES.items():
            spark.sparkContext.setJobDescription(f"jaccard probe {pname}")
            t0 = time.monotonic()
            fn(docs).write.format("noop").mode("overwrite").save()
            res[pname].append(time.monotonic() - t0)
    for pname, ts in res.items():
        print(
            f"{pname:10} best {min(ts):6.3f}  med {statistics.median(ts):6.3f}"
            f"  all {[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
