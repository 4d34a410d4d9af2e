"""Matched-session sf1 stage attribution for the r14 perf wave
(dp_dup_clusters, dp_minhash_lsh — VERDICT r13 Next-round #4).

One warm session (bench.py's warm-up protocol), then each probe runs
N times and reports best/median. Probes decompose the two headline
queries into their plan stages so the rewrite targets the measured
bottleneck, not a guess. A/B variants are added alongside as they are
written; every variant must be oracle/rows re-verified before adoption.

Usage: python tools/sf1_wave2.py [--runs 4] [--only substr]
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

    from pyspark.sql import functions as F

    from victorialogs_spark.session import get_spark

    spark = get_spark("sf1-wave2")
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    from victorialogs_spark.schema import load_table

    # bench.py warm-up: table touch + Arrow worker-pool init
    load_table(spark, sf_dir, "lineitem").count()

    def _noop(s):
        return s

    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    noop = F.pandas_udf(_noop, "string")
    docs0 = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs0.select(noop(F.col("text"))).write.format("noop").mode("overwrite").save()

    from victorialogs_spark.driver_entry import QUERIES, _spread, _table

    shuffle_parts = spark.conf.get("spark.sql.shuffle.partitions")

    def probe(name, fn):
        if only and only not in name:
            return
        samples = []
        spark.catalog.clearCache()
        for _ in range(runs):
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            t0 = time.monotonic()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        samples.sort()
        mid = len(samples) // 2
        med = samples[mid] if len(samples) % 2 else (samples[mid - 1] + samples[mid]) / 2
        print(f"{name:45s} best={samples[0]:7.3f}  median={med:7.3f}")
        sys.stdout.flush()

    docs = lambda: _spread(spark, sf_dir, "documents")  # noqa: E731

    # ---- dp_minhash_lsh decomposition -------------------------------
    from victorialogs_spark.datapipe import dedup as D

    probe("lsh/0 full (current)", lambda: QUERIES["dp_minhash_lsh"](spark, sf_dir))
    probe(
        "lsh/1 sketch only",
        lambda: D.minhash_signatures_arrow(docs(), "doc_id", "text", 32),
    )

    def _lsh_buckets():
        sigs = D.minhash_signatures_arrow(docs(), "doc_id", "text", 32)
        return sigs.select(
            F.col("doc_id"),
            F.col("sig"),
            F.explode(D._band_buckets(4, 32)).alias("be"),
        ).select(
            F.col("be.band").alias("band"),
            F.col("be.bucket").alias("bucket"),
            F.struct(F.col("doc_id").alias("id"), F.col("sig")).alias("doc"),
        )

    probe("lsh/2 sketch+bucket-explode (no shuffle)", _lsh_buckets)
    probe(
        "lsh/3 +groupBy collect_list",
        lambda: _lsh_buckets()
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc")).alias("docs")),
    )

    # ---- dp_dup_clusters decomposition ------------------------------
    probe("clus/0 full (current)", lambda: QUERIES["dp_dup_clusters"](spark, sf_dir))
    probe("clus/1 jaccard pairs only", lambda: QUERIES["dp_ngram_jaccard"](spark, sf_dir))

    def _pairs():
        return D.ngram_jaccard_pairs(docs(), "doc_id", "text", n=5, threshold=0.05)

    def _grams_exploded():
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

    probe("clus/2 gram hash+explode (no shuffle)", _grams_exploded)

    def _windowed():
        from pyspark.sql.window import Window

        g = _grams_exploded().select(
            F.col("g").alias("gh"),
            F.struct(F.col("doc_id").alias("id"), F.col("sz")).alias("doc"),
        )
        win = Window.partitionBy("gh")
        return g.withColumn("__df", F.count(F.lit(1)).over(win)).where(
            F.col("__df") >= 2
        )

    probe("clus/3 +window df>=2 filter", _windowed)

    def _cc_only():
        from victorialogs_spark.datapipe.clusters import dup_clusters

        p = _pairs()
        d = _table(spark, sf_dir, "documents")
        return dup_clusters(d, "doc_id", p)

    probe("clus/4 full via fresh plan (sanity)", _cc_only)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
