"""Headline benchmark: runs representative engine queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query wall-times are per-query (action = noop-format write, which
materializes every output column — a `.count()` action would let Catalyst
prune columns the query semantically produces), measured after a warm-up
scan so JVM/codegen startup doesn't dominate.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    # name -> registry entry (victorialogs_spark/driver_entry.py)
    "f_word",                # token filter scan over events
    "f_time_range",          # time-partition pruned scan
    "s_stats_by",            # groupBy aggregate (count/sum/avg)
    "s_time_bucket",         # tumbling time-window aggregate
    "s_histogram",           # two-level vmrange histogram
    "p_top",                 # top-k by frequency
    "p_unpack_json",         # JSON field extraction
    "p_join",                # broadcast join with aggregated subquery
    "p_sort_desc_rank",      # global top-k with rank
    "tpch_pricing_summary",  # wide aggregate over lineitem
    "tpch_top_orders",       # agg + top-k over orders
    "tpch_ship_histogram",   # weekly rollup over lineitem
    "dp_exact_dedup",        # hash-groupBy dedup over documents
    "dp_minhash_lsh",        # banded MinHash-LSH near-dup pairs
    "dp_ngram_jaccard",      # exact n-gram Jaccard via gram-bucket join
    "dp_cosine_threshold",   # exact cosine scan over embeddings
    "dp_repetition",         # narrow-map repetition quality signals
    "dp_dup_clusters",       # iterative connected-components clustering
    "dp_unigram_logprob",    # token-freq aggregate + join-back scoring
    "dp_pack_sequences",     # shard-windowed sequence packing
    "dp_repeated_spans",     # rolling-hash cross-doc span statistics
    "dp_tfidf_terms",        # tf/df aggregates + per-doc top-k window
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from victorialogs_spark.driver_entry import QUERIES
    from victorialogs_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch the main tables once (JVM + reader init), and run one
    # trivial Arrow pandas UDF so the Python worker pool + Arrow transfer
    # path is initialized before any dp_* query is timed (same class of
    # one-time startup as JVM/codegen warm-up, paid once per cluster, not
    # per query)
    from pyspark.sql import functions as F

    from victorialogs_spark.schema import events_as_logs, load_table

    events_as_logs(spark, sf_dir).count()
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "orders").count()

    import pandas as pd

    def _noop(s):
        return s

    # set annotations directly: `from __future__ import annotations` above
    # would stringify inline hints, which pandas_udf can't resolve
    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    noop = F.pandas_udf(_noop, "string")
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # noop WRITE, not count(): count(*) needs no columns, so Catalyst
    # prunes the UDF projection away and no Python worker ever starts —
    # exactly the pruning hazard this file's header documents
    docs.select(noop(F.col("text"))).write.format("noop").mode("overwrite").save()

    # hot-run convention (same as the ClickBench methodology the reference
    # benchmarks under): run each query N times, report the best — masks
    # one-time plan/codegen compilation and co-tenant scheduling noise.
    # This host shows BURSTY co-tenant contention (observed 0.2s → 4s on
    # the same query minutes apart with zero local processes running), so
    # every query gets 3 hot runs and the noisiest (pandas-UDF dp_*) get 4.
    times: dict[str, float] = {}
    medians: dict[str, float] = {}
    shuffle_parts = spark.conf.get("spark.sql.shuffle.partitions")
    for name in HEADLINE:
        fn = QUERIES[name]
        runs = 4 if name.startswith("dp_") else 3
        samples: list[float] = []
        n = 0
        # drop frames cached by PREVIOUS entries (several dp operators
        # cache mid-plan intermediates): leftover blocks inflate GC and
        # executor memory pressure for later queries — measured 4x noise
        # on dp_dup_clusters when 20 earlier entries' caches were live
        spark.catalog.clearCache()
        for _ in range(runs):
            # dp entries tune shuffle partitions internally on some paths;
            # re-pin before each run so no query inherits another's setting
            spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
            # timer wraps DF construction too: iterative operators
            # (connected components) execute jobs eagerly while building
            # the result DF — timing only the final action would miss
            # them (plan construction for lazy queries is sub-ms noise)
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        n = df.count()
        samples.sort()
        times[name] = round(samples[0], 4)
        mid = len(samples) // 2
        medians[name] = round(
            samples[mid]
            if len(samples) % 2
            else (samples[mid - 1] + samples[mid]) / 2,
            4,
        )
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 4)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                # methodology self-description so a future action change
                # can't silently break round-over-round comparability
                # (round 4 switched .count() -> noop write; the r3->r5
                # totals were not comparable and nothing in the JSON said
                # so): action materializes EVERY output column; "best"
                # is min over hot runs (ClickBench convention), medians
                # recorded alongside for noise visibility
                "action": "noop_write",
                "runs_per_query": {"dp_*": 4, "default": 3},
                "stat": "best_of_runs",
                "query_medians": medians,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
