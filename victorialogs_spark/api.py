"""Top-level query API: LogsQL string → DataFrame."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark.logsql.parser import parse_query


def run_query(
    spark: SparkSession,
    df: DataFrame | str,
    query: str,
    timestamp_ns: int | None = None,
    start_ns: int | None = None,
    end_ns: int | None = None,
) -> DataFrame:
    """Run a LogsQL query against a log DataFrame, or against a log-table
    PATH — the path form consults any bloom index registered via
    ``index.bloom.register_bloom_index`` and prunes input files for the
    query's word filters before the scan starts (the reference probes its
    per-block token blooms on every word filter,
    lib/logstorage/filter_phrase.go:85-122).

    ``start_ns``/``end_ns`` are the API-level global time filter (the
    HTTP start/end args); subqueries inherit it unless they set
    options(ignore_global_time_filter=true)."""
    from victorialogs_spark.planner.planner import plan_query

    source_df = None
    if isinstance(df, str):
        from victorialogs_spark.index.bloom import open_log_table

        path = df
        df = open_log_table(spark, path, query)
        # subqueries / join / union / stream_context must plan against the
        # UNPRUNED table — the bloom prune narrows only the outer scan,
        # never what other plan nodes can see
        source_df = spark.read.parquet(path)
    q = parse_query(query, timestamp_ns)
    gt = None
    if start_ns is not None or end_ns is not None:
        gt = (
            start_ns if start_ns is not None else -(2**62),
            end_ns if end_ns is not None else 2**62,
        )
    return plan_query(spark, df, q, global_time_ns=gt, source_df=source_df)
