"""Top-level query API: LogsQL string → DataFrame."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark.logsql.parser import parse_query


def run_query(
    spark: SparkSession,
    df: DataFrame,
    query: str,
    timestamp_ns: int | None = None,
    start_ns: int | None = None,
    end_ns: int | None = None,
) -> DataFrame:
    """Run a LogsQL query against a log DataFrame.

    ``start_ns``/``end_ns`` are the API-level global time filter (the
    HTTP start/end args); subqueries inherit it unless they set
    options(ignore_global_time_filter=true)."""
    from victorialogs_spark.planner.planner import plan_query

    q = parse_query(query, timestamp_ns)
    gt = None
    if start_ns is not None or end_ns is not None:
        gt = (
            start_ns if start_ns is not None else -(2**62),
            end_ns if end_ns is not None else 2**62,
        )
    return plan_query(spark, df, q, global_time_ns=gt)
