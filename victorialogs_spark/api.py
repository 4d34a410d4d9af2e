"""Top-level query API: LogsQL string → DataFrame."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark.logsql.parser import parse_query


def run_query(
    spark: SparkSession,
    df: DataFrame,
    query: str,
    timestamp_ns: int | None = None,
) -> DataFrame:
    """Run a LogsQL query against a log DataFrame (see schema.LOG_COLUMNS)."""
    from victorialogs_spark.planner.planner import plan_query

    q = parse_query(query, timestamp_ns)
    return plan_query(spark, df, q)
