"""Query planner: LogsQL AST → DataFrame.

Lifecycle mirrors the reference (storage_search.go:102-142): resolve
subqueries against the source table, fold the filter tree into the scan
(Catalyst pushes it into Parquet), then apply pipes left-to-right. Catalyst
then performs the rewrites the reference hand-codes (parser.go:600-636):
filter merging, top-k sort, projection pushdown, partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from victorialogs_spark.logsql import ast as A
from victorialogs_spark.planner.filters import compile_filter
from victorialogs_spark.planner.pipes import apply_pipe

NS = 10**9


class PlanContext:
    """Carries what pipes need beyond the current DataFrame: the source
    table (for join/union/in-subqueries and stream_context) and the global
    time range (for rate(), parser.go:1214)."""

    def __init__(self, spark: SparkSession, source_df: DataFrame, query: A.Query):
        self.spark = spark
        self.source_df = source_df
        self.query = query
        tr = query.time_range
        self.range_seconds: float | None = None
        if tr is not None and tr[0] > -(2**61) and tr[1] < 2**61:
            self.range_seconds = (tr[1] - tr[0] + 1) / NS

    def run_subquery(self, q: A.Query) -> DataFrame:
        return plan_query(self.spark, self.source_df, q)


def plan_query(spark: SparkSession, df: DataFrame, q: A.Query) -> DataFrame:
    ctx = PlanContext(spark, df, q)
    out = df.where(compile_filter(q.filter, df, ctx))
    for p in q.pipes:
        out = apply_pipe(p, out, ctx)
    return out
