"""victorialogs_spark — a PySpark-native log-analytics engine with the
query/data-processing capabilities of VictoriaLogs (LogsQL).

Brand-new Spark-first design (NOT a port): LogsQL string → Python AST →
planner emits declarative DataFrame operations; Catalyst/Tungsten pick the
physical plan (pushdown, partial aggregation, top-k, broadcast joins).

Public API:
    from victorialogs_spark import run_query, get_spark
    df = run_query(spark, log_df, '_time:5m error | stats by (host) count() as hits')
"""

from victorialogs_spark.session import get_spark
from victorialogs_spark.api import run_query, parse_query

__all__ = ["get_spark", "run_query", "parse_query"]
