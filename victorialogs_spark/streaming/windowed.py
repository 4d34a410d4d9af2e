"""Streaming windowed aggregation: the Structured-Streaming analog of the
`/select/logsql/hits` endpoint, with watermark-based late-data handling
(SURVEY §2.5 — the reference recomputes hits per poll; a Spark stream
keeps the windows incrementally with bounded state).

The query side is pure built-ins: readStream → filter (compiled from the
same LogsQL filter the batch path uses) → withWatermark → groupBy(window)
→ count. State size is O(open windows × group cardinality) and the
watermark closes windows, so this runs indefinitely on an unbounded
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victorialogs_spark.logsql.parser import parse_query
from victorialogs_spark.planner.filters import compile_filter


def stream_hits(
    stream_df: DataFrame,
    query: str,
    step: str = "1 minute",
    watermark: str = "5 minutes",
    fields: list[str] | None = None,
    timestamp_ns: int | None = None,
) -> DataFrame:
    """Per-window hit counts over a streaming log DataFrame.

    ``stream_df`` must be a streaming DataFrame with the log schema
    (``_time`` timestamp plus string fields), e.g. the output of
    ``spark.readStream`` over the ingest table. Only the query's FILTER is
    applied (pipes are dropped — the same contract as the batch ``hits``
    endpoint / logsql.go AddCountByTimePipe).

    Output: (window struct<start,end>, <fields...>, hits) in update mode.
    """
    q = parse_query(query, timestamp_ns)
    cond = compile_filter(q.filter, stream_df)
    keys = [F.window("_time", step).alias("window")]
    keys += [F.col(f) for f in (fields or [])]
    return (
        stream_df.where(cond)
        .withWatermark("_time", watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("hits"))
    )


def start_stream_hits_to_memory(
    stream_df: DataFrame,
    query: str,
    table_name: str,
    step: str = "1 minute",
    watermark: str = "5 minutes",
    fields: list[str] | None = None,
):
    """Convenience runner: write the windowed counts to an in-memory sink
    (for tests/dashboards). Returns the StreamingQuery handle."""
    agg = stream_hits(stream_df, query, step, watermark, fields)
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(table_name)
        .start()
    )


# stats funcs whose aggregation state is streaming-safe (bounded, no
# distinct/collect state, no second aggregation level)
_STREAM_SAFE_FUNCS = {
    "count", "count_empty", "sum", "sum_len", "avg", "min", "max",
    "row_min", "row_max",
}


def stream_stats(
    stream_df: DataFrame,
    query: str,
    step: str = "1 minute",
    watermark: str = "5 minutes",
    timestamp_ns: int | None = None,
) -> DataFrame:
    """Streaming `stats_query_range`: run a ``<filter> | stats by (...)
    <funcs>`` LogsQL query as an incrementally-maintained windowed
    aggregate — the same stats compilation the batch planner uses, with a
    tumbling ``step`` window prepended to the group keys and a watermark
    bounding state.

    Only single-level, bounded-state stats functions are accepted
    (count/sum/avg/min/max/...): distinct aggregations (count_uniq),
    collecting aggregations (values, uniq_values) and two-phase
    histogram() need unbounded or second-level state that Structured
    Streaming's update mode cannot maintain — they raise ValueError with
    that explanation rather than silently degrading.

    Output: (window struct<start,end>, <by fields...>, <results...>).
    """
    from victorialogs_spark.logsql import ast as A
    from victorialogs_spark.planner.pipes import _by_exprs
    from victorialogs_spark.planner.stats import compile_stats_func

    q = parse_query(query, timestamp_ns)
    if len(q.pipes) != 1 or not isinstance(q.pipes[0], A.PStats):
        raise ValueError(
            "stream_stats requires exactly '<filter> | stats by (...) <funcs>'"
        )
    p = q.pipes[0]
    bad = {sf.name for sf in p.funcs} - _STREAM_SAFE_FUNCS
    if bad:
        raise ValueError(
            f"stats functions not streamable (unbounded/two-level state): {sorted(bad)}"
        )
    cond = compile_filter(q.filter, stream_df)
    by_names = [b.name for b in p.by]
    aggs = []
    for sf in p.funcs:
        sf_cond = (
            compile_filter(sf.cond, stream_df) if sf.cond is not None else None
        )
        aggs.append(
            compile_stats_func(sf, stream_df, by_names, sf_cond, None)
        )
    keys = [F.window("_time", step).alias("window")]
    keys += _by_exprs(stream_df, p.by)
    return (
        stream_df.where(cond)
        .withWatermark("_time", watermark)
        .groupBy(*keys)
        .agg(*aggs)
    )
