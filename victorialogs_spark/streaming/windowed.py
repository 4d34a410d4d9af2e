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
