"""Streaming exact dedup: first-occurrence-wins across micro-batches.

The batch operator (datapipe.dedup.exact_dedup) groups a bounded corpus;
an ingest pipeline needs the same semantics over an UNBOUNDED stream —
"emit a document only the first time its normalized-content fingerprint
appears, ever". That is inherently stateful custom logic, so this is the
one place the engine uses ``applyInPandasWithState`` (SURVEY §2.5): state
is keyed by fingerprint, holds only a seen-marker + first-seen metadata,
and optionally expires via processing-time timeout (bounded state for
TTL'd dedup windows).

Scale: state per distinct fingerprint is ~50 bytes; the stream shuffles
once on the fingerprint key (the same hash-shuffle the batch groupBy
does). With a TTL the state store stays bounded regardless of stream age.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from victorialogs_spark.datapipe.dedup import fingerprint

OUTPUT_SCHEMA = "fp string, doc_id string, text string, n_copies bigint"
STATE_SCHEMA = "seen boolean, copies long"


def stream_exact_dedup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming DataFrame → first occurrence per content fingerprint.

    Output rows: (fp, doc_id, text, n_copies) where n_copies counts the
    copies seen IN THE EMITTING BATCH (later duplicates are suppressed
    entirely — update-less append semantics, so downstream sinks receive
    each unique document exactly once). ``ttl_ms`` expires a fingerprint's
    seen-marker after that idle time: duplicates arriving later than the
    TTL re-emit, which is the bounded-state trade every streaming dedup
    makes."""
    keyed = stream_df.select(
        fingerprint(F.col(text_col)).alias("fp"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    ).groupBy("fp")

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def _dedup(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        n = len(rows)
        if state.exists:
            (seen, copies) = state.get
            state.update((True, copies + n))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return  # duplicate of an already-emitted document
        state.update((True, n))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        first = rows.sort_values("doc_id").iloc[0]
        yield pd.DataFrame(
            {
                "fp": [key[0]],
                "doc_id": [first["doc_id"]],
                "text": [first["text"]],
                "n_copies": [n],
            }
        )

    return keyed.applyInPandasWithState(
        _dedup, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )
