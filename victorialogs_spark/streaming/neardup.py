"""Streaming NEAR-duplicate detection: MinHash band-bucket collisions
across micro-batches via ``applyInPandasWithState``.

The batch operators emit near-dup pairs over a bounded corpus; a crawl
ingest pipeline needs the streaming form — "flag a document the moment
any of its LSH band buckets has already been seen". State is keyed by
(band, bucket) and holds ONE long (the smallest doc id seen in that
bucket, ever), so state size is bounded by distinct buckets — the same
memory shape as the reference's stream-tracker caches, and orders of
magnitude smaller than retaining signatures.

Signatures use the md5 sketch (dedup.minhash_signatures_md5), which is
deterministic across engines — so a bounded availableNow run has an
exact DuckDB value-oracle (bucket-min semantics), unlike xxhash
sketches. The production swap to the Arrow/xxhash sketch only changes
the signature column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, band int, bucket string, dup_of long"
STATE_SCHEMA = "min_id long"


def stream_minhash_neardup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Streaming DataFrame → (doc_id, band, bucket, dup_of) rows for every
    document that collides with a bucket-mate. Within a bucket's FIRST
    batch, the min-id row is the representative (emits nothing) and the
    rest are its duplicates — so a bounded single-batch run reproduces
    batch bucket-min semantics exactly (the DuckDB oracle). Once a
    bucket has state, every later arrival is flagged, including one with
    a smaller id than the stored minimum (temporal first-seen-wins — the
    only semantics append mode can honor). Downstream,
    ``groupBy(doc_id).agg(min(dup_of))`` gives one flag per document."""
    from victorialogs_spark.datapipe.clusters import _require_integral_ids
    from victorialogs_spark.datapipe.dedup import (
        md5_band_entries,
        minhash_signatures_md5,
    )

    # same silent-cast hazard as clusters: a string id column would cast
    # to NULL, and a NULL id reaching the state function turns the whole
    # pandas group float64/NaN and kills the streaming query
    _require_integral_ids(stream_df, (id_col,))
    stream_df = stream_df.where(F.col(id_col).isNotNull())
    sigs = minhash_signatures_md5(stream_df, id_col, text_col, num_hashes, n)
    band_entries = md5_band_entries(num_hashes, bands)
    keyed = (
        sigs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(band_entries).alias("be"),
        )
        .select(
            F.col("doc_id"),
            F.col("be.band").alias("band"),
            F.col("be.bucket").alias("bucket"),
        )
        .groupBy("band", "bucket")
    )

    def _collide(key, pdfs, state: GroupState):
        import pandas as pd

        rows = pd.concat(list(pdfs), ignore_index=True)
        batch_min = int(rows["doc_id"].min())
        prev = state.get[0] if state.exists else None
        # the stored representative is STABLE: first-seen bucket min,
        # never lowered afterwards. Updating it to a later, smaller id
        # (which was just EMITTED as a duplicate) would make a
        # re-arrival of the original flag as a dup of that duplicate —
        # both flagged, and a dedup consumer drops the whole cluster
        # with no surviving representative (r14 review finding).
        state.update((batch_min if prev is None else prev,))
        if prev is None:
            # first batch for this bucket: the min-id row is the
            # representative, every other row is its duplicate
            dups = rows[rows["doc_id"] != batch_min]
            dup_of = batch_min
        else:
            # bucket already seen: every row EXCEPT a re-arrival of the
            # stored representative itself collides with it (flagging
            # prev as a dup of a later doc, or a re-crawled id as a dup
            # of itself, would make a dedup consumer drop originals).
            # This includes rows undercutting the minimum — batch 1 {7},
            # batch 2 {2} emits (2, dup_of=7), not nothing.
            dups = rows[rows["doc_id"] != prev]
            dup_of = prev
        if len(dups):
            yield pd.DataFrame(
                {
                    "doc_id": dups["doc_id"].astype("int64"),
                    "band": int(key[0]),
                    "bucket": key[1],
                    "dup_of": dup_of,
                }
            )

    return keyed.applyInPandasWithState(
        _collide,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
