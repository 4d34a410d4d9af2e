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
    document that collides with an earlier-seen document in some band
    bucket (dup_of = the bucket's smallest doc id). First arrivals emit
    nothing. Downstream, ``groupBy(doc_id).agg(min(dup_of))`` gives one
    flag per duplicate document."""
    from victorialogs_spark.datapipe.dedup import minhash_signatures_md5

    rows_per_band = max(1, num_hashes // bands)
    sigs = minhash_signatures_md5(stream_df, id_col, text_col, num_hashes, n)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.encode(
                        F.concat_ws(
                            "|",
                            F.slice(
                                F.col("sig"), b * rows_per_band + 1, rows_per_band
                            ),
                        ),
                        "UTF-8",
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
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
        overall = batch_min if prev is None else min(prev, batch_min)
        state.update((overall,))
        dups = rows[rows["doc_id"] != overall]
        if len(dups):
            yield pd.DataFrame(
                {
                    "doc_id": dups["doc_id"].astype("int64"),
                    "band": int(key[0]),
                    "bucket": key[1],
                    "dup_of": overall,
                }
            )

    return keyed.applyInPandasWithState(
        _collide,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
