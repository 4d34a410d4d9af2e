"""Deterministic corpus shuffling and sequence packing for training-data
pipelines.

Both operators answer the last-mile question of a pre-training pipeline:
after filtering/dedup, HOW do documents become the shuffled, fixed-budget
training sequences a data loader reads?

Scale design: neither operator ever orders the whole corpus globally. A
global ORDER BY is a single-range-partition sort — the classic 100 TB
bottleneck. Instead both key every row to a SHARD (a fixed-width md5
prefix) and order only WITHIN shards (window partitioned by shard →
embarrassingly parallel, one hash shuffle). The concatenation of shards
in shard order IS the global deterministic order, exactly how training
corpora ship as shard files (webdataset/tfrecord style).

Determinism: ordering keys are md5(key || ':' || seed) — a pure function
of (row key, seed), so reruns, repartitions and other engines reproduce
the identical order (md5 is bit-identical everywhere; fixed-width
lowercase hex compares lexicographically = numerically). No rand(), no
monotonically_increasing_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_key(key_col: str, seed: int) -> Column:
    """md5 of the row key salted with the seed: the deterministic
    'random' sort key. Changing the seed is a full reshuffle."""
    return F.md5(
        F.concat(
            F.col(key_col).cast("string"), F.lit(f":{seed}")
        ).cast("binary")
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    shard_chars: int = 2,
) -> DataFrame:
    """Deterministic corpus shuffle: assign every row a shard
    ('00'..'ff' for shard_chars=2 → 256 shards) and a dense position
    within its shard. Reading shards in shard order, rows in position
    order, yields a reproducible pseudo-random permutation of the corpus.

    Output: input columns + (shard string, shuffle_pos long, 1-based).

    The window partitions by shard — 16^shard_chars independent sorts of
    ~1/16^shard_chars of the data each, no global sort. At 100 TB pick
    shard_chars=3..4 (4096/65536 shards) so a shard fits an executor.
    """
    h = _order_key(key_col, seed)
    out = df.withColumn("__vl_h", h).withColumn(
        "shard", F.substring(F.col("__vl_h"), 1, shard_chars)
    )
    w = Window.partitionBy("shard").orderBy("__vl_h", key_col)
    return out.withColumn("shuffle_pos", F.row_number().over(w)).drop("__vl_h")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    budget: int,
    seed: int = 0,
    shard_chars: int = 2,
) -> DataFrame:
    """Pack documents into fixed-budget training sequences (context-window
    packing): documents are laid out in the deterministic shuffled order
    of :func:`shuffle_shards` and cut into consecutive bins of ``budget``
    cost units (tokens, chars — whatever ``cost_col`` measures).

    A document belongs to the sequence its FIRST unit lands in — the
    standard concatenate-then-cut semantics of pre-training loaders
    (a document longer than ``budget`` starts its own sequence and
    spills into the next; the loader's cut at the budget boundary is a
    read-time concern, not a table-layout one).

    Output: (id, shard, seq long 0-based within shard, seq_offset long =
    cost units before this doc inside its sequence, <cost_col>).

    Plan: one hash shuffle on shard + a per-shard window cumsum — no
    global sort, no UDF, no iteration. Every column expression is
    engine-portable, so the layout is oracle-checkable.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    h = _order_key(id_col, seed)
    out = df.withColumn("__vl_h", h).withColumn(
        "shard", F.substring(F.col("__vl_h"), 1, shard_chars)
    )
    # explicit ROWS framing: the (md5, id) order is unique so RANGE would
    # behave identically, but ROWS says so without relying on uniqueness
    w = (
        Window.partitionBy("shard")
        .orderBy("__vl_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cost = F.col(cost_col).cast("long")
    start = (F.sum(cost).over(w) - cost).alias("__vl_start")
    out = out.withColumn("__vl_start", start)
    out = out.withColumn(
        "seq", (F.col("__vl_start") / budget).cast("long")
    ).withColumn(
        "seq_offset", F.col("__vl_start") % budget
    )
    return out.drop("__vl_h", "__vl_start")
