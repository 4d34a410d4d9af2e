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

Duplicate keys: the engine-portable order is defined by (md5, key), so
rows SHARING a key tie. Ties are broken by a content hash over every
other column (xxhash64 — deterministic across reruns and partition
counts, Spark-specific): two same-key rows with different payloads get
a stable relative order instead of the partition-dependent one a bare
row_number would assign (r14 sixth-pass deferral, closed r15).
Byte-identical duplicate rows remain interchangeable — any assignment
among them yields the same output table. Cross-engine reproducibility
of positions therefore holds exactly for unique-key corpora (every
documented caller keys on doc_id); under duplicate keys the order is
still deterministic, just Spark-defined.
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


def _tiebreak(df: DataFrame, key_col: str) -> Column:
    """Deterministic order among rows SHARING a key: xxhash64 over the
    other columns (maps excluded — Spark can't hash MapType). Pure
    function of row content, so the window order is stable under any
    partitioning; identical rows tie harmlessly (interchangeable)."""
    cols = [
        F.col(c)
        for c, t in df.dtypes
        if c != key_col and not t.startswith("map<")
    ]
    return F.xxhash64(F.struct(*cols)) if cols else F.lit(0)


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
    tb = _tiebreak(df, key_col)
    out = df.withColumn("__vl_h", h).withColumn(
        "shard", F.substring(F.col("__vl_h"), 1, shard_chars)
    ).withColumn("__vl_tb", tb)
    w = Window.partitionBy("shard").orderBy("__vl_h", key_col, "__vl_tb")
    return (
        out.withColumn("shuffle_pos", F.row_number().over(w))
        .drop("__vl_h", "__vl_tb")
    )


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
    tb = _tiebreak(df, id_col)
    out = df.withColumn("__vl_h", h).withColumn(
        "shard", F.substring(F.col("__vl_h"), 1, shard_chars)
    ).withColumn("__vl_tb", tb)
    # explicit ROWS framing: the (md5, id, tiebreak) order is stable
    # (content-hash tiebreak under duplicate ids), and ROWS makes the
    # cumsum per-row even when byte-identical rows still tie
    w = (
        Window.partitionBy("shard")
        .orderBy("__vl_h", id_col, "__vl_tb")
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
    return out.drop("__vl_h", "__vl_tb", "__vl_start")
