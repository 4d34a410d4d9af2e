"""Deterministic sampling / splitting / decontamination for training-data
pipelines.

All operators key on a CONTENT- or ID-derived md5 prefix rather than
rand(): at 100 TB, sampling must be stable across reruns, executors and
engines (re-ingesting a shard must not resample it), and a hash bucket
gives exactly that. The 4-hex-digit md5 prefix is uniform over 65536
buckets and its LEXICOGRAPHIC order equals its numeric order (fixed-width
lowercase hex), so thresholds are plain string comparisons — pushable,
shuffle-free, and bit-identical in any engine that computes md5.

- hash_sample          — keep ~fraction of rows, deterministically
- train_val_test_split — stable 'split' label column
- decontaminate        — drop train docs whose normalized content appears
                         in a held-out corpus (left_anti on fingerprint;
                         the classic benchmark-decontamination step)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.dedup import fingerprint


def _bucket(c: Column) -> Column:
    """Uniform 4-hex-char bucket of a key column ('0000'..'ffff')."""
    return F.substring(F.md5(c.cast("string").cast("binary")), 1, 4)


def _threshold(fraction: float) -> str:
    """Largest bucket kept for ``fraction`` (inclusive upper bound)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(fraction * 65536)
    return format(n - 1, "04x") if n > 0 else ""


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on md5(key): stable across
    reruns/engines, no shuffle, predicate stays a pushable string compare.
    Exact expectation: floor(fraction * 65536) / 65536 of the key space."""
    t = _threshold(fraction)
    if not t:
        return df.limit(0)
    return df.where(_bucket(F.col(key_col)) <= t)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Stable split label: 'test' takes the lowest hash buckets, 'val' the
    next range, 'train' the rest — membership depends only on the key, so
    re-ingested or re-partitioned data never migrates between splits."""
    if val_fraction + test_fraction >= 1.0:
        raise ValueError("val_fraction + test_fraction must be < 1")
    b = _bucket(F.col(key_col))
    t_test = _threshold(test_fraction)
    t_val = _threshold(test_fraction + val_fraction)
    expr = F.lit("train")
    if t_val:
        expr = F.when(b <= t_val, "val").otherwise("train")
    if t_test:
        expr = F.when(b <= t_test, "test").otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-group deterministic sampling (dataset rebalancing): each group
    keeps its own fraction of the md5 key space. Same stability story as
    hash_sample — membership is a pure function of (group fraction, key),
    no shuffle, no rand(). Groups absent from ``fractions`` keep
    ``default_fraction``."""
    t_default = _threshold(default_fraction)
    expr = F.lit(t_default) if t_default else F.lit("")
    for g, frac in sorted(fractions.items()):
        t = _threshold(frac)
        expr = F.when(F.col(group_col) == g, F.lit(t if t else "")).otherwise(expr)
    return df.where(
        (expr != "") & (_bucket(F.col(key_col)) <= expr)
    )


def decontaminate_ngrams(
    train: DataFrame,
    heldout: DataFrame,
    text_col: str = "text",
    n: int = 13,
    min_shared: int = 1,
) -> DataFrame:
    """N-gram-overlap decontamination (the GPT-3 appendix-C style check):
    drop training docs sharing at least ``min_shared`` distinct word
    n-grams with the held-out corpus — catches partial/embedded leaks
    that exact-fingerprint decontamination misses.

    Plan: held-out docs reduce to a distinct gram-hash set (tiny for
    benchmark-sized held-out corpora → AQE broadcasts it); distinct
    training CONTENTS (keyed by normalized-text fingerprint — a
    deterministic key, unlike monotonically_increasing_id, which can
    diverge between the two plan branches that reference it) explode to
    (fp, gram-hash), inner-join the held-out set, count shared grams
    per content, and anti-join contents at/above the cutoff. Grams ship
    as 64-bit hashes (pandas ``hash_array`` SipHash — fixed-key and
    stable across processes, but NOT xxhash64; mirrors must join on the
    gram strings), never strings. 13 is the conventional n: long enough
    that a shared gram implies copying, not coincidence.
    """
    from victorialogs_spark.datapipe.dedup import token_ngram_hashes_arrow

    gen = token_ngram_hashes_arrow(text_col, n)
    key = fingerprint(F.coalesce(F.col(text_col), F.lit("")))
    t = train.withColumn("__vl_fp", key)
    ho_grams = heldout.select(F.explode(gen).alias("g")).distinct()
    contents = t.select("__vl_fp", text_col).dropDuplicates(["__vl_fp"])
    contaminated = (
        contents.select(F.col("__vl_fp"), F.explode(gen).alias("g"))
        .join(ho_grams, "g")
        .groupBy("__vl_fp")
        .agg(F.count(F.lit(1)).alias("__vl_shared"))
        .where(F.col("__vl_shared") >= min_shared)
        .select("__vl_fp")
    )
    return t.join(contaminated, "__vl_fp", "left_anti").drop("__vl_fp")


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Drop training docs whose normalized-content fingerprint appears in
    the held-out corpus (exact-match decontamination). A fingerprint
    left_anti join: the held-out side reduces to distinct 128-bit keys,
    broadcast by AQE when small, hash-shuffled when not — never a driver
    collect."""
    # NULL text reads as empty content (missing ≡ empty, the engine-wide
    # rule) so the join key is never NULL — a NULL key would silently
    # bypass the anti-join on the Spark side and NULL-poison a NOT IN on
    # any SQL mirror
    key = fingerprint(F.coalesce(F.col(text_col), F.lit("")))
    t_fp = train.withColumn("__vl_fp", key)
    h_fp = heldout.select(key.alias("__vl_fp")).distinct()
    return t_fp.join(h_fp, "__vl_fp", "left_anti").drop("__vl_fp")
