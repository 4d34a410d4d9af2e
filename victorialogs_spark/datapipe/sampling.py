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
    """Uniform 4-hex-char bucket of a key column ('0000'..'ffff').
    NULL keys hash as the empty string (the engine-wide missing≡empty
    rule, same as decontaminate's coalesce): md5(NULL) is NULL and a
    NULL bucket failed every threshold compare, silently DROPPING
    NULL-key rows even at fraction=1.0 and making them unsampleable in
    every stratified/mix/split caller (r14 review finding)."""
    return F.substring(
        F.md5(F.coalesce(c.cast("string"), F.lit("")).cast("binary")), 1, 4
    )


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
    as 64-bit hashes (SipHash token hashes folded by a seeded 64-bit
    polynomial — fixed-key and stable across processes, but not
    reproducible in SQL engines; mirrors must join on the gram strings),
    never strings. 13 is the conventional n: long enough that a shared
    gram implies copying, not coincidence.
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


def dsir_logweights(
    source: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") with the feature space
    reduced to unigrams: per source document, the mean over its token
    occurrences of ln(p_target(t) / p_source(t)), add-one smoothed over
    the UNION vocabulary of both corpora. High weights mark source docs
    that look like the target domain; resampling the source corpus
    proportionally to exp(weight) shifts it toward the target
    distribution. Feature-hash DSIR reduces to the same plan with the
    token replaced by a bounded hash — unigram IDs keep it exact and
    oracle-checkable.

    Plan (100 TB story): two explode → token-frequency aggregates (hash
    shuffle each); a full outer join of the two frequency tables on token
    builds the smoothed log-ratio table IN the shuffle (never on the
    driver); source tokens join it (AQE-skew-safe on stop-token hot keys)
    and aggregate per doc. Corpus totals (N_src, N_tgt, |V|) broadcast as
    one row.

    Determinism for cross-engine checking: the per-token log-ratio is ONE
    ln of one IEEE product/quotient, rounded to 9 decimals and summed as
    decimal(38,9) — exact, order-independent addition (same scheme as
    quality.unigram_logprob); the mean rounds to ``round_digits``.

    Output: (<id_col>, n_tokens long, dsir_logweight double); source docs
    with no tokens are absent.
    """
    from victorialogs_spark.datapipe.dedup import normalize_text

    def _toks(df: DataFrame, with_id: bool = False) -> DataFrame:
        cols = ([F.col(id_col)] if with_id else []) + [
            F.explode(
                F.split(normalize_text(F.col(text_col)), r"\s+")
            ).alias("__tok")
        ]
        return df.select(*cols).where(F.col("__tok") != "")

    src_toks = _toks(source, with_id=True)
    # frequency tables feed two branches each (totals + the ratio join):
    # cache so the corpus is exploded once per side, not twice.
    # NOTE: unigram_logprob's (doc, token) pre-aggregate was MEASURED
    # here and rejected (matched sessions, sf1 best-of 3.66 s as
    # written vs 4.57 s pre-aggregated): dsir caches the compact token
    # frequency table and streams raw tokens through one join, so
    # swapping that for a cached doc×token relation trades a cheap
    # narrow re-explode for a bigger cache + wider shuffle rows
    from victorialogs_spark.datapipe.cacheutil import bounded_cache

    sf = bounded_cache(
        src_toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__sf"))
    )
    tf = bounded_cache(
        _toks(target).groupBy("__tok").agg(F.count(F.lit(1)).alias("__tf"))
    )
    vocab = sf.join(tf, "__tok", "full_outer").select(
        "__tok",
        F.coalesce("__sf", F.lit(0)).alias("__sf"),
        F.coalesce("__tf", F.lit(0)).alias("__tf"),
    )
    totals = (
        vocab.agg(
            F.sum("__sf").alias("__ns"),
            F.sum("__tf").alias("__nt"),
            F.count(F.lit(1)).alias("__v"),
        )
    )
    ratio = vocab.crossJoin(F.broadcast(totals)).select(
        "__tok",
        F.round(
            F.log(
                ((F.col("__tf") + 1).cast("double")
                 * (F.col("__ns") + F.col("__v")).cast("double"))
                / ((F.col("__sf") + 1).cast("double")
                   * (F.col("__nt") + F.col("__v")).cast("double"))
            ),
            9,
        ).alias("__lr"),
    )
    return (
        src_toks.join(ratio, "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__lr").cast("decimal(38,9)")).alias("__s"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.col("__s").cast("double") / F.col("n_tokens"),
                round_digits,
            ).alias("dsir_logweight"),
        )
    )


def mix_sources(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Deterministic corpus mixing: downsample groups so the OUTPUT
    proportions match the target ``weights`` (the data-mixture step of a
    training pipeline — e.g. 60% web, 30% code, 10% papers — DoReMi-style
    weights applied by deterministic selection rather than rand()).

    No group is upsampled: the achievable total is bounded by the group
    with the scarcest supply relative to its weight, T = min_g n_g/w_g;
    each listed group then keeps fraction (w_g * T) / n_g of its rows (the
    binding group keeps 100%). Groups absent from ``weights`` are dropped.

    Group counts are one tiny aggregate (|groups| rows to the driver);
    membership is then a pure function of (group, md5(key)) — a pushable
    string compare, no shuffle, rerun- and engine-stable like the other
    hash samplers. Floor effects of the 16-bit bucket space make the
    realized fractions exact multiples of 1/65536 (documented bound).
    """
    if not weights:
        raise ValueError("weights must name at least one group")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    counts = {
        r["__g"]: r["__n"]
        for r in df.where(F.col(group_col).isin(list(weights)))
        .groupBy(F.col(group_col).alias("__g"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    missing = [g for g in weights if counts.get(g, 0) == 0]
    if missing:
        raise ValueError(f"groups absent from the corpus: {missing}")
    total = min(counts[g] / w for g, w in weights.items())
    # the binding group's fraction is pinned to exactly 1.0 by the
    # supply-ratio equality, NOT recomputed as (w*(n/w))/n — that
    # round-trip lands on 1-1ulp for ~5% of weight/count combinations,
    # which floors to bucket 'fffe' and silently drops the 'ffff' sliver
    # of the scarcest group. Groups whose fraction floors below 1/65536
    # are dropped entirely (the bucket space can't represent them) —
    # same rule as hash_sample, mirrored by the oracle.
    fractions = {
        g: (1.0 if counts[g] / w == total
            else min(1.0, (w * total) / counts[g]))
        for g, w in weights.items()
    }
    return stratified_hash_sample(df, group_col, key_col, fractions)
