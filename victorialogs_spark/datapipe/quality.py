"""Intra-document repetition signals — the Gopher-style quality rules
(Rae et al. 2021, "Scaling Language Models", table A1) used to filter
machine-generated / boilerplate text before training.

Every operator here is a NARROW per-document map — these statistics
never aggregate across documents, so the scale-correct plan has zero
shuffles and runs at scan speed on any corpus size:

- Line/paragraph duplication (:func:`repetition_stats`) and the Gopher
  rule set (:func:`gopher_quality_flags`): pure array higher-order
  functions / Column expressions, no Python.
- N-gram repetition (:func:`ngram_repetition`): one Arrow-batched
  pandas UDF (per-doc gram counting needs a hash map, which Column
  expressions lack) — values still deterministic and SQL-expressible,
  so DuckDB oracles check all of them.

Definitions follow the Gopher appendix:
- dup_line_frac:       duplicated lines / total non-empty lines
- dup_line_char_frac:  characters in duplicated lines / total chars
- dup_para_frac:       same over blank-line-separated paragraphs
- top_ngram_char_frac: chars covered by ALL occurrences of the most
                       frequent word n-gram / total word chars
- dup_ngram_char_frac: chars covered by word n-grams occurring more
                       than once / total word chars (each position
                       counted once)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.cacheutil import bounded_cache


def _nonempty(parts: Column) -> Column:
    return F.filter(parts, lambda p: F.trim(p) != "")


def _dup_frac(parts: Column) -> Column:
    """(count - distinct count) / count over an array, NULL if empty."""
    n = F.size(parts)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(parts))) / n
    ).cast("double")


def _dup_char_frac(parts: Column) -> Column:
    """Fraction of characters in parts that appear a 2nd+ time as whole
    parts: chars(all parts) - chars(distinct parts), over chars(all).
    Every repeated occurrence beyond the first counts as duplicated —
    the Gopher accounting."""
    total = F.aggregate(
        parts, F.lit(0).cast("long"), lambda acc, p: acc + F.length(p)
    )
    uniq = F.aggregate(
        F.array_distinct(parts),
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.length(p),
    )
    return F.when(total > 0, (total - uniq) / total).cast("double")


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, engine: str = "arrow"
) -> DataFrame:
    """Line- and paragraph-level duplication signals per document.

    ``engine="arrow"`` (default, r16): one Arrow pandas UDF computes all
    five signals per batch. The Column path's array HOFs (filter /
    array_distinct / aggregate lambdas) are CodegenFallback — the whole
    projection ran INTERPRETED, and each signal re-walked its array —
    while the Python twin is a few C-backed set/len operations per doc.
    Exactness: Spark `split` ≡ re.split on these patterns (both keep
    empty leading/trailing fields, the patterns can't match
    zero-width), `trim` strips 0x20 only (Python .strip(' ')), `length`
    counts code points (Python len), and the signal arithmetic is
    integer-exact with one IEEE double division — pinned engine-vs-
    engine by test_quality.py (adversarial cases + the full sf0.1
    corpus, zero mismatches) and by the DuckDB oracle entry.
    Interleaved A/B (r16): sf1 best 1.289 -> 0.448 s (0.35x), sf0.1
    0.335 -> 0.287 (0.86x — single scan task at this scale).

    ``engine="column"`` keeps the r13 staged Column-expression path
    (zero Python on the executors — kept for the A/B harness and as
    the no-Python-workers fallback).

    STAGED (column path): the split arrays materialize once in a first
    projection and the signal columns reference them by name — inlining
    the split expr into each signal looked equivalent, but Catalyst's
    subexpression elimination does not collapse the duplicated
    split+filter trees under the aggregate-HOF lambdas, so every signal
    re-ran the regex split (sf1 A/B: 3.46 s inlined -> 1.66 s staged;
    the same rule winnowing_fingerprints documents).

    Output: (id, n_lines, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac).
    """
    if engine == "arrow":
        return _repetition_stats_arrow(df, id_col, text_col)
    c = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        _nonempty(F.split(c, r"\n")).alias("__vl_lines"),
        # paragraphs: split on blank lines (one-or-more newlines with
        # only horizontal whitespace between them)
        # \n(?:[ \t]*\n)+ — the old \n[ \t]*\n+ could not consume TWO
        # consecutive blank lines carrying horizontal whitespace, gluing
        # a stray half-delimiter onto the next paragraph and hiding its
        # duplication from the Gopher signals (r14 review finding; the
        # DuckDB oracle changed in lockstep)
        _nonempty(F.split(c, r"\n(?:[ \t]*\n)+")).alias("__vl_paras"),
    )
    lines = F.col("__vl_lines")
    paras = F.col("__vl_paras")
    return staged.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        _dup_frac(lines).alias("dup_line_frac"),
        _dup_char_frac(lines).alias("dup_line_char_frac"),
        _dup_frac(paras).alias("dup_para_frac"),
        _dup_char_frac(paras).alias("dup_para_char_frac"),
    )


_PARA_RE = None  # compiled lazily inside the UDF (keeps import light)


def _repetition_stats_arrow(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Arrow twin of the Column-expression repetition signals (see
    repetition_stats). The struct rides one staged column and the five
    fields extract off its ATTRIBUTE in a second projection, so
    CollapseProject cannot clone the UDF per field (the minhash r14
    pathology); asNondeterministic for the same reason."""
    import re

    import pandas as pd

    para_re = re.compile(r"\n(?:[ \t]*\n)+")

    def _one(s):
        if s is None:
            return (None, None, None, None, None)
        lines = [p for p in s.split("\n") if p.strip(" ") != ""]
        paras = [p for p in para_re.split(s) if p.strip(" ") != ""]
        out = [len(lines)]
        for parts in (lines, paras):
            n = len(parts)
            uniq = set(parts)
            out.append((n - len(uniq)) / n if n > 0 else None)
            total = sum(map(len, parts))
            out.append(
                (total - sum(map(len, uniq))) / total if total > 0 else None
            )
        return out  # n_lines, dlf, dlcf, dpf, dpcf

    def _sig(series: pd.Series) -> pd.DataFrame:
        rows = [_one(s) for s in series.tolist()]
        # object dtype: an int64 column cannot hold the NULL-text None
        return pd.DataFrame(
            rows, columns=["n_lines", "dlf", "dlcf", "dpf", "dpcf"]
        ).astype({"n_lines": "object"})

    _sig.__annotations__ = {"series": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(
        _sig,
        "n_lines int, dlf double, dlcf double, dpf double, dpcf double",
    ).asNondeterministic()
    staged = df.select(F.col(id_col), udf(F.col(text_col)).alias("__vl_rep"))
    u = F.col("__vl_rep")
    return staged.select(
        F.col(id_col),
        u["n_lines"].alias("n_lines"),
        u["dlf"].alias("dup_line_frac"),
        u["dlcf"].alias("dup_line_char_frac"),
        u["dpf"].alias("dup_para_frac"),
        u["dpcf"].alias("dup_para_char_frac"),
    )


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Word-n-gram repetition per document.

    top_ngram_char_frac: word-chars covered by all occurrences of the
    single most frequent n-gram (ties → lexicographically smallest gram,
    fully deterministic) / total gram word-chars. dup_ngram_char_frac:
    word-chars of gram instances beyond each gram's first occurrence /
    total (a positional-overlap-free approximation of the Gopher rule —
    documented divergence: Gopher masks overlapping token positions,
    which needs per-token bookkeeping; the per-instance form is the
    standard surrogate and is monotone in the same signal).

    The statistic is strictly per-document, so the scale-correct plan is
    a NARROW Arrow-batched map — no shuffle at all. (The relational
    explode → groupBy(doc, gram) formulation shuffles every positional
    gram string: ~2000 grams × ~20 bytes per doc = 40 KB/doc of shuffle
    for a per-doc number — measured 20× slower at sf0.1.) Tokenization
    uses the explicit class ``[ \\t\\n\\f\\r]`` — the intersection both
    regex engines agree on (Java ``\\s`` includes \\x0b, RE2's doesn't)
    — so values stay oracle-checkable against DuckDB SQL; docs with < n
    words produce no output row.
    """
    import re

    import pandas as pd

    ws = re.compile(r"[ \t\n\f\r]+")

    def _rep(series):
        from collections import Counter

        top_out, dup_out, keep = [], [], []
        for text in series:
            if text is None:
                keep.append(False)
                top_out.append(None)
                dup_out.append(None)
                continue
            toks = [t for t in ws.split(text.lower()) if t]
            if len(toks) < n:
                keep.append(False)
                top_out.append(None)
                dup_out.append(None)
                continue
            keep.append(True)
            # per-gram word chars = len(joined gram) - (n-1) separators
            counts = Counter(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            total = dup = 0
            top_cnt, top_gram = 0, ""
            for gram, cnt in counts.items():
                chars = len(gram) - (n - 1)
                total += cnt * chars
                if cnt > 1:
                    dup += (cnt - 1) * chars
                if cnt > top_cnt or (cnt == top_cnt and gram < top_gram):
                    top_cnt, top_gram = cnt, gram
            top_chars = top_cnt * (len(top_gram) - (n - 1))
            top_out.append(top_chars / total if total > 0 else None)
            dup_out.append(dup / total if total > 0 else None)
        return pd.DataFrame(
            {"keep": keep, "top_frac": top_out, "dup_frac": dup_out}
        )

    _rep.__annotations__ = {"series": pd.Series, "return": pd.DataFrame}
    # nondeterministic mark (the function is deterministic): the keep
    # filter + field projections otherwise each re-extract the UDF
    # (double ArrowEvalPython over the full corpus, round-7 plan audit)
    udf = F.pandas_udf(
        _rep, "keep boolean, top_frac double, dup_frac double"
    ).asNondeterministic()
    return (
        df.select(F.col(id_col), udf(F.col(text_col)).alias("__r"))
        .where(F.col("__r.keep"))
        .select(
            F.col(id_col),
            F.col("__r.top_frac").alias("top_ngram_char_frac"),
            F.col("__r.dup_frac").alias("dup_ngram_char_frac"),
        )
    )


# stopwords for the Gopher "contains ≥2 stopwords" rule (Rae et al. A1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, table A1)
    as one narrow projection — each signal a pure Column expression, no
    shuffle, no UDF, so at 100 TB this runs at scan speed:

    - n_words, mean_word_len        (rule: 50..100k words, mean 3..10)
    - symbol_word_ratio             (# or ... per word, rule: <= 0.1)
    - bullet_line_frac              (lines starting with a bullet, <= 0.9)
    - ellipsis_line_frac            (lines ending with ..., <= 0.3)
    - alpha_word_frac               (words with >= 1 alphabetic char, >= 0.8)
    - stopword_hits                 (distinct Gopher stopwords present, >= 2)
    - gopher_pass                   (all rules hold)

    Word = ASCII-whitespace-separated token, matching the repo-wide
    Java/RE2 ``\\s`` convention so every signal is oracle-checkable.
    """
    c0 = F.col(text_col)
    # STAGED (the repetition_stats rule): the split arrays materialize
    # once; Catalyst's subexpression elimination does not collapse the
    # duplicated split+filter trees under HOF lambdas, and `words` alone
    # feeds five signals below
    # explicit class, not \s: Java \s includes \x0b, RE2's (the DuckDB
    # oracle) doesn't — split on the set both engines agree on
    df = df.select(
        F.col(id_col),
        c0.alias("__vl_text"),
        F.filter(F.split(c0, r"[ \t\n\f\r]+"), lambda t: t != "").alias(
            "__vl_words"
        ),
        F.filter(F.split(c0, r"\n"), lambda l: F.trim(l) != "").alias(
            "__vl_lines"
        ),
    )
    c = F.col("__vl_text")
    words = F.col("__vl_words")
    n_words = F.size(words)
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(n_words > 0, total_word_chars / n_words).cast("double")
    # symbols-per-word: '#' occurrences plus '...' occurrences
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ellipsis = F.floor(
        (F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / 3
    )
    symbol_word_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).cast("double")
    lines = F.col("__vl_lines")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))) / n_lines,
    ).cast("double")
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))) / n_lines,
    ).cast("double")
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))) / n_words,
    ).cast("double")
    # lowercase the ALREADY-SPLIT token array instead of re-splitting
    # lower(text) — drops the third full-text split (r14 sixth-pass
    # deferral; sf1 A/B in SCALE.md). Identical semantics: ASCII
    # whitespace is a fixed point of lower(), so split-then-lower ==
    # lower-then-split token-for-token.
    low_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(low_words),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_word_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        F.coalesce(gopher_pass, F.lit(False)).alias("gopher_pass"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 6
) -> DataFrame:
    """Corpus-relative unigram log-probability per document — the
    perplexity-style quality signal (CCNet, Wenzek et al. 2020) with the
    language model reduced to corpus unigram frequencies, so the whole
    computation stays inside the engine: score(d) = mean over tokens t
    of ln(freq(t) / N). Low scores flag gibberish / rare-token soup;
    suspiciously high scores flag boilerplate.

    Plan: one explode → per-(doc, token) count aggregate (partial agg
    combines occurrences map-side, so the shuffle carries counts, not
    raw tokens — at corpus scale this is the difference between
    shuffling every token occurrence and shuffling the much smaller
    doc×distinct-token relation), then the token-frequency aggregate
    and the join back both run over that pre-aggregated frame
    (token-partitioned, AQE-skew-safe — stop-word tokens are the hot
    keys), one per-doc aggregate. No driver state, no UDF; the
    frequency table lives in the shuffle, never on one node.
    Measured (matched isolated sessions): sf1 best-of 5.95 s → 3.48 s
    (median 8.9 → 3.7) vs a ~12% fixed-overhead cost at sf0.1
    (1.34 → 1.50) — the natural-text dup factor (stop words) that pays
    for the extra aggregate is scale-independent, so the win grows with
    the corpus. Contrast bigram_logprob below, where dup factor ~1
    makes the same rewrite a loss.

    Determinism for cross-engine checking: per-token ln values round to
    9 decimals and sum as decimals — a count × decimal(12,9) product is
    exact (decimal(23,9), no precision-loss rescale) and equals adding
    the rounded ln once per occurrence, so addition stays exact and
    order-independent and any engine computing the same lns gets the
    bit-identical mean, which then rounds to ``round_digits``.

    Output: (<id_col>, n_tokens long, logprob double) — docs with no
    tokens are absent (no tokens ⇒ no distribution).
    """
    from victorialogs_spark.datapipe.dedup import normalize_text

    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(normalize_text(F.col(text_col)), r"\s+")
            ).alias("__tok"),
        )
        .where(F.col("__tok") != "")
    )
    # doc×token counts feed TWO plan branches (the corpus frequency agg
    # and the join back); without a cache each branch re-scans and
    # re-explodes the whole corpus — the same multi-branch rule
    # curate_corpus documents
    dt = bounded_cache(
        toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    )
    freq = dt.groupBy("__tok").agg(F.sum("__c").alias("__tf"))
    total = freq.agg(F.sum("__tf").alias("__n"))
    # ln(tf) rounded to 9dp as decimal(12,9) (ln of any corpus count
    # fits 3 integral digits); × count decimal(10,0) -> decimal(23,9),
    # exact — identical to summing the rounded ln per occurrence
    ln9 = F.round(F.log(F.col("__tf").cast("double")), 9).cast(
        "decimal(12,9)"
    )
    per_doc = (
        dt.join(freq, "__tok")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(
                (F.col("__c").cast("decimal(10,0)") * ln9)
                .cast("decimal(38,9)")
            ).alias("__sum_ln_tf"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.col("__sum_ln_tf").cast("double") / F.col("n_tokens")
            - F.log(F.col("__n").cast("double")),
            round_digits,
        ).alias("logprob"),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus-relative unigram log-probability, cut the
    score distribution at its terciles, and label docs head (most fluent
    / highest logprob), middle, or tail. CCNet trains the LM once and
    streams docs against FIXED thresholds — mirrored here: the cuts are
    one global aggregate (two numbers), broadcast to a threshold compare,
    so no global sort or rank shuffle ever happens.

    The cut aggregate uses Spark's exact interpolated ``percentile`` so
    the boundaries are engine-reproducible (DuckDB ``quantile_cont`` has
    the same 1+p(n-1) definition); a 100 TB deployment would swap in
    ``approx_percentile`` and accept boundary fuzz — the bucket SEMANTICS
    (threshold compare against two broadcast constants) are identical.

    Output: (<id_col>, n_tokens, logprob, bucket string); docs with no
    tokens are absent (no score).
    """
    # the score table feeds TWO branches (the cut aggregate and the
    # labeled output) — cache it so the corpus is scored once, not twice;
    # it is 3 narrow columns per doc, disk-spillable
    scored = bounded_cache(unigram_logprob(df, id_col, text_col))
    cuts = scored.agg(
        F.percentile("logprob", F.lit(1.0 / 3.0)).alias("__c1"),
        F.percentile("logprob", F.lit(2.0 / 3.0)).alias("__c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col),
        "n_tokens",
        "logprob",
        F.when(F.col("logprob") > F.col("__c2"), F.lit(labels[0]))
        .when(F.col("logprob") > F.col("__c1"), F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
        .alias("bucket"),
    )


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 6
) -> DataFrame:
    """Corpus-relative BIGRAM log-probability per document — the next step
    up from :func:`unigram_logprob` toward a KenLM-style fluency filter:
    score(d) = mean over adjacent token pairs (w1, w2) of
    ln P(w2 | w1), with add-one smoothing over the corpus vocabulary:
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Word-salad documents built
    from common tokens in random order — which unigram scoring cannot
    distinguish from prose — score low here.

    Plan (100 TB story): one narrow map builds adjacent pairs per doc
    (pure Column: arrays_zip of the token array with itself shifted — no
    UDF), then the same shape as unigram_logprob: pair-frequency
    aggregate, unigram-frequency aggregate, join back on the pair
    (AQE-skew-safe), per-doc aggregate; V broadcasts as one row.

    Determinism: one ln of one IEEE quotient per pair, rounded 9dp,
    summed as decimal(38,9) (order-independent exact), mean rounded to
    ``round_digits``. Output: (<id_col>, n_bigrams long, bigram_logprob
    double); docs with fewer than 2 tokens are absent.
    """
    from victorialogs_spark.datapipe.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), r"\s+"),
        lambda t: t != "",
    )
    pairs_arr = F.expr(
        # slice(a, 1, n-1) zipped with slice(a, 2, n-1): adjacent pairs
        "zip_with(slice(__toks, 1, size(__toks) - 1),"
        " slice(__toks, 2, size(__toks) - 1),"
        " (a, b) -> struct(a as w1, b as w2))"
    )
    pairs = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .where(F.size("__toks") >= 2)
        .select(F.col(id_col), F.explode(pairs_arr).alias("__p"))
        .select(
            F.col(id_col),
            F.col("__p.w1").alias("__w1"),
            F.col("__p.w2").alias("__w2"),
        )
    )
    # c(w1) conditions only on w1 occurrences that HAVE a successor, so
    # it is exactly the w1-marginal of the pair-frequency table — derive
    # it from pair_freq (an agg of an agg: tiny) instead of re-exploding
    # the corpus. pair_freq itself feeds the marginal AND the ratio
    # join: cache it so the heavy pair build runs once for both (the
    # final per-doc join streams `pairs` a second time — one more
    # narrow-map pass, the same recompute-don't-persist tradeoff
    # repeated_spans documents). V is the corpus vocabulary (separate
    # cheap aggregate). NOTE: unigram_logprob's doc-level pre-aggregate
    # was MEASURED here and rejected — bigrams rarely repeat within a
    # doc (dup factor ~1), so a (doc, w1, w2) groupBy adds a wide extra
    # shuffle with no reduction (sf1 A/B, cold-session best-of:
    # 9.2 s as written vs 10.4 s pre-aggregated).
    from pyspark import StorageLevel

    pair_freq = bounded_cache(
        pairs.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__pf")),
        StorageLevel.MEMORY_AND_DISK,
    )
    w1_freq = pair_freq.groupBy("__w1").agg(F.sum("__pf").alias("__uf"))
    vocab = (
        df.select(F.explode(toks).alias("__t"))
        .agg(F.countDistinct("__t").alias("__v"))
    )
    ratio = (
        pair_freq.join(w1_freq, "__w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "__w1",
            "__w2",
            F.round(
                F.log(
                    (F.col("__pf") + 1).cast("double")
                    / (F.col("__uf") + F.col("__v")).cast("double")
                ),
                9,
            ).alias("__lr"),
        )
    )
    return (
        pairs.join(ratio, ["__w1", "__w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("__lr").cast("decimal(38,9)")).alias("__s"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(
                F.col("__s").cast("double") / F.col("n_bigrams"),
                round_digits,
            ).alias("bigram_logprob"),
        )
    )
