"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language identification, document fingerprinting.

Everything is a pure Column expression (JVM-side, codegen-friendly) so the
operators compose with any scan and stay narrow (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the n-gram/stopword heuristic.
# Deterministic and tiny on purpose — the operator shape (score per
# language, argmax) is what matters; swap lists for a real deployment.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "dans", "pour", "que"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(c: Column) -> Column:
    """Whitespace tokens (array<string>)."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-flavored token estimate: letter runs count 1 per word, digits 1
    each, punctuation 1 each (a cheap deterministic proxy for a real
    tokenizer's token count)."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: chars, whitespace tokens, BPE-ish tokens,
    unique-token ratio, mean word length. The token array is STAGED in a
    first projection (the repetition_stats rule: Catalyst does not
    collapse duplicated split+filter trees under HOF lambdas, and the
    array feeds five signal expressions)."""
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        tokens(t).alias("__vl_toks"),
    )
    toks = F.col("__vl_toks")
    return staged.select(
        F.col(id_col),
        "n_chars",
        F.size(toks).alias("n_tokens"),
        "n_bpe_tokens",
        # empty/whitespace-only docs: NULL ratios, not DIVIDE_BY_ZERO —
        # under Spark 4's default ANSI mode an unguarded division kills
        # the whole job on one empty doc (r14 review finding; same guard
        # pattern quality.py uses everywhere)
        F.when(
            F.size(toks) > 0,
            (F.size(F.array_distinct(toks)) / F.size(toks)),
        ).cast("double").alias("uniq_ratio"),
        F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
            / F.size(toks),
        ).cast("double").alias("mean_word_len"),
    )


def quality_score(c: Column) -> Column:
    """Heuristic quality score in [0,1]: penalizes very short docs, low
    token diversity and punctuation/symbol soup. Deterministic Column
    expression (one pass, no shuffle)."""
    toks = tokens(c)
    n_tok = F.size(toks)
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    diversity = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    sym = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    sym_ratio = F.when(F.length(c) > 0, sym / F.length(c)).otherwise(F.lit(1.0))
    score = len_score * F.lit(0.4) + diversity * F.lit(0.4) + (1 - sym_ratio) * F.lit(0.2)
    return F.round(score.cast("double"), 6)


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over the token set."""
    toks = F.array_distinct(tokens(F.lower(c)))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id(c: Column) -> Column:
    """argmax language by stopword hits; '' when nothing matches.
    Ties break by the fixed language order (en, es, de, fr)."""
    scores = lang_scores(c)
    entries = [
        F.struct(s.alias("score"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang"))
        for i, (lang, s) in enumerate(scores.items())
    ]
    best = F.greatest(*entries)  # struct compare: score first, then priority
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit(""))


def with_lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col), lang_id(F.col(text_col)).alias("lang_guess"))


# PII patterns kept to syntax valid AND equivalent in both Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround, explicit classes
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # leading context group (RE2 has no lookbehind): without it the
    # pattern matched a 10-13 digit SUFFIX inside longer digit runs,
    # splitting timestamps/order-ids into '<digits><PHONE>' (r14 review
    # finding); redact_pii re-emits the context via $1
    "phone": r"(^|[^0-9])((?:\+?\d{1,3}[-. (]{0,2})?\d{3}[-. )]{0,2}\d{3}[-. ]?\d{4})\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(c: Column, kinds: list[str] | None = None) -> Column:
    """Replace common PII shapes with <KIND> placeholders — the standard
    pre-training scrub. Pure chained regexp_replace (JVM-side, narrow,
    no UDF); patterns are engine-portable so the operation is
    oracle-checkable."""
    out = c
    for kind in kinds or list(PII_PATTERNS):
        repl = f"<{kind.upper()}>"
        if kind == "phone":
            repl = "$1" + repl  # re-emit the captured leading context
        out = F.regexp_replace(out, PII_PATTERNS[kind], repl)
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = 2048,
    overlap: int = 256,
) -> DataFrame:
    """Split documents into fixed-size character windows with overlap —
    the context-window packing step of a training pipeline. Pure Column
    expressions (sequence → transform → explode): a narrow per-row
    expansion, no shuffle, no UDF. Output: (id, chunk_idx, chunk_start,
    chunk_text); every document yields at least one chunk (possibly
    empty), so no row silently disappears."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    c = F.col(text_col)
    n = F.greatest(
        F.ceil((F.length(c) - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx")
    out = df.select(F.col(id_col), idx, c.alias("__t"))
    start = F.col("chunk_idx") * stride
    return out.select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.alias("chunk_start"),
        F.col("__t").substr(start + F.lit(1), F.lit(chunk_chars)).alias("chunk_text"),
    )


def doc_fingerprints(
    df: DataFrame, id_col: str, text_col: str, window: int = 16
) -> DataFrame:
    """Document fingerprinting: full-content md5 plus a winnowing-style
    rolling fingerprint (min md5 over all ``window``-char substrings of the
    normalized text — stable under content reordering/append).
    md5 keeps the values engine-independent (oracle-checkable).

    The rolling min runs in an Arrow pandas UDF: hashlib.md5 over a sliding
    window is ~100× cheaper than the interpreted higher-order-function
    chain (per-substring Catalyst expression eval) it replaces — still one
    narrow map, no shuffle. Normalization is the shared JVM-exact
    py_normalize_text (ASCII \\s, NULL→NULL), so fp_full always equals
    dedup.fingerprint() for the same input. Windows are min'd as raw
    16-byte digests (hex is order-preserving, so only the winner pays the
    hex conversion); ASCII docs slice one pre-encoded buffer instead of
    re-encoding every substring. The residual per-window md5 call is C —
    the Python loop contributes ~0.15µs/window over a bounded doc length,
    a narrow map with no shuffle, which is the documented bound."""
    import hashlib

    import pandas as pd

    from victorialogs_spark.datapipe.dedup import py_normalize_text

    def _fps(series):
        md5 = hashlib.md5
        full, rolling = [], []
        for text in series:
            s = py_normalize_text(text)
            if s is None:
                full.append(None)
                rolling.append(None)
                continue
            b = s.encode("utf-8")
            full.append(md5(b).hexdigest())
            if len(s) <= window:
                rolling.append(md5(b).hexdigest())
            elif len(b) == len(s):
                # pure-ASCII: char windows == byte windows; slice the one
                # encoded buffer through a zero-copy memoryview
                mv = memoryview(b)
                rolling.append(
                    min(
                        md5(mv[i : i + window]).digest()
                        for i in range(len(b) - window + 1)
                    ).hex()
                )
            else:
                rolling.append(
                    min(
                        md5(s[i : i + window].encode("utf-8")).digest()
                        for i in range(len(s) - window + 1)
                    ).hex()
                )
        return pd.DataFrame({"fp_full": full, "fp_rolling": rolling})

    _fps.__annotations__ = {"series": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(_fps, "fp_full string, fp_rolling string")
    return df.select(
        F.col(id_col),
        udf(F.col(text_col)).alias("__fp"),
    ).select(F.col(id_col), F.col("__fp.fp_full").alias("fp_full"), F.col("__fp.fp_rolling").alias("fp_rolling"))


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — keyword extraction for corpus
    exploration and topic-balanced sampling. tfidf = tf * (ln((N+1)/(df+1))
    + 1) (the smoothed scikit-learn-style idf: never negative, defined for
    unseen terms); ties break on the term string so the result is
    deterministic and engine-portable (a single multiply of a count by one
    ln — bit-identical IEEE in any engine, no summation-order hazard).

    Plan (100 TB story): one explode → (doc, term) partial-agg shuffle for
    tf; per-doc distinct terms → term shuffle for document frequency; one
    join back on term (hot stop-terms are exactly what AQE skew-join
    splits); final per-doc top-k via a row_number window PARTITIONED BY
    doc — bounded by a single document's vocabulary, never global. The
    corpus size N broadcasts as one row.

    Output: (<id_col>, term, tf, tfidf, rank), rank 1..k per doc.
    """
    from pyspark.sql import Window

    from victorialogs_spark.datapipe.dedup import normalize_text

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), r"\s+")).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    # tf feeds TWO plan branches (the document-frequency aggregate and
    # the join back); uncached, each branch re-scans and re-explodes the
    # whole corpus — the same multi-branch rule unigram_logprob and
    # curate_corpus document. MEMORY_AND_DISK: the doc×distinct-term
    # relation spills rather than evicting under pressure.
    from pyspark import StorageLevel

    from victorialogs_spark.datapipe.cacheutil import bounded_cache

    tf = bounded_cache(
        toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")),
        StorageLevel.MEMORY_AND_DISK,
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("__n") + 1).cast("double")
                    / (F.col("__df") + 1).cast("double")
                )
                + 1.0
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def norm_tokens(text_col: str) -> Column:
    """Whitespace tokens of the normalized (lowercase, collapsed-\\s)
    text — THE shared tokenization of every oracle-checked token
    operator here (winnowing, ngram_counts; mirrors quality.py's and the
    DuckDB oracles' _NORM split). One definition so a tokenization fix
    cannot silently diverge between operators."""
    from victorialogs_spark.datapipe.dedup import normalize_text

    return F.filter(
        F.split(normalize_text(F.col(text_col)), r"\s+"), lambda t: t != ""
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003
    — the MOSS algorithm): hash every ``k``-token gram, slide a window
    of ``w`` consecutive gram hashes, and select each window's minimum
    — rightmost minimum on ties (the paper's baseline algorithm with a
    deterministic tie rule; NOT its "robust winnowing" variant, which
    prefers re-selecting the previous window's fingerprint on ties),
    deduplicated across overlapping windows. The guarantee: any shared
    substring of at least ``k + w - 1`` tokens yields at least one
    shared selected fingerprint, while only ~2/(w+1) of all gram hashes
    are kept.

    Tokenization stays JVM-side (norm_tokens — the shared definition
    every oracle-checked token operator uses); the gram build, md5 hash
    (first 15 hex digits as int64 — conv(hex,16,10)-reproducible in any
    engine), sliding-window minima and tie rule run in ONE Arrow-
    vectorized mapInPandas over the token arrays. This replaced the
    pure-Column transform/slice/array_min formulation: Catalyst
    evaluates higher-order-function lambdas INTERPRETED (never
    whole-stage codegen), and the staged Column pipeline measured
    13.4 s at sf1 vs 3-4 s for this map — same narrow no-shuffle plan
    shape as the simhash/minhash sketch maps, executor-parallel, no
    driver state.

    Docs with fewer than ``k`` tokens hash their whole token sequence
    as one gram; fewer grams than ``w`` form a single window. Empty
    docs yield no rows. Output: (<id_col>, pos int — 0-based gram
    index, fp long), distinct per doc.
    """
    from typing import Iterator

    staged = df.select(F.col(id_col), norm_tokens(text_col).alias("__t"))

    def _batches(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, poss, fps = [], [], []
            for doc, toks in zip(pdf[id_col], pdf["__t"]):
                # NULL text survives norm_tokens as a NULL array (None
                # here); treat it as the empty doc the contract promises
                toks = list(toks) if toks is not None else []
                if not toks:
                    continue
                if len(toks) < k:
                    grams = [" ".join(toks)]
                else:
                    grams = [
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    ]
                h = np.fromiter(
                    (
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
                m = len(h)
                if m <= w:
                    # single window over everything; rightmost min
                    j = m - 1 - int(np.argmin(h[::-1]))
                    sel_pos = np.array([j])
                    sel_fp = h[sel_pos]
                else:
                    win = np.lib.stride_tricks.sliding_window_view(h, w)
                    # rightmost min per window: argmin over the reversed
                    # window gives the FIRST match there = last in order
                    a = w - 1 - np.argmin(win[:, ::-1], axis=1)
                    pos_all = np.arange(m - w + 1) + a
                    # distinct across overlapping windows (pos implies fp)
                    sel_pos = np.unique(pos_all)
                    sel_fp = h[sel_pos]
                ids.extend([doc] * len(sel_pos))
                poss.extend(sel_pos.tolist())
                fps.extend(sel_fp.tolist())
            yield pd.DataFrame(
                {id_col: ids, "pos": pd.array(poss, dtype="int32"),
                 "fp": pd.array(fps, dtype="int64")}
            )

    id_type = dict(df.dtypes)[id_col]
    return staged.mapInPandas(
        _batches, f"{id_col} {id_type}, pos int, fp long"
    )


def ngram_counts(
    df: DataFrame,
    text_col: str,
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Corpus n-gram count table — the LM-training preprocessing export
    (KenLM-style counts): every ``n``-token sequence with its corpus
    frequency, space-joined over whitespace-normalized lowercase tokens.
    ``min_count`` drops the long tail (the standard pruning knob; at
    100 TB the tail IS most of the table).

    Plan: tokens stay JVM-side (the shared norm_tokens definition); one
    Arrow map builds grams AND partial-aggregates them per batch with a
    Counter, so the single shuffle carries (gram, partial count) pairs
    combined at Python-batch granularity, and the final groupBy sums.
    This replaced the pure-Column transform/concat_ws gram build +
    explode: Catalyst evaluates HOF lambdas interpreted (the winnowing
    rule) and the per-gram expression walk dominated the query. Docs
    with fewer than ``n`` tokens contribute nothing (an n-gram model
    has no event for them). Output: (ngram string, count long).
    """
    from typing import Iterator

    staged = df.select(norm_tokens(text_col).alias("__t"))

    def _batches(batches: Iterator) -> Iterator:
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            c: Counter = Counter()
            for toks in pdf["__t"]:
                # NULL text → NULL token array (None); no grams, like
                # any other shorter-than-n doc
                if toks is None or len(toks) < n:
                    continue
                toks = list(toks)
                c.update(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
            yield pd.DataFrame(
                {"ngram": list(c.keys()),
                 "__c": pd.array(list(c.values()), dtype="int64")}
            )

    out = (
        staged.mapInPandas(_batches, "ngram string, __c long")
        .groupBy("ngram")
        .agg(F.sum("__c").alias("count"))
    )
    if min_count > 1:
        out = out.where(F.col("count") >= min_count)
    return out
