"""Intra-document repetition signals — the Gopher-style quality rules
(Rae et al. 2021, "Scaling Language Models", table A1) used to filter
machine-generated / boilerplate text before training.

Two execution shapes, both shuffle-free or single-shuffle:

- Line/paragraph duplication (:func:`repetition_stats`): pure array
  higher-order functions over each row — a narrow map, NO shuffle, no
  UDF. At 100 TB this is scan-speed.
- N-gram repetition (:func:`ngram_repetition`): relational
  explode → two-level groupBy — per-doc gram counting happens as a
  partial aggregate map-side, so the single shuffle carries (doc, gram)
  partial counts, never raw gram instances. Fully SQL-expressible
  (oracle-checkable in DuckDB).

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


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Line- and paragraph-level duplication signals per document.
    Pure Column expressions (split + array_distinct + aggregate HOFs):
    one narrow projection, no shuffle, no Python.

    Output: (id, n_lines, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac).
    """
    c = F.col(text_col)
    lines = _nonempty(F.split(c, r"\n"))
    # paragraphs: split on blank lines (one-or-more newlines with only
    # horizontal whitespace between them)
    paras = _nonempty(F.split(c, r"\n[ \t]*\n+"))
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        _dup_frac(lines).alias("dup_line_frac"),
        _dup_char_frac(lines).alias("dup_line_char_frac"),
        _dup_frac(paras).alias("dup_para_frac"),
        _dup_char_frac(paras).alias("dup_para_char_frac"),
    )


def _positional_ngrams(c: Column, n: int) -> Column:
    """ALL word n-grams of the lowercased text in positional order
    (duplicates preserved — unlike dedup.token_ngrams, which
    distinct-ifies for shingling). Docs with < n words yield []."""
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Word-n-gram repetition per document, computed relationally.

    top_ngram_char_frac: chars covered by all occurrences of the single
    most frequent n-gram (ties → lexicographically smallest gram, fully
    deterministic) / total word chars. dup_ngram_char_frac: chars of
    gram instances beyond each gram's first occurrence / total word
    chars (a positional-overlap-free approximation of the Gopher rule —
    documented divergence: Gopher masks overlapping token positions,
    which needs per-token bookkeeping; the per-instance form is the
    standard relational surrogate and is monotone in the same signal).

    Plan: explode grams → groupBy(doc, gram) count (partial map-side
    combine absorbs each doc's repeats BEFORE the shuffle, so shuffle
    volume ≈ distinct grams, not gram instances) → groupBy(doc) max_by +
    conditional sums. Two shuffles, no UDF, no window.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(_positional_ngrams(F.col(text_col), n)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gchars = F.length(F.col("gram")) - F.lit(n - 1)  # word chars, no separators
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum(F.col("cnt") * gchars).alias("total_chars"),
        # most frequent gram; ties broken toward the lexicographically
        # smallest gram (max of (cnt, negated ordering) is not expressible
        # on strings, so use min_by over (-cnt, gram))
        F.min_by(
            F.struct(F.col("cnt"), F.col("gram")),
            F.struct((-F.col("cnt")).alias("nc"), F.col("gram")),
        ).alias("top"),
        F.sum(
            F.when(F.col("cnt") > 1, (F.col("cnt") - 1) * gchars).otherwise(0)
        ).alias("dup_chars"),
    )
    top_chars = F.col("top.cnt") * (F.length(F.col("top.gram")) - F.lit(n - 1))
    return per_doc.select(
        F.col(id_col),
        F.when(
            F.col("total_chars") > 0, top_chars / F.col("total_chars")
        ).cast("double").alias("top_ngram_char_frac"),
        F.when(
            F.col("total_chars") > 0, F.col("dup_chars") / F.col("total_chars")
        ).cast("double").alias("dup_ngram_char_frac"),
    )
