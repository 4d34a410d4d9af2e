"""End-to-end corpus curation: the composition a training-data team
actually runs, as one operator —

    quality filter → transitive near-dup dedup → decontamination

Each stage is one of this package's already-tested operators; the
composition stays lazy (one Spark job graph) except for the bounded
connected-components step. Near-dup clustering subsumes exact dedup:
byte-identical docs have n-gram Jaccard 1.0, so they land in the same
cluster without a separate fingerprint pass.

Scale shape: quality filtering is a narrow map; pair generation
shuffles on gram hashes (never all-pairs, stop-gram guard available);
clustering is union-find under a hard edge cap / distributed star
rounds above it; decontamination is a broadcast-friendly left-anti
join on content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.clusters import dedup_by_clusters
from victorialogs_spark.datapipe.dedup import ngram_jaccard_pairs
from victorialogs_spark.datapipe.quality import gopher_quality_flags


def curate_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    heldout: DataFrame | None = None,
    min_words: int = 1,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    require_gopher: bool = False,
    jaccard_n: int = 5,
    jaccard_threshold: float = 0.05,
    max_doc_freq: int | None = None,
    decontaminate_mode: str = "exact",
    decontaminate_n: int = 13,
) -> DataFrame:
    """Curated corpus: rows of ``docs`` that (1) pass the quality rules,
    (2) are their near-dup cluster's min-id representative, and (3) if
    ``heldout`` is given, don't share a content fingerprint with it.

    ``require_gopher=True`` applies the full Gopher rule set (including
    the stopword rule — English-centric); the default applies only the
    language-agnostic length/symbol/alpha rules with the given bounds
    (Catalyst column-prunes the unused signal expressions out of the
    executed plan, verified on the optimized plan).
    """
    flags = gopher_quality_flags(docs, id_col, text_col)
    if require_gopher:
        keep = flags.where(F.col("gopher_pass"))
    else:
        keep = flags.where(
            (F.col("n_words") >= min_words)
            & (F.col("symbol_word_ratio") <= max_symbol_ratio)
            & (F.col("alpha_word_frac") >= min_alpha_frac)
        )
    # filtered feeds three plan branches (pair generation — executed
    # eagerly inside connected components — the cluster backfill join,
    # and the final semi-join); without a cache each branch re-scans the
    # corpus and re-runs the quality filter, ~3-4 full scans at 100 TB
    from victorialogs_spark.datapipe.cacheutil import bounded_cache

    filtered = bounded_cache(
        docs.join(keep.select(id_col), id_col, "left_semi")
    )
    pairs = ngram_jaccard_pairs(
        filtered,
        id_col,
        text_col,
        n=jaccard_n,
        threshold=jaccard_threshold,
        max_doc_freq=max_doc_freq,
    )
    deduped = dedup_by_clusters(filtered, id_col, pairs)
    if heldout is not None:
        if decontaminate_mode == "ngram":
            from victorialogs_spark.datapipe.sampling import decontaminate_ngrams

            deduped = decontaminate_ngrams(
                deduped, heldout, text_col, n=decontaminate_n
            )
        elif decontaminate_mode == "exact":
            from victorialogs_spark.datapipe.sampling import decontaminate

            deduped = decontaminate(deduped, heldout, text_col)
        else:
            raise ValueError(
                f"decontaminate_mode must be 'exact' or 'ngram', got"
                f" {decontaminate_mode!r}"
            )
    return deduped
