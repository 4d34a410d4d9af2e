"""LLM-training-data pipeline operators: dedup, similarity/ANN search,
text analysis, multimodal column plumbing. See dedup.py, similarity.py,
text.py, multimodal.py.

Some operators cache small mid-plan frames (bounded FIFO, cacheutil.py);
long-lived sessions can release them deterministically::

    from victorialogs_spark.datapipe import release_caches
    release_caches()
"""

from victorialogs_spark.datapipe.cacheutil import release_caches

__all__ = ["release_caches"]
