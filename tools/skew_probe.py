"""Mega-cluster skew probe (VERDICT r13 stretch #7): the stop-gram
guard covers n-gram document-frequency skew, but a single template
cluster (one boilerplate doc duplicated across k% of the corpus) hits
a DIFFERENT stage: every cluster member lands in the SAME MinHash
(band, bucket), so the in-bucket pair generation is O(k^2) structs in
ONE task — the collect_list array and the pair explode grow
quadratically while every other task stays flat.

This probe measures minhash_near_dups and repeated_spans on synthetic
corpora with a template cluster at 0 / 1.7 / 6.7 / 16.7% of 30k docs, with
and without the max_bucket_size guard. repeated_spans is expected to
stay near-flat (its plan note: the span join was chosen over a count
window precisely so AQE's skew-join handles the hot span key);
minhash_near_dups without a guard is expected to blow up
quadratically, which is the measurement that motivates the guard.

Usage: python tools/skew_probe.py [--docs 30000] [--runs 2]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = 30_000
if "--docs" in sys.argv:
    N_DOCS = int(sys.argv[sys.argv.index("--docs") + 1])
RUNS = 2
if "--runs" in sys.argv:
    RUNS = int(sys.argv[sys.argv.index("--runs") + 1])


def main() -> int:
    import numpy as np
    import pandas as pd

    from victorialogs_spark.datapipe.dedup import (
        minhash_near_dups,
        repeated_spans,
    )
    from victorialogs_spark.session import get_spark

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    parallelism = spark.sparkContext.defaultParallelism

    rng = np.random.RandomState(1404)
    vocab = [f"w{i:04d}" for i in range(4000)]
    template = " ".join(rng.choice(vocab, 60))

    def corpus(cluster: int):
        texts = []
        for i in range(N_DOCS):
            if i < cluster:
                # near-copy: template + one unique trailing token, so
                # members are NEAR-dups (sketches nearly identical, all
                # bands collide) rather than byte-identical
                texts.append(f"{template} uniq{i}")
            else:
                texts.append(" ".join(rng.choice(vocab, 60)))
        pdf = pd.DataFrame({"doc_id": np.arange(N_DOCS), "text": texts})
        return spark.createDataFrame(pdf).repartition(parallelism)

    def timed(fn):
        best = None
        for _ in range(RUNS):
            t0 = time.monotonic()
            n = fn().count()
            dt_ = time.monotonic() - t0
            best = dt_ if best is None or dt_ < best else best
        return best, n

    print(f"docs={N_DOCS} runs={RUNS} (best-of)")
    for cluster in (0, N_DOCS // 60, N_DOCS // 15, N_DOCS // 6):
        docs = corpus(cluster).cache()
        docs.count()
        t_un, n_un = timed(lambda: minhash_near_dups(
            docs, "doc_id", "text", num_hashes=32, bands=4, threshold=0.7))
        t_g, n_g = timed(lambda: minhash_near_dups(
            docs, "doc_id", "text", num_hashes=32, bands=4, threshold=0.7,
            max_bucket_size=256))
        t_rs, _ = timed(lambda: repeated_spans(docs, "doc_id", "text", 20))
        print(
            f"cluster={cluster:6d} ({100*cluster/N_DOCS:4.1f}%)  "
            f"minhash unguarded {t_un:7.2f}s/{n_un} pairs  "
            f"guarded(256) {t_g:7.2f}s/{n_g} pairs  "
            f"repeated_spans {t_rs:6.2f}s",
            flush=True,
        )
        docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
