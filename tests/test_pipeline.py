"""curate_corpus: the composed quality → dedup → decontamination
pipeline on a corpus where each stage must remove a specific doc."""

import pytest

from victorialogs_spark.datapipe.pipeline import curate_corpus

GOOD_A = "the quick brown fox jumps over the lazy dog near the river today"
GOOD_A_DUP = "the quick brown fox jumps over the lazy dog near the river now"
GOOD_B = "completely different prose about mountain weather and long hiking trips"
LEAKED = "this exact paragraph also appears in the evaluation benchmark set"
SYMBOLS = "### #### ## # ### ## #### # ## ###"


def _pin_file_order(first, second):
    """FileStreamSource orders files by modification time; back-to-back
    writes can tie on coarse-granularity filesystems, flipping batch
    order under maxFilesPerTrigger=1. Pin it explicitly."""
    import os
    import time

    now = time.time()
    os.utime(first, (now - 10, now - 10))
    os.utime(second, (now, now))


def test_each_stage_removes_its_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD_A),
            (2, GOOD_A_DUP),  # near-dup of 1 -> dropped (cluster rep = 1)
            (3, GOOD_B),
            (4, LEAKED),      # exact match in heldout -> dropped
            (5, SYMBOLS),     # symbol soup -> dropped by quality rules
        ],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame([(100, LEAKED)], "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in curate_corpus(
            docs, "doc_id", "text", heldout=heldout,
            jaccard_n=3, jaccard_threshold=0.5,
        ).collect()
    )
    assert kept == [1, 3]


def test_no_heldout_keeps_leaked_doc(spark):
    docs = spark.createDataFrame(
        [(1, GOOD_A), (4, LEAKED)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in curate_corpus(docs, "doc_id", "text").collect()
    )
    assert kept == [1, 4]


def test_require_gopher_applies_full_rule_set(spark):
    # GOOD_A has stopwords but only 12 words -> fails the 50-word rule
    docs = spark.createDataFrame([(1, GOOD_A)], "doc_id long, text string")
    kept = curate_corpus(docs, "doc_id", "text", require_gopher=True).collect()
    assert kept == []
    # needs >= 2 distinct Gopher stopwords: "the" and "of"
    long_doc = " ".join([GOOD_A + " south of town"] * 6)
    docs2 = spark.createDataFrame([(1, long_doc)], "doc_id long, text string")
    kept2 = curate_corpus(docs2, "doc_id", "text", require_gopher=True).collect()
    assert [r["doc_id"] for r in kept2] == [1]


def test_stream_minhash_neardup_across_batches(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.streaming.neardup import stream_minhash_neardup

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: doc 1; batch 2: doc 5 = near-dup of 1, doc 9 = unrelated.
    # maxFilesPerTrigger=1 forces separate micro-batches, so the collision
    # is detected via STATE, not within one batch.
    pd.DataFrame({"doc_id": [1], "text": [GOOD_A]}).to_parquet(src / "a.parquet")
    pd.DataFrame(
        {"doc_id": [5, 9], "text": [GOOD_A_DUP, GOOD_B]}
    ).to_parquet(src / "b.parquet")
    _pin_file_order(src / "a.parquet", src / "b.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = "sndup_test"
    q = (
        stream_minhash_neardup(stream, num_hashes=8, bands=4, n=3)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
        .collect()
    )
    got = {r["doc_id"]: r["dup_of"] for r in out}
    assert got == {5: 1}  # 5 collides with 1 through state; 9 clean


def test_stream_neardup_flags_late_smaller_id(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.streaming.neardup import stream_minhash_neardup

    src = tmp_path / "src"
    src.mkdir()
    # doc 7 arrives first, then near-dup doc 2 with a SMALLER id: the
    # late arrival must still be flagged (dup_of = the earlier doc 7)
    pd.DataFrame({"doc_id": [7], "text": [GOOD_A]}).to_parquet(src / "a.parquet")
    pd.DataFrame({"doc_id": [2], "text": [GOOD_A_DUP]}).to_parquet(
        src / "b.parquet"
    )
    _pin_file_order(src / "a.parquet", src / "b.parquet")
    q = (
        stream_minhash_neardup(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            num_hashes=8, bands=4, n=3,
        )
        .writeStream.format("memory")
        .queryName("sndup_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = (
        spark.table("sndup_late")
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
        .collect()
    )
    assert {r["doc_id"]: r["dup_of"] for r in out} == {2: 7}


def test_decontaminate_ngrams_catches_partial_leak(spark):
    from victorialogs_spark.datapipe.sampling import decontaminate_ngrams

    leak = "one two three four five six seven eight nine ten eleven twelve thirteen"
    train = spark.createDataFrame(
        [
            (1, f"prefix words {leak} suffix words"),  # embeds the 13-gram
            (2, GOOD_B),
            (3, None),  # NULL text must survive, not crash
        ],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame(
        [(9, f"benchmark prompt: {leak}")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate_ngrams(train, heldout, "text", n=13).collect()
    )
    # doc 1 shares the embedded 13-gram -> dropped; exact-fingerprint
    # decontamination would have MISSED it (texts differ)
    assert kept == [2, 3]


def test_decontaminate_ngrams_min_shared_threshold(spark):
    from victorialogs_spark.datapipe.sampling import decontaminate_ngrams

    t = "a b c d e f g h i j k l m n"
    train = spark.createDataFrame([(1, t)], "doc_id long, text string")
    heldout = spark.createDataFrame([(9, t)], "doc_id long, text string")
    # identical 14-token docs share exactly 2 distinct 13-grams
    kept2 = decontaminate_ngrams(train, heldout, "text", n=13, min_shared=3)
    assert [r["doc_id"] for r in kept2.collect()] == [1]
    kept1 = decontaminate_ngrams(train, heldout, "text", n=13, min_shared=2)
    assert kept1.collect() == []


def test_curate_ngram_decontamination_mode(spark):
    leak = "one two three four five six seven eight nine ten eleven twelve thirteen"
    docs = spark.createDataFrame(
        [(1, GOOD_A), (2, f"intro {leak} outro")], "doc_id long, text string"
    )
    heldout = spark.createDataFrame([(9, leak)], "doc_id long, text string")
    # exact mode misses the embedded leak; ngram mode catches it
    exact = curate_corpus(docs, "doc_id", "text", heldout=heldout)
    assert sorted(r["doc_id"] for r in exact.collect()) == [1, 2]
    ngram = curate_corpus(
        docs, "doc_id", "text", heldout=heldout, decontaminate_mode="ngram"
    )
    assert sorted(r["doc_id"] for r in ngram.collect()) == [1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_corpus(
            docs, "doc_id", "text", heldout=heldout, decontaminate_mode="bogus"
        ).collect()


def test_stream_neardup_representative_stays_stable(spark, tmp_path):
    """Three batches: 7, then near-dup 2 (smaller id, flagged dup_of=7),
    then 7 re-crawled. The stored representative must stay 7: flagging
    the re-arrival of the ORIGINAL as a dup of its own duplicate would
    leave the whole cluster flagged with no surviving representative
    (r14 review finding)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from victorialogs_spark.streaming.neardup import stream_minhash_neardup

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"doc_id": [7], "text": [GOOD_A]}).to_parquet(src / "a.parquet")
    pd.DataFrame({"doc_id": [2], "text": [GOOD_A_DUP]}).to_parquet(src / "b.parquet")
    pd.DataFrame({"doc_id": [7], "text": [GOOD_A]}).to_parquet(src / "c.parquet")
    _pin_file_order(src / "a.parquet", src / "b.parquet")
    import os
    import time as _t

    now = _t.time()
    os.utime(src / "c.parquet", (now + 2, now + 2))
    q = (
        stream_minhash_neardup(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            num_hashes=8, bands=4, n=3,
        )
        .writeStream.format("memory")
        .queryName("sndup_stable")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = (
        spark.table("sndup_stable")
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
        .collect()
    )
    # only 2 is flagged (dup of the stable representative 7); the
    # re-arrival of 7 itself is never emitted as a duplicate
    assert {r["doc_id"]: r["dup_of"] for r in out} == {2: 7}
