"""Streaming exact-dedup tests: applyInPandasWithState keeps fingerprint
state across micro-batches (file-source stream, two availableNow runs over
one checkpoint)."""

import time


def _write_batch(spark, data_dir, rows, n):
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(1).write.mode(
        "append"
    ).parquet(data_dir)


def _run_available(spark, data_dir, ckpt):
    from victorialogs_spark.streaming.dedup import stream_exact_dedup

    stream = spark.readStream.schema("doc_id string, text string").parquet(data_dir)
    collected: list = []

    def _sink(batch_df, _bid):
        collected.extend(r.asDict() for r in batch_df.collect())

    q = (
        stream_exact_dedup(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_stream_dedup_within_and_across_batches(spark, tmp_path):
    data = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 'hello world' twice (different ids), one unique
    _write_batch(
        spark, data,
        [("d2", "hello  world"), ("d1", "Hello world"), ("d3", "unique doc")], 1,
    )
    rows1 = _run_available(spark, data, ckpt)
    assert len(rows1) == 2  # two distinct fingerprints
    hello = [r for r in rows1 if r["text"].lower().startswith("hello")][0]
    assert hello["doc_id"] == "d1"  # min id wins within the batch
    assert hello["n_copies"] == 2

    # batch 2: another 'hello world' copy (suppressed by cross-batch
    # state) + a brand-new doc (emitted)
    _write_batch(spark, data, [("d9", "hello world"), ("d4", "fresh doc")], 2)
    rows2 = _run_available(spark, data, ckpt)
    assert {r["text"] for r in rows2} == {"fresh doc"}  # duplicate suppressed
