"""Tests for the LLM-data-pipeline operators (datapipe/)."""

import pytest
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.dedup import (
    exact_dedup,
    hamming_near_dups,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash,
)
from victorialogs_spark.datapipe.multimodal import (
    assets_from_documents,
    decode_features,
    frame_sample_plan,
)
from victorialogs_spark.datapipe.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_scores,
    embedding_near_dup_pairs,
)
from victorialogs_spark.datapipe.text import (
    doc_fingerprints,
    quality_score,
    text_stats,
    with_lang_id,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The quick  brown fox jumps over the lazy dog"),  # dup after norm
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup
        (3, "completely different content about spark engines"),
        (4, "el gato y el perro que corren por la casa con los ninos"),
        (5, "!!! ??? ..."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").collect()
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_id[0] == 2  # doc 1 folds into doc 0 after normalization
    assert len(out) == 5


def test_ngram_jaccard_exact(spark, docs):
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.1)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 1)] == 1.0  # identical after normalization
    # docs 0 and 2 differ in the last word: 7 grams each, 6 shared
    assert pairs[(0, 2)] == pytest.approx(6 / 8)
    assert (0, 3) not in pairs


def test_minhash_lsh_near_dups(spark, docs):
    out = minhash_near_dups(docs, "doc_id", "text", threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out.collect()}
    assert pairs[(0, 1)] == 1.0  # byte-identical shingle sets
    assert (0, 2) in pairs  # near-dup caught by LSH
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_simhash_and_hamming(spark, docs):
    sh = simhash(docs, "doc_id", "text")
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert vals[0] == vals[1]  # same token multiset → identical simhash
    out = hamming_near_dups(sh, "doc_id", max_distance=16)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert pairs[(0, 1)] == 0


def test_text_stats_and_quality(spark, docs):
    st = {r["doc_id"]: r for r in text_stats(docs, "doc_id", "text").collect()}
    assert st[0]["n_tokens"] == 9
    assert st[5]["n_bpe_tokens"] == 9  # punctuation soup: 9 symbol tokens
    q = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    }
    assert q[0] > q[5]  # prose beats punctuation soup


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang_guess"] for r in with_lang_id(docs, "doc_id", "text").collect()}
    assert out[0] == "en"
    assert out[4] == "es"
    assert out[5] == ""


def test_doc_fingerprints_stability(spark):
    rows = [(0, "abcdefghijklmnopqrstuvwxyz 0123456789"),
            (1, "abcdefghijklmnopqrstuvwxyz 0123456789 APPENDED TAIL")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in doc_fingerprints(df, "doc_id", "text").collect()}
    assert out[0]["fp_full"] != out[1]["fp_full"]
    # rolling min-window fingerprint survives an append iff the min window
    # is in the shared prefix — check it is deterministic & hex
    assert len(out[0]["fp_rolling"]) == 32


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(3)]
    rows = []
    vid = 0
    for b in base:
        for _ in range(20):  # 20 noisy copies of each of 3 centroids
            rows.append((vid, [v + rng.gauss(0, 0.05) for v in b]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, vecs):
    q = [float(v) for v in vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    top = brute_force_topk(vecs, "vec_id", "embedding", q, k=5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cos"] == pytest.approx(1.0)
    assert all(r["vec_id"] < 20 for r in top)  # same cluster


def test_ann_topk_recall(spark, vecs):
    q = [float(v) for v in vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(vecs, "vec_id", "embedding", q, 5).collect()}
    approx = {r["vec_id"] for r in ann_topk(vecs, "vec_id", "embedding", q, 5, n_planes=6, probes=6).collect()}
    assert len(exact & approx) >= 3  # decent recall on clustered data


def test_embedding_near_dup_pairs(spark, vecs):
    out = embedding_near_dup_pairs(vecs, "vec_id", "embedding", dim=16, threshold=0.98)
    pairs = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert pairs  # noisy copies of a centroid are near-dups
    assert all(a // 20 == b // 20 for a, b in pairs)  # never across clusters


def test_cosine_scores_range(spark, vecs):
    q = [float(v) for v in vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    rows = cosine_scores(vecs, "vec_id", "embedding", q).collect()
    assert all(-1.001 <= r["cos"] <= 1.001 for r in rows)


def test_cosine_engines_agree(spark, vecs):
    q = [float(v) for v in vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    arrow = {
        r["vec_id"]: r["cos"]
        for r in cosine_scores(vecs, "vec_id", "embedding", q, engine="arrow").collect()
    }
    jvm = {
        r["vec_id"]: r["cos"]
        for r in cosine_scores(vecs, "vec_id", "embedding", q, engine="jvm").collect()
    }
    assert set(arrow) == set(jvm)
    for vid, c in arrow.items():
        assert c == pytest.approx(jvm[vid], abs=1e-9)


def test_multimodal_decode(spark):
    docs = spark.createDataFrame(
        [(0, "aaa", "s0"), (1, "bbbb", "s1"), (2, "ccccc", "s2")],
        "doc_id long, text string, source string",
    )
    assets = assets_from_documents(docs)
    feats = decode_features(assets)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert rows[0]["modality"] == "image" and rows[0]["width"] >= 64
    assert rows[1]["modality"] == "audio" and rows[1]["duration_ms"] >= 1000
    assert rows[0]["payload_bytes"] == 3
    assert len(rows[0]["feature"]) == 8
    # determinism: same payload → same hash/features on re-run
    again = {r["asset_id"]: r for r in decode_features(assets).collect()}
    assert again[0]["content_hash"] == rows[0]["content_hash"]
    with pytest.raises(NotImplementedError):
        decode_features(assets, decoder="pil")


def test_frame_sample_plan(spark):
    docs = spark.createDataFrame([(2, "vvv", "s")], "doc_id long, text string, source string")
    plan = frame_sample_plan(assets_from_documents(docs), every_ms=500)
    rows = plan.collect()
    assert rows and all(r["frame_ts_ms"] % 500 == 0 for r in rows)


def test_ivf_topk_recall(spark, vecs):
    from victorialogs_spark.datapipe.similarity import ivf_topk

    q = [float(v) for v in vecs.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(vecs, "vec_id", "embedding", q, 5).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(vecs, "vec_id", "embedding", q, 5, n_centroids=6, probes=2).collect()
    }
    # on clustered data the query's cell holds its whole cluster
    assert len(exact & approx) >= 4


def test_ivf_centroids_deterministic(spark, vecs):
    from victorialogs_spark.datapipe.similarity import train_ivf_centroids

    c1 = train_ivf_centroids(vecs, "embedding", n_centroids=4, seed=7)
    c2 = train_ivf_centroids(vecs, "embedding", n_centroids=4, seed=7)
    assert c1 == c2
