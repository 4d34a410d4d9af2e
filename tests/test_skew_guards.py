"""Skew-guard behavior under degenerate duplicate mass — the 100 TB
hazard class: thousands of byte-identical documents (boilerplate, error
pages) landing in one LSH bucket / one gram posting list / one
connected component. The guards must keep candidate generation bounded
WITHOUT losing legitimate near-dup pairs elsewhere in the corpus."""

import pytest
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.clusters import dup_clusters
from victorialogs_spark.datapipe.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures_arrow,
    ngram_jaccard_pairs,
)

BOILER = "connection refused while contacting upstream service retry later"
A = "the quick brown fox jumps over the lazy dog near the riverbank today"
B = "the quick brown fox jumps over the lazy dog near the riverbank now"


def _corpus(spark, n_boiler=800):
    rows = [(i, BOILER) for i in range(n_boiler)]
    rows += [(10_000, A), (10_001, B)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_bucket_guard_bounds_degenerate_bucket(spark):
    docs = _corpus(spark)
    sigs = minhash_signatures_arrow(docs, "doc_id", "text", num_hashes=16)
    # without a guard the boilerplate bucket alone implies ~320k pairs;
    # with the guard the bucket is skipped but the legit near-dup pair
    # (A, B) still surfaces from its own small buckets
    pairs = lsh_candidate_pairs(
        sigs, "doc_id", bands=4, num_hashes=16, max_bucket_size=100
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (10_000, 10_001) in ids
    assert len(ids) == 1  # no pair explosion from the 800-doc bucket


def test_exact_dedup_owns_the_identical_mass(spark):
    # the guard's contract: byte-identical mass is exact_dedup's job —
    # one groupBy row per fingerprint, regardless of copy count
    out = exact_dedup(_corpus(spark), "doc_id", "text").collect()
    by_n = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_n[0] == 800  # min-id representative of the boilerplate


def test_stop_gram_guard_rejects_unknown_strategy(spark):
    # a typo like "Broadcast" must fail loudly — silently applying
    # NEITHER strategy would drop the stop-gram cap and return pairs the
    # caller asked to exclude
    docs = _corpus(spark, n_boiler=10)
    with pytest.raises(ValueError, match="guard must be"):
        ngram_jaccard_pairs(
            docs, "doc_id", "text", max_doc_freq=50, guard="Broadcast"
        )


def test_stop_gram_guard_keeps_rare_gram_pairs(spark):
    docs = _corpus(spark, n_boiler=300)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=50
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # boilerplate grams exceed doc-freq 50 -> dropped entirely; A/B share
    # rare grams below the cutoff and survive with high jaccard
    assert (10_000, 10_001) in ids
    assert all(a >= 10_000 for a, _ in ids)


def _collect_agg_output_rows(df) -> int:
    """Sum of numOutputRows over the collect_list ObjectHashAggregate
    nodes of an EXECUTED plan — the quantitative trace of how many gram
    rows reached the posting-array build (the SCALE.md metrics-reading
    method, walked through AQE query stages)."""
    total = 0

    def walk(n):
        nonlocal total
        name = n.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(n.executedPlan())
            return
        if "QueryStageExec" in name:
            walk(n.plan())
            return
        if name == "ObjectHashAggregateExec":
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total += kv._2().value()
        for i in range(n.children().size()):
            walk(n.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return total


@pytest.mark.parametrize("guard", ["broadcast", "window"])
def test_stop_gram_guard_runs_before_posting_array_build(spark, guard):
    """The 100 TB failure mode: a stop-gram present in every document
    must never reach collect_list — the frequency filter has to discard
    its rows BEFORE the posting array materializes, so the aggregation
    buffer stays O(rare grams) regardless of how many documents carry
    the stop-gram. Asserted two ways for BOTH guard strategies: plan
    shape (broadcast: a left_anti BroadcastHashJoin upstream of the
    window + array build, dropping stop-gram rows before ANY shuffle;
    window: the count filter strictly upstream of ObjectHashAggregate
    on a single shared gh exchange) and executed metrics (rows reaching
    the array build are FLAT when the stop-gram mass grows 50x)."""

    def run(n_boiler):
        rows = [
            (i, BOILER + f" req {i}") for i in range(n_boiler)
        ] + [(10_000_000, A), (10_000_001, B)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=50,
            guard=guard,
        )
        pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
        return out, pairs

    out_small, pairs_small = run(400)
    out_big, pairs_big = run(20_000)
    # correctness: the rare near-dup pair survives, no boiler pairs
    # leak, and BOTH strategies produce identical results
    assert pairs_small == pairs_big == {(10_000_000, 10_000_001)}
    # plan shape: the doc-frequency filter sits below the array build
    plan = (
        out_big._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    agg_pos = plan.index("ObjectHashAggregate")
    filt_pos = plan.index("__df")
    assert filt_pos > agg_pos  # deeper in the tree = executed earlier
    if guard == "window":
        # single-phase: window shares the posting build's gh exchange
        assert plan.count("Exchange hashpartitioning") <= 2
    else:
        # two-phase: the stop-gram blocklist applies MAP-SIDE via a
        # broadcast anti-join below the gh exchange (+1 exchange for
        # the count aggregation itself)
        anti_pos = plan.index("BroadcastHashJoin")
        assert "LeftAnti" in plan
        assert anti_pos > agg_pos  # anti-join upstream of the array build
        assert plan.count("Exchange hashpartitioning") <= 3
    # metrics: gram rows reaching collect_list are flat at 50x the mass
    small_rows = _collect_agg_output_rows(out_small)
    big_rows = _collect_agg_output_rows(out_big)
    assert big_rows == small_rows  # stop-gram mass never reaches the agg


def test_dup_clusters_giant_component_bounded(spark):
    # an 800-copy exact-dup star collapses to one cluster without any
    # quadratic pair materialization: star edges from the fingerprint
    # group representative, then components
    docs = _corpus(spark)
    fp = docs.select(
        F.col("doc_id"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp"),
    )
    mins = fp.groupBy("fp").agg(F.min("doc_id").alias("id_a"))
    edges = (
        fp.join(mins, "fp")
        .where(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )
    out = dup_clusters(docs, "doc_id", edges).collect()
    comp = {r["doc_id"]: r["cluster"] for r in out}
    assert all(comp[i] == 0 for i in range(800))
    assert comp[10_000] == 10_000 and comp[10_001] == 10_001


def test_minhash_md5_matches_hand_computation(spark):
    import hashlib

    from victorialogs_spark.datapipe.dedup import minhash_signatures_md5

    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    row = minhash_signatures_md5(df, "doc_id", "text", num_hashes=4).collect()[0]
    grams = ["a b c", "b c d", "c d e"]
    expected = [
        min(hashlib.md5(f"{j}:{g}".encode()).hexdigest() for g in grams)
        for j in range(4)
    ]
    assert row["sig"] == expected


def test_minhash_md5_near_dups_find_close_pair(spark):
    from victorialogs_spark.datapipe.dedup import minhash_near_dups_md5

    docs = spark.createDataFrame(
        [(1, A), (2, B), (3, "completely different text about gardens and rain")],
        "doc_id long, text string",
    )
    pairs = minhash_near_dups_md5(
        docs, "doc_id", "text", num_hashes=8, bands=4, threshold=0.3
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    assert not any(3 in p for p in ids)


def test_minhash_near_dups_bucket_guard(spark):
    """The verified-pairs variant gets the same mega-cluster guard as
    lsh_candidate_pairs: a near-identical template cluster (every member
    collides in EVERY band) is skipped at max_bucket_size while the
    legitimate near-dup pair elsewhere still verifies — and the guard
    default (None) leaves semantics untouched."""
    from victorialogs_spark.datapipe.dedup import minhash_near_dups

    # near-copies, not byte-identical: template + unique trailing token
    rows = [(i, f"{BOILER} uniq{i}") for i in range(300)]
    rows += [(10_000, A), (10_001, B)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # cap 50: the 300-member template spreads over per-band buckets of
    # ~98-234 docs (the unique trailing token deviates a band with prob
    # ~1-(6/7)^4), so every cluster bucket is above the cap
    guarded = minhash_near_dups(
        docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5,
        max_bucket_size=50,
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in guarded}
    assert (10_000, 10_001) in ids
    # no pair from the 300-doc template cluster survives the guard
    assert all(a >= 10_000 for a, _ in ids), sorted(ids)[:5]

    # unguarded on a SMALL cluster: the cluster pairs are all there
    small = spark.createDataFrame(rows[:20] + rows[-2:],
                                  "doc_id long, text string")
    unguarded = minhash_near_dups(
        small, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5,
    ).collect()
    cluster_pairs = {(r["id_a"], r["id_b"]) for r in unguarded
                     if r["id_a"] < 10_000 and r["id_b"] < 10_000}
    # LSH recall < 1 by design (a pair needs one FULLY matching band;
    # the unique trailing token deviates each band with prob
    # ~1-(6/7)^4) — the point is the mass is present unguarded
    assert len(cluster_pairs) >= 100
