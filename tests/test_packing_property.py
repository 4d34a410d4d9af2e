"""Property tests: the packing/shuffle layout invariants hold for
arbitrary corpora — every doc appears exactly once, per-shard positions
are dense, and the concatenate-then-cut layout reconstructs exactly from
(seq, seq_offset) regardless of costs, seeds, or partitioning."""

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from victorialogs_spark.datapipe.packing import pack_sequences, shuffle_shards

corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),  # doc id
        st.integers(min_value=0, max_value=5000),   # cost (0 allowed)
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpora, seed=st.integers(min_value=0, max_value=3),
       budget=st.sampled_from([1, 7, 100]))
def test_pack_sequences_layout_invariants(spark, rows, seed, budget):
    import hashlib

    df = spark.createDataFrame(rows, "doc_id long, cost long")
    out = pack_sequences(df, "doc_id", "cost", budget=budget, seed=seed).collect()
    # every doc exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)
    shards = defaultdict(list)
    for r in out:
        shards[r["shard"]].append(r)
    # replay in the operator's ACTUAL layout order — the md5 hash order —
    # not a (seq, seq_offset) tiebreak: zero-cost docs share offsets, and
    # an offset-based replay would misattribute their positions
    h = lambda i: hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
    for rs in shards.values():
        rs.sort(key=lambda r: (h(r["doc_id"]), r["doc_id"]))
        run = 0
        for r in rs:
            assert r["seq"] == run // budget
            assert r["seq_offset"] == run % budget
            run += r["cost"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpora, seed=st.integers(min_value=0, max_value=3))
def test_shuffle_shards_is_a_dense_permutation(spark, rows, seed):
    df = spark.createDataFrame(rows, "doc_id long, cost long")
    out = shuffle_shards(df, "doc_id", seed=seed).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _ in rows)
    per = defaultdict(list)
    for r in out:
        per[r["shard"]].append(r["shuffle_pos"])
    for pos in per.values():
        assert sorted(pos) == list(range(1, len(pos) + 1))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    payloads=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # DUPLICATE-heavy key
            st.integers(min_value=0, max_value=10**6), # distinguishing payload
        ),
        min_size=2,
        max_size=16,
    ),
    seed=st.integers(min_value=0, max_value=2),
)
def test_shuffle_shards_duplicate_keys_partition_independent(
    spark, payloads, seed
):
    """Closed r14 sixth-pass deferral: rows sharing a key must get the
    SAME position assignment under any input partitioning (content-hash
    tiebreak), so reruns/repartitions of a duplicate-key corpus agree."""
    df1 = spark.createDataFrame(payloads, "k long, v long").repartition(1)
    df7 = spark.createDataFrame(
        list(reversed(payloads)), "k long, v long"
    ).repartition(7)
    a = {
        (r["k"], r["v"], r["shard"], r["shuffle_pos"])
        for r in shuffle_shards(df1, "k", seed=seed).collect()
    }
    b = {
        (r["k"], r["v"], r["shard"], r["shuffle_pos"])
        for r in shuffle_shards(df7, "k", seed=seed).collect()
    }
    assert a == b
    # pack_sequences: same stability for the cumsum layout
    pa = {
        (r["k"], r["v"], r["seq"], r["seq_offset"])
        for r in pack_sequences(df1, "k", "v", budget=13, seed=seed).collect()
    }
    pb = {
        (r["k"], r["v"], r["seq"], r["seq_offset"])
        for r in pack_sequences(df7, "k", "v", budget=13, seed=seed).collect()
    }
    assert pa == pb
