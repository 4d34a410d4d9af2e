"""Connected-components duplicate clustering: correctness on known graph
shapes (chains exercise transitivity — the thing pair-level dedup misses),
plus end-to-end dedup_by_clusters semantics."""

import pytest
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.clusters import (
    connected_components,
    dedup_by_clusters,
    dup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _cc_dict(spark, edges, **kw):
    out = connected_components(_pairs(spark, edges), **kw).collect()
    return {r["node"]: r["component"] for r in out}


def test_cc_single_edge(spark):
    assert _cc_dict(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_cc_chain_transitive(spark):
    # a path 1-2-3-4-5: worst case for label propagation, log-rounds for
    # star alternation; 1~5 linked only transitively
    got = _cc_dict(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {i: 1 for i in range(1, 6)}


def test_cc_two_components_and_reversed_edges(spark):
    got = _cc_dict(spark, [(2, 1), (3, 2), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cc_long_chain_converges_in_log_rounds(spark):
    # driver_edge_cap=0 forces the distributed star-alternation path —
    # the driver union-find shortcut must not be the only tested engine
    n = 64
    got = _cc_dict(spark, [(i, i + 1) for i in range(1, n)], driver_edge_cap=0)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_cc_distributed_path_matches_driver_path(spark):
    edges = [(1, 2), (2, 3), (7, 9), (9, 8), (3, 7), (20, 21)]
    assert _cc_dict(spark, edges, driver_edge_cap=0) == _cc_dict(spark, edges)


def test_cc_star_and_duplicate_pairs(spark):
    got = _cc_dict(spark, [(5, 9), (5, 7), (5, 8), (9, 5), (5, 9)])
    assert got == {5: 5, 7: 5, 8: 5, 9: 5}


def test_cc_raw_overflow_distinct_reprobe(spark):
    # the raw CollectLimit probe overflows a cap of 3 (6 raw rows) but
    # the distinct re-probe fits (2 undirected edges) — the driver path
    # must still be taken and produce the exact components; same edges
    # through the distributed path (cap=0) agree
    edges = [(1, 2), (2, 1), (1, 2), (3, 4), (4, 3), (3, 4)]
    want = {1: 1, 2: 1, 3: 3, 4: 3}
    assert _cc_dict(spark, edges, driver_edge_cap=3) == want
    assert _cc_dict(spark, edges, driver_edge_cap=0) == want


def test_dup_clusters_backfills_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(docs, "doc_id", _pairs(spark, [(2, 4), (4, 6)])).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2}


def test_dedup_by_clusters_keeps_min_id_member(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_by_clusters(
            docs, "doc_id", _pairs(spark, [(2, 4), (4, 6), (1, 3)])
        ).collect()
    )
    # clusters {1,3}, {2,4,6}; singletons 5
    assert kept == [1, 2, 5]


def test_cc_empty_pairs(spark):
    assert _cc_dict(spark, []) == {}
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    got = dup_clusters(docs, "doc_id", _pairs(spark, [])).collect()
    assert [(r["doc_id"], r["cluster"]) for r in got] == [(1, 1)]
