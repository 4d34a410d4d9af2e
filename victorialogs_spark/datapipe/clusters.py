"""Duplicate-cluster formation: connected components over near-dup pairs.

Pair generators (minhash_near_dups, ngram_jaccard_pairs, hamming_near_dups,
embedding_near_dup_pairs) emit edges; a real curation pipeline must then
GROUP transitively-linked documents into clusters and keep one
representative per cluster — A~B and B~C dedups all three even when A~C
was never emitted as a pair.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
O(log n)-round, skew-safe formulation for massive graphs:

- large-star: every node points its LARGER neighbors at its smallest
  known neighbor (or itself);
- small-star: every node points its smaller-or-equal neighbors at the
  minimum of that set.

Each round is two hash-shuffles (groupBy min + co-partitioned join) —
no collect_list of a hub's full neighborhood ever materializes on one
row, so a 10M-copy boilerplate cluster cannot blow an aggregation
buffer. Convergence in O(log n) rounds vs O(diameter) for naive label
propagation (a 1M-node chain converges in ~20 rounds, not 1M).

Spark-specific: each iteration localCheckpoints the edge set —
truncating lineage is MANDATORY for iterative DataFrame algorithms
(otherwise the plan doubles per round and Catalyst analysis time
explodes), and it materializes the round's result so the convergence
check and next round share one computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    """(u,v) ∪ (v,u) with self-loops and null endpoints dropped."""
    fwd = edges.select(F.col("u"), F.col("v"))
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return fwd.union(rev).where(F.col("u") != F.col("v")).where(
        F.col("u").isNotNull() & F.col("v").isNotNull()
    )


def _star_round(sym: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round over a symmetric edge list.

    Both stars share the shape: per node u, m = min(N(u) ∪ {u}); then
    large-star re-points strictly-larger neighbors at m, small-star
    re-points smaller-or-equal neighbors (plus u itself) at m. Computed
    as groupBy-min + join back on u: two shuffles on the same key (the
    join is co-partitioned with the aggregation output under AQE), and
    no per-node adjacency list is ever collected into a single row.
    """
    mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
    mins = mins.select("u", F.least(F.col("u"), F.col("minv")).alias("m"))
    j = sym.join(mins, "u")
    if large:
        out = j.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        # keep u's own link to m so singleton-after-filter nodes survive
        own = mins.select(F.col("u"), F.col("m").alias("v"))
        out = out.union(own)
    else:
        out = j.where(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        own = mins.select(F.col("u"), F.col("m").alias("v"))
        out = out.union(own)
    return out.where(F.col("u") != F.col("v")).distinct()


def _driver_union_find(edges) -> dict[int, int]:
    """Path-compressed union-find over an iterable of (u, v) int pairs."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        ra, rb = find(u), find(v)
        if ra != rb:
            # union by min so the representative is the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


_INT_DTYPES = ("tinyint", "smallint", "int", "bigint", "long")


def _require_integral_ids(df: DataFrame, cols: tuple[str, ...]) -> None:
    """Components mix ids across columns and cast them to long; a
    non-numeric id column would cast to NULL and silently dissolve every
    edge (dedup_by_clusters would then drop ALL rows) — fail loudly."""
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) not in _INT_DTYPES:
            raise TypeError(
                f"column {c!r} must be an integral id (got {dtypes.get(c)}); "
                "map string ids to longs (e.g. xxhash64 or a join table) first"
            )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    driver_edge_cap: int = 2_000_000,
) -> DataFrame:
    """Connected components of an undirected pair list.

    Output: (node, component) — component = MIN node id in the
    component, the conventional deterministic representative. Only nodes
    that appear in ``pairs`` are returned (callers union in singletons;
    see :func:`dup_clusters`).

    Hybrid execution, same pattern as Spark's own broadcast-join
    threshold: near-dup pair graphs are tiny relative to the corpus
    (a few duplicate edges per thousand docs), so when the UNDIRECTED
    edge count is ≤ ``driver_edge_cap`` (default 2M; a bounded
    CollectLimit pull via Arrow as two int64 columns — the u < v half
    only, ≈ 32 MB at the cap — raw first, with a distinct re-probe only
    if raw overflows the cap, since driver union-find tolerates
    duplicate edges) the components are solved with driver-side
    union-find in one pass — milliseconds instead of one Spark job per
    star round. Larger graphs take the distributed star path unchanged.

    The distributed path converges when the edge set reaches the star
    fixpoint (every node points directly at its component minimum):
    detected by the (count, xor-hash) signature of the round's edge set
    being identical to the previous round's — one cheap aggregate per
    round, no full edge-set comparison join. ``max_iter`` bounds the
    PRODUCTIVE rounds (log₂ of the largest component's size; 25 covers
    components of 2^25 ≈ 33M duplicates); one extra confirmation round
    runs on top, so a graph converging exactly at the bound still
    succeeds.
    """
    _require_integral_ids(pairs, (a_col, b_col))
    spark = pairs.sparkSession
    # normalize to u < v BEFORE the distinct: the dedup shuffle and the
    # checkpoint then carry each undirected edge ONCE, not the (u,v)/(v,u)
    # mirror pair — half the exchange volume and half the materialized
    # rows at any scale (r14 sf1 A/B: median 2.13 → 1.91 s on
    # dp_dup_clusters; the driver path below also skips the symmetrize
    # entirely, its union-find is direction-blind)
    edges = pairs.select(
        F.least(F.col(a_col), F.col(b_col)).cast("long").alias("u"),
        F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("v"),
    ).where(F.col("u") != F.col("v")).where(
        F.col("u").isNotNull() & F.col("v").isNotNull()
    )
    # ONE bounded action decides the path AND delivers the edges: collect
    # at most cap+1 rows (CollectLimit — never an unbounded pull); > cap
    # rows means the probe is discarded and the distributed path runs.
    # The previous shape (eager localCheckpoint + count + toPandas) was
    # three driver actions on what is almost always a tiny edge set —
    # the r15 sf1 attribution put the CC preamble at +0.52 s over pair
    # generation, mostly these round trips.
    #
    # The probe collects RAW (u < v) edges, not distinct ones: union-find
    # is duplicate-tolerant and the usual pair generators (grouped
    # aggregations) emit each pair once anyway, so skipping the distinct
    # removes a whole exchange from the common path (r15 A/B at sf0.1:
    # distinct+collect 0.67-0.79 s vs raw collect 0.59-0.72 s, identical
    # 256-edge result). Only when the raw count exceeds the cap — mirror
    # -duplicated caller input, or a genuinely big graph — does the
    # distinct probe run, preserving the exact path decision (raw <= cap
    # implies distinct <= cap; raw > cap with distinct <= cap re-probes).
    pdf = edges.limit(driver_edge_cap + 1).toPandas()
    if len(pdf) > driver_edge_cap:
        pdf = edges.distinct().limit(driver_edge_cap + 1).toPandas()
    if len(pdf) <= driver_edge_cap:
        comp = _driver_union_find(
            zip(pdf["u"].to_numpy().tolist(), pdf["v"].to_numpy().tolist())
        )
        if not comp:
            return spark.createDataFrame([], "node long, component long")
        return spark.createDataFrame(
            list(comp.items()), "node long, component long"
        )
    cur = edges.distinct().localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter + 1):
        stepped = _star_round(_symmetric(cur), large=True)
        stepped = _star_round(_symmetric(stepped), large=False)
        cur = stepped.localCheckpoint(eager=True)
        # bit_xor: order-independent edge-set digest with no ANSI
        # overflow hazard (sum of int64 hashes can exceed long range)
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixpoint edge set is a star forest: u -> component min. A node that
    # IS a component min appears only on the v side; union it back as its
    # own representative.
    nodes = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return (
        nodes.union(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Cluster assignment for EVERY row of ``df``: docs linked (directly
    or transitively) through ``pairs`` share a cluster id (= min doc id
    in the cluster); unpaired docs are their own singleton cluster.
    Output: (<id_col>, cluster). The pair side is usually tiny relative
    to the corpus (dup rate ≪ 100%), so the backfill join is an AQE
    broadcast at typical dup rates and a plain shuffle join worst-case.
    """
    _require_integral_ids(df, (id_col,))  # same silent-dissolve trap as pairs
    cc = connected_components(pairs, a_col, b_col)
    out = df.select(F.col(id_col)).join(
        cc.select(
            F.col("node").alias(id_col), F.col("component").alias("cluster")
        ),
        id_col,
        "left",
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("cluster"), F.col(id_col).cast("long")).alias("cluster"),
    )


def dedup_by_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Keep one representative row per duplicate cluster (the min-id
    member — deterministic). The transitive-closure form of
    exact_dedup: rows of ``df`` whose id equals their cluster id."""
    assign = dup_clusters(df, id_col, pairs, a_col, b_col)
    # representative = the min id PRESENT IN df per cluster, not the min
    # over the pair graph: pairs computed before an upstream filter can
    # reference ids df no longer has, and id==cluster then kept NO row
    # of that cluster — every copy of the duplicated content silently
    # deleted (r14 review finding). One tiny groupBy over the
    # assignment (cluster cardinality, not corpus cardinality).
    reps = assign.groupBy("cluster").agg(F.min(F.col(id_col)).alias(id_col))
    return df.join(reps.select(id_col), id_col, "left_semi")
