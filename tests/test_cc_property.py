"""Property test: connected_components equals a brute-force BFS closure
on arbitrary small graphs (self-loops, duplicate edges, reversed edges,
disconnected nodes — whatever hypothesis cooks up)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from victorialogs_spark.datapipe.clusters import connected_components


def _brute_components(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue  # engine drops self-loops; loop-only nodes vanish
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    seen: set[int] = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(comp)
        for x in comp:
            out[x] = root
    return out


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)), max_size=40
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cc_matches_bruteforce(spark, edges):
    pairs = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges] or [(None, None)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == _brute_components(edges)
