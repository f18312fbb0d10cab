"""Property-based check of the connected-components kernel (hypothesis).

connected_components_min_label powers X21 (near-dup cluster assignment).
Contract: for ANY undirected edge list, every node appearing in the edges
is labeled with the minimum node id in its connected component — verified
against a straightforward union-find reference model on random graphs
(including path graphs, whose diameter stresses the propagation rounds).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scylladb_redpanda_cdc_spark.operators.llm import (
    connected_components_min_label,
)

_edge = st.tuples(
    st.integers(min_value=0, max_value=11),
    st.integers(min_value=0, max_value=11),
)


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    return {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_edge, min_size=1, max_size=16))
def test_cc_matches_union_find(spark, edges):
    expected = _union_find_labels(edges)
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(
        [(a, b) for a, b in sym], "doc_a long, doc_b long"
    ).distinct()
    got = {
        r["doc_a"]: r["cluster_id"]
        for r in connected_components_min_label(df).collect()
    }
    assert got == expected


def test_cc_path_graph_diameter(spark):
    """A 10-node path is the adversarial diameter for label propagation:
    the min label must walk the whole chain."""
    edges = [(i, i + 1) for i in range(9)]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "doc_a long, doc_b long")
    got = {
        r["doc_a"]: r["cluster_id"]
        for r in connected_components_min_label(df).collect()
    }
    assert got == {i: 0 for i in range(10)}
