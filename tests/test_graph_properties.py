"""Property tests for the graph operators against pure-Python models:
connected components (both the pointer-chasing and the
large-star/small-star O(log n) variants) vs union-find, and
triangle_count vs brute-force triple enumeration — ACROSS the density
gate, so both physical strategies (degree-ordered wedge join and the
adjacency bitmap) are exercised and must agree with the model on the
same random graphs."""

from __future__ import annotations

from itertools import combinations

import pytest

pytestmark = pytest.mark.slow

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv2db_spark.operators.graph import (
    connected_components,
    connected_components_star,
    triangle_count,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# small id space forces dense multi-edge graphs; self-loop-free pairs
_edges = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=30,
)


def _uf_components(edges):
    parent: dict[int, int] = {}

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
    return {n: find(n) for n in parent}


def _partition(labels: dict[int, int]) -> set[frozenset[int]]:
    groups: dict[int, set[int]] = {}
    for n, c in labels.items():
        groups.setdefault(c, set()).add(n)
    return {frozenset(g) for g in groups.values()}


@given(edges=_edges)
@settings(**_SETTINGS)
def test_connected_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    want = _partition(_uf_components(edges))
    got_pc = _partition(
        {r.node: r.component for r in connected_components(df).collect()}
    )
    got_star = _partition(
        {r.node: r.component for r in connected_components_star(df).collect()}
    )
    assert got_pc == want
    assert got_star == want


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    per_node: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                per_node[n] = per_node.get(n, 0) + 1
    return per_node


def _model_k_core(edges, k):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


@given(edges=_edges, k=st.sampled_from([2, 3]))
@settings(**_SETTINGS)
def test_k_core_fixpoint_matches_peeling_model(spark, edges, k):
    """Fixpoint-mode k_core vs an order-free Python peel: the k-core is
    unique (peeling is confluent), so any removal order must land on
    the same surviving (node, within-core degree) set — including the
    all-peeled empty core."""
    df = spark.createDataFrame(edges, "src long, dst long")
    from csv2db_spark.operators.graph import k_core

    got = {r.node: r.degree for r in k_core(df, k).collect()}
    assert got == _model_k_core(edges, k)


@given(edges=_edges)
@settings(**_SETTINGS)
def test_pagerank_step_matches_float_model(spark, edges):
    """One power-iteration vs a Python replay of the documented math:
    rank' = (1-d) + d * Σ rank_src/out_deg_src over INCOMING edges with
    multiplicity (duplicate edges each contribute), dangling nodes
    contributing nothing, in-degree-0 nodes at the (1-d) floor. The
    1e-9 tolerance absorbs the decimal(28,12) contribution quantization
    (bit-parity across engines is the oracle gates' job; the property
    pins the math)."""
    from csv2db_spark.operators.graph import pagerank_step

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_step(df).collect()}
    nodes = {n for e in edges for n in e}
    out_deg: dict[int, int] = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    in_sum: dict[int, float] = {}
    for s, d_ in edges:
        in_sum[d_] = in_sum.get(d_, 0.0) + 1.0 / out_deg[s]
    want = {n: 0.15 + 0.85 * in_sum.get(n, 0.0) for n in nodes}
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


# forests: node i (2..n) optionally points at a lower-numbered parent —
# acyclic and single-parent by construction, arbitrary depth/branching
_forest = st.lists(st.integers(0, 10), min_size=1, max_size=14).map(
    lambda picks: [
        (i + 2, (p % (i + 1)) + 1)
        for i, p in enumerate(picks)
        if p != 0  # 0 = this node joins as a root (no edge)
    ]
).filter(lambda es: es)


@given(edges=_forest)
@settings(**_SETTINGS)
def test_resolve_hierarchy_matches_pointer_walk(spark, edges):
    """Pointer-doubling root/depth vs a naive parent-at-a-time walk:
    log-rounds compression must land on the same (root, depth) for
    every node of the forest, at any depth the generator produces."""
    from csv2db_spark.operators.graph import resolve_hierarchy

    df = spark.createDataFrame(edges, "child long, parent long")
    got = {r.node: (r.root, r.depth) for r in resolve_hierarchy(df).collect()}
    parent = {c: p for c, p in edges}
    want = {}
    for n in {x for e in edges for x in e}:
        d, cur = 0, n
        while cur in parent:
            cur = parent[cur]
            d += 1
        want[n] = (cur, d)
    assert got == want


@given(edges=_edges, span_gate=st.sampled_from([0, 4096]))
@settings(**_SETTINGS)
def test_triangle_count_matches_brute_force_both_paths(
    spark, edges, span_gate
):
    """span_gate=0 forces the degree-ordered wedge path; 4096 lets the
    density gate decide (these 12-node graphs are dense enough to take
    the bitmap path whenever 16|E| >= span^2) — both must equal the
    brute-force triple scan."""
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.n_triangles
        for r in triangle_count(df, dense_node_span=span_gate).collect()
    }
    assert got == _brute_triangles(edges)
