"""connected_components vs a naive union-find on random edge lists.

The DuckDB oracle for q_dedup_clusters only exercises the tiny dup graph
the fixture happens to produce; this pins the kernel itself on adversarial
shapes — long paths (worst-case round count), stars, disjoint cliques,
duplicate and reversed edges.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_mergetree_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


class UnionFind:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _expected(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {n: uf.find(n) for n in uf.p}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "u long, v long")
    out = connected_components(df)
    return {r.node: r.label for r in out.collect()}


# Examples are deliberately small: every round of the kernel is a Spark
# job, and a random graph's diameter bounds the round count.
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=10))
def test_components_match_union_find(spark, edges):
    assert _run(spark, edges) == _expected(edges)


def test_long_path_converges(spark):
    # an 8-node path — maximal diameter for its size, worst case for
    # per-round propagation; every node must still label to 0
    edges = [(i, i + 1) for i in range(7)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(8)}


def test_disjoint_cliques_keep_separate_labels(spark):
    edges = ([(a, b) for a in range(3) for b in range(a + 1, 3)]
             + [(a, b) for a in range(10, 13) for b in range(a + 1, 13)])
    got = _run(spark, edges)
    assert {got[n] for n in (0, 1, 2)} == {0}
    assert {got[n] for n in (10, 11, 12)} == {10}


# --- large-star/small-star kernel: same contract, O(log n) rounds -------

def _run_star(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "u long, v long")
    out = connected_components_star(df)
    return {r.node: r.label for r in out.collect()}


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=10))
def test_star_components_match_union_find(spark, edges):
    assert _run_star(spark, edges) == _expected(edges)


def test_star_equals_min_label_on_mixed_graph(spark):
    edges = ([(i, i + 1) for i in range(5)]           # path
             + [(20, 21), (21, 22), (22, 20)]          # triangle
             + [(30, 31), (30, 31), (31, 30), (40, 40)])  # dupes + self-loop
    assert _run_star(spark, edges) == _run(spark, edges)


def test_star_long_path_converges_in_log_rounds(spark):
    # a 100-node path: min-label propagation would need ~100 rounds;
    # the star kernel's round count is logarithmic, so this stays fast
    edges = [(i, i + 1) for i in range(99)]
    got = _run_star(spark, edges)
    assert got == {i: 0 for i in range(100)}
