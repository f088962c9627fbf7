"""Bounded-round k-core (operators/kcore.py) against hand-peeled graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.kcore import degree_prune, subgraph_degrees


def _graph(spark, undirected_edges):
    u = spark.createDataFrame(undirected_edges, ["a", "b"])
    sym = u.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        u.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    return sym, nodes


def _k(spark, k):
    return spark.createDataFrame([(k,)], ["k"]).select(
        F.col("k").cast("bigint").alias("k")
    )


def test_clique_with_tail_peels_to_clique(spark):
    # 4-clique {0,1,2,3} plus a path 3-4-5 hanging off it
    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    sym, nodes = _graph(spark, clique + [(3, 4), (4, 5)])
    got = {
        r["node"]: r["d"] for r in degree_prune(sym, nodes, _k(spark, 3), 3).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_cascade_needs_multiple_rounds(spark):
    # path 0-1-2-3-4: at k=2 the endpoints peel first, then the
    # cascade unzips inward one node per round — after 2 rounds only
    # the middle survives (degree then 0), after 3 rounds nothing.
    path = [(i, i + 1) for i in range(4)]
    sym, nodes = _graph(spark, path)
    after1 = degree_prune(sym, nodes, _k(spark, 2), 1)
    assert {r["node"] for r in after1.collect()} == {1, 2, 3}
    after3 = degree_prune(sym, nodes, _k(spark, 2), 3)
    assert after3.count() == 0


def test_fixed_rounds_are_supersets_of_true_core(spark):
    # two triangles sharing node 0, plus a pendant: the 2-core is both
    # triangles; every intermediate round must contain it
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0), (4, 5)]
    sym, nodes = _graph(spark, edges)
    core = {0, 1, 2, 3, 4}
    prev = None
    for iters in (1, 2, 3):
        alive = {
            r["node"] for r in degree_prune(sym, nodes, _k(spark, 2), iters).collect()
        }
        assert core <= alive
        if prev is not None:
            assert alive <= prev  # monotone decreasing
        prev = alive
    assert prev == core  # converged by round 3


def test_subgraph_degrees_restricts_both_endpoints(spark):
    sym, nodes = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    alive = spark.createDataFrame([(0,), (1,), (2,)], ["node"])
    got = {r["node"]: r["d"] for r in subgraph_degrees(sym, alive).collect()}
    # node 2's edge to dropped node 3 must not count
    assert got == {0: 2, 1: 2, 2: 2}
