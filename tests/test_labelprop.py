"""Deterministic LPA laws: known community structure on a two-clique
graph, isolated-node stability, and the min-tie-break spec."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.labelprop import label_propagation


def _sym(spark, undirected_pairs):
    rows = [(a, b) for a, b in undirected_pairs] + [
        (b, a) for a, b in undirected_pairs
    ]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_two_cliques_with_bridge(spark):
    # cliques {0,1,2,3} and {10,11,12,13}, one bridge 3-10
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = _sym(spark, clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)])
    nodes = spark.range(0, 14).select(F.col("id").alias("node"))
    out = {r["node"]: r["label"] for r in label_propagation(edges, nodes, 4).collect()}
    # each clique collapses to one label; min-tie-break drives it to the
    # smallest member id
    assert len({out[n] for n in (0, 1, 2, 3)}) == 1
    assert len({out[n] for n in (10, 11, 12, 13)}) == 1
    # isolated nodes (4..9) keep their own label
    for n in range(4, 10):
        assert out[n] == n


def test_partition_invariance(spark):
    edges = _sym(spark, [(0, 1), (1, 2), (2, 0), (5, 6)])
    nodes = spark.range(0, 7).select(F.col("id").alias("node"))
    a = sorted(map(tuple, label_propagation(edges.repartition(1), nodes, 3).collect()))
    b = sorted(map(tuple, label_propagation(edges.repartition(13), nodes, 3).collect()))
    assert a == b


def test_packed_domain_guard_fires(spark):
    """A node id >= 2^20 must raise loudly, not silently truncate
    through the packed-bigint argmax (r6 ADVICE). The guard lives in
    the plan (raise_error), so it costs nothing on valid graphs."""
    import pytest
    from py4j.protocol import Py4JJavaError

    big = 1 << 21
    edges = _sym(spark, [(0, big)])
    nodes = spark.createDataFrame(
        [(0,), (big,)], "node bigint"
    )
    with pytest.raises(Exception) as ei:
        label_propagation(edges, nodes, 1).collect()
    assert "packed-bigint" in str(ei.value)
