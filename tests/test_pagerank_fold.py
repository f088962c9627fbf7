"""Fold-form ≡ distributed-form parity for the dimension-bounded graph
recurrences (r14 optimization): pagerank_fold vs pagerank_int and
label_propagation_fold vs label_propagation must agree bit-for-bit on
every (node, value) pair, for any graph within the fold's documented
precondition (edge endpoints ⊆ nodes — the closure contract both query
callers satisfy by construction: nation-key FKs on both endpoints).

Random graphs are generated with a FIXED seed (deterministic tests),
several shapes: dense, sparse, with isolated nodes, with dangling
nodes (no out-edges), self-loops, and single-direction edges (for
pagerank; LPA callers always pass symmetric edge sets but the operator
contract only needs directed rows)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.labelprop import (
    label_propagation,
    label_propagation_fold,
)
from etl_ai_assistent_spark.operators.pagerank import (
    pagerank_fold,
    pagerank_int,
)


def _graph(spark, n_nodes: int, edges: list[tuple[int, int]]):
    nodes = spark.range(0, n_nodes).select(F.col("id").alias("node"))
    if edges:
        e = spark.createDataFrame(edges, "src bigint, dst bigint")
    else:
        e = spark.range(0).select(
            F.col("id").alias("src"), F.col("id").alias("dst")
        )
    return e, nodes


def _rand_edges(rng, n_nodes: int, n_edges: int) -> list[tuple[int, int]]:
    seen = set()
    while len(seen) < n_edges:
        seen.add((rng.randrange(n_nodes), rng.randrange(n_nodes)))
    return sorted(seen)


def test_pagerank_fold_matches_int_random_graphs(spark):
    rng = random.Random(20260818)
    for n_nodes, n_edges in [(6, 12), (12, 40), (25, 200), (10, 3)]:
        edges, nodes = _graph(spark, n_nodes, _rand_edges(rng, n_nodes, n_edges))
        a = sorted(map(tuple, pagerank_int(edges, nodes, 4).collect()))
        b = sorted(map(tuple, pagerank_fold(edges, nodes, 4).collect()))
        assert a == b, f"pagerank fold/int divergence at n={n_nodes}"


def test_pagerank_fold_isolated_and_dangling(spark):
    # node 4 isolated (no edges at all); node 3 dangling (in-edges only
    # leak nothing; its own mass leaks — identical in both forms);
    # self-loop on 0
    edges, nodes = _graph(spark, 5, [(0, 0), (0, 1), (1, 2), (2, 3), (1, 3)])
    a = sorted(map(tuple, pagerank_int(edges, nodes, 5).collect()))
    b = sorted(map(tuple, pagerank_fold(edges, nodes, 5).collect()))
    assert a == b


def _sym(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    return sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})


def test_lpa_fold_matches_distributed_random_graphs(spark):
    rng = random.Random(20260818)
    for n_nodes, n_pairs in [(8, 10), (14, 30), (25, 120)]:
        pairs = [
            (a, b)
            for a, b in _rand_edges(rng, n_nodes, n_pairs)
            if a != b
        ]
        edges, nodes = _graph(spark, n_nodes, _sym(pairs))
        a = sorted(
            map(tuple, label_propagation(edges, nodes, 3).collect())
        )
        b = sorted(
            map(tuple, label_propagation_fold(edges, nodes, 3).collect())
        )
        assert a == b, f"LPA fold/distributed divergence at n={n_nodes}"


def test_lpa_fold_two_cliques_and_isolated(spark):
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]  # noqa: E731
    pairs = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    edges, nodes = _graph(spark, 14, _sym(pairs))
    out = {
        r["node"]: r["label"]
        for r in label_propagation_fold(edges, nodes, 4).collect()
    }
    assert len({out[n] for n in (0, 1, 2, 3)}) == 1
    assert len({out[n] for n in (10, 11, 12, 13)}) == 1
    for n in range(4, 10):  # isolated nodes keep their own label
        assert out[n] == n


def test_lpa_fold_packed_domain_guard_fires(spark):
    """The label < 2^20 guard must raise in the fold form too. (The
    count < 2^40 guard cannot fire in the fold: a vote count is bounded
    by the collected edge array's length, an int32.)"""
    import pytest

    big = 1 << 21
    edges = spark.createDataFrame(
        [(big, 0), (0, big)], "src bigint, dst bigint"
    )
    nodes = spark.createDataFrame([(0,), (big,)], "node bigint")
    with pytest.raises(Exception, match="packed-bigint"):
        label_propagation_fold(edges, nodes, 2).collect()


def test_connected_components_no_retention(spark):
    """r13 ADVICE (iterate.py begin() eviction): a connected_components
    result retained across a LATER connected_components call may lose
    its checkpoint blocks to generation eviction. The documented
    contract (operators/components.py) is never-silently-wrong:
    re-executing the retained result either reproduces the identical
    rows (blocks still cached) or fails loudly with a missing-
    checkpoint-block error — it must not return different rows."""
    from pyspark.sql import functions as F

    from etl_ai_assistent_spark.operators.components import (
        connected_components,
    )

    p1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    p2 = spark.createDataFrame(
        [(5, 6), (6, 7)], "id_a bigint, id_b bigint"
    )
    r1 = connected_components(p1)
    rows1 = sorted(map(tuple, r1.collect()))
    assert rows1  # consumed before the second call — the supported use
    r2 = connected_components(p2)
    assert sorted(map(tuple, r2.collect()))
    try:
        again = sorted(map(tuple, r1.collect()))
    except Exception:
        return  # loud failure: the documented outcome
    assert again == rows1, (
        "retained result re-executed to DIFFERENT rows after a later "
        "connected_components call — silent corruption, contract broken"
    )
