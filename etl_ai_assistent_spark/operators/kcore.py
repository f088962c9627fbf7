"""Bounded-round k-core: iterated degree pruning over an undirected
graph given as a symmetric edge list. The reference has no graph
operators at all (SURVEY.md §2.6 extension family); this follows the
synchronous-rounds determinism pattern of operators/labelprop.py and
operators/pagerank.py — a fixed number of unrolled rounds, every one
engine-exact integer arithmetic, so a SQL oracle can replay the loop.

Each round drops every node whose degree WITHIN the surviving subgraph
is below k; round outputs are strict supersets of the true k-core and
monotone decreasing, so fixed-R output is well-defined whether or not
the fixpoint was reached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def subgraph_degrees(sym: DataFrame, alive: DataFrame) -> DataFrame:
    """Per-node degree restricted to the alive set: (node, d). `sym`
    is the symmetric edge list (src, dst); `alive` has one `node`
    column. Two equi-joins (the alive side only shrinks — AQE
    broadcasts it long before the edge set would fit) plus one
    partial-agg'd count."""
    s = alive.select(F.col("node").alias("_s"))
    t = alive.select(F.col("node").alias("_t"))
    return (
        sym.join(s, F.col("src") == F.col("_s"))
        .join(t, F.col("dst") == F.col("_t"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("bigint").alias("d"))
    )


def degree_prune(
    sym: DataFrame, nodes: DataFrame, k_df: DataFrame, iters: int
) -> DataFrame:
    """`iters` synchronous pruning rounds at threshold k (a 1-row
    DataFrame with column `k`, broadcast into each round's filter so
    no driver-side action materializes it). Returns the surviving
    nodes with their final in-subgraph degree: (node, d)."""
    alive = nodes.select("node").persist()
    for _ in range(iters):
        alive = (
            subgraph_degrees(sym, alive)
            .crossJoin(F.broadcast(k_df))
            .filter(F.col("d") >= F.col("k"))
            .select("node")
            .persist()  # feeds BOTH endpoint joins of the next round
        )
    return subgraph_degrees(sym, alive)
