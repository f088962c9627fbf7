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

Plan shape (r13): each round references its predecessor exactly ONCE.
The r12 version joined the alive set at BOTH edge endpoints per round,
which duplicates the entire upstream lineage per reference — the
analyzed plan grew exponentially in rounds (929 Exchange nodes / 5105
formatted-plan lines at 4 rounds; planning, not data, dominated the
query's wall clock, and persist() deduplicates execution, not
planning). The single-reference round is EXACT, not an approximation:

    alive_{i+1} = { v : deg_{alive_i}(v) >= k }

where deg_{alive_i}(v) counts edges (v, u) with u in alive_i — WITHOUT
restricting v to alive_i — equals the both-endpoints-restricted round,
because alive sets shrink monotonically: a node dropped in round j had
degree < k within alive_{j-1}, and its degree within any later
alive_i ⊆ alive_{j-1} can only be smaller, so the k-filter alone keeps
dead nodes dead. (Induction: alive_{i+1} ⊆ alive_i since v ∉ alive_i
implies deg_{alive_i}(v) < k.) Only the FINAL degree report needs the
explicit source-side restriction, because it is not k-filtered — and
there the restriction is a semi-join on the aggregated node-count-sized
output, not on the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def subgraph_degrees(sym: DataFrame, alive: DataFrame) -> DataFrame:
    """Per-node degree restricted to the alive set: (node, d). `sym`
    is the symmetric edge list (src, dst); `alive` has one `node`
    column. One edge-side equi-join on the dst endpoint, the
    partial-agg'd count, then the src-endpoint restriction as a
    SEMI-JOIN on the AGGREGATED (node-count sized) output — same rows
    as filtering both endpoints before the count, but the second join
    touches |nodes| rows instead of |edges| rows.

    r14: BOTH references to `alive` consume the SAME explicitly
    broadcast subtree (`bt`). Measured at sf0.1: with the dst join
    broadcast by AQE and the semi planned as sort-merge, the two
    alive references did NOT share a runtime exchange — AQE
    re-optimizes each query-stage subtree independently, the two
    copies diverged (broadcast vs shuffle), and the ENTIRE R-round
    pruning chain under `alive` executed twice (+24 AQE stages,
    +1.3 s warm — the r13 ADVICE double-execution risk, observed).
    One shared broadcast exchange canonicalizes identically at both
    references, so the chain materializes once (guide §2.4)."""
    t = alive.select(F.col("node").alias("_t"))
    bt = F.broadcast(t)
    deg = (
        sym.join(bt, F.col("dst") == F.col("_t"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    return deg.join(bt, F.col("node") == F.col("_t"), "left_semi")


def degree_prune(
    sym: DataFrame, nodes: DataFrame, k_df: DataFrame, iters: int
) -> DataFrame:
    """`iters` synchronous pruning rounds at threshold k (a 1-row
    DataFrame with column `k`, broadcast once onto the initial alive
    set so no driver-side action materializes it). Returns the
    surviving nodes with their final in-subgraph degree: (node, d).
    Rounds are single-reference (see module docstring), so the plan
    grows linearly with `iters` and nothing needs per-round
    persistence.

    r14: k THREADS THROUGH the alive rows instead of a per-round
    crossJoin(k_df). The r13 form re-joined the 1-row k table in every
    round; its own 14-stage subtree (two single-row counts over the
    edge substrate + the join) was re-materialized per round under
    AQE (measured: 47 AQE stages for 3 rounds at sf0.1). Attaching k
    to alive_0 once and carrying it with min(k) — every group's k
    values are copies of the same constant, so min(k) IS k — leaves
    one k reference total and one broadcast stage per round: measured
    2.37 → 1.05 s warm / 81 → 49 stages with bit-identical output.
    The per-round degree aggregation itself stays exchange-free when
    `sym` is cached hash-partitioned on src (the caller convention)."""
    alive = nodes.select("node").crossJoin(F.broadcast(k_df))
    for _ in range(iters):
        t = alive.select(F.col("node").alias("_t"), "k")
        bt = F.broadcast(t)
        deg = (
            sym.join(bt, F.col("dst") == F.col("_t"))
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.count("*").cast("bigint").alias("d"),
                F.min("k").alias("k"),
            )
        )
        alive = deg.filter(F.col("d") >= F.col("k")).select("node", "k")
    return subgraph_degrees(sym, alive.select("node"))
