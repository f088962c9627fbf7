"""Fixed-point integer PageRank (iterative graph analytics; 100 TB
posture; sibling of operators/components.py connected components).

Classic PageRank is float-heavy and ORDER-SENSITIVE (sums of neighbor
contributions), which a bit-exact cross-engine gate can't tolerate.
This variant runs entirely in 64-bit integer fixed point (ranks in
parts-per-billion of total mass): contributions are ``rank div
out_degree`` and the damping update is ``base + (85 * sum) div 100`` —
every operation is integer, so the result is bit-identical on any
engine and any partitioning/summation order. The truncation each step
loses < 1 ppb per edge — irrelevant at ranking granularity and, unlike
float error, EXACTLY reproducible.

Distributed shape per iteration: one equi-join of the edge list against
the current rank vector (rank side is node-count sized — broadcastable
until the graph is billions of nodes) and one groupBy(dst) sum with
map-side partial aggregation. k iterations = k bounded shuffles; the
same shape GraphX/Pregel would schedule, expressed declaratively so AQE
still re-plans each step.

Dangling nodes (no out-edges) leak their mass — deterministic on both
engines, documented; self-loops are kept as ordinary edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # rank unit: ppb of total mass
D_NUM, D_DEN = 85, 100  # damping 0.85 as an integer ratio


def pagerank_int(
    edges: DataFrame, nodes: DataFrame, iterations: int = 5
) -> DataFrame:
    """(src, dst) distinct edges + (node) vertex set -> (node, rank_ppb)
    after `iterations` damped fixed-point rounds. `nodes.count()` is the
    one driver-side scalar (metadata-cheap); everything else is joins
    and partial-agg sums.

    Every iteration scans `edges` twice (contribution join + the degree
    table derived from it) and `nodes` once, so CALLERS with a non-
    trivial edge derivation must pass a cached/persisted edges plan —
    q_pagerank_nations routes its 4-way fact-table projection through
    the bounded per-sf substrate cache (clustering.cached_substrates),
    the same convention as the LPA and k-core callers. The r12 version
    persisted internally and needed an eager count() + unpersist pair
    per call (one extra driver job, and a pinned-entry leak when the
    caller's input was already cached); with the substrate convention
    the operator itself stays action-free and persistence-free. The
    rank chain references each previous round exactly once, so the
    plan grows linearly with `iterations`."""
    n = nodes.count()
    base = (15 * SCALE) // (100 * n)  # (1-d)/N in ppb, floor — mirrors the SQL
    deg = edges.groupBy("src").agg(
        F.count("*").cast("bigint").alias("out_deg")
    )
    ranks = nodes.select("node", F.lit(SCALE // n).cast("bigint").alias("r"))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div out_deg")).cast("bigint").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({D_NUM} * coalesce(contrib, 0)) div {D_DEN}"
                    )
                )
                .cast("bigint")
                .alias("r"),
            )
        )
    return ranks.withColumnRenamed("r", "rank_ppb")
