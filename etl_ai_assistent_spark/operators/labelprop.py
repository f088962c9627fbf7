"""Synchronous label-propagation community detection (LPA), made
deterministic.

Classic LPA is notoriously nondeterministic (random update order,
random tie-breaks). This variant is fully specified so any engine
replays it bit-for-bit — the same determinism discipline as
operators/pagerank.py and operators/kmeans.py:

- SYNCHRONOUS rounds: every node updates from the round-(t-1) labels.
- New label = the most frequent label among NEIGHBORS (the node's own
  label does not vote); ties break on the SMALLEST label.
- A node with no neighbors keeps its label.
- Initial label = node id. Fixed iteration count (fixed-point loops
  would need a convergence collect; the unrolled form keeps the
  oracle replayable — q_kmeans_step's one-step-then-induction
  pattern).

The argmax-with-min-tie-break is the packed-bigint idiom:
p = (MAXC − count) · PACK + label, then min(p) — strictly decreasing
in count, increasing in label, so min(p) picks (max count, min label).

Scale per round: one edges⋈labels equi-join (labels side is
|nodes|-rows — broadcastable for dimension-sized graphs, shuffled
otherwise) + one partial-agg'd (node, label) count + one packed min
per node. k bounded shuffles total, the Pregel shape without a graph
engine; lineage stays flat because nothing iterates data-dependently.

Reference parity: graph-family extension beyond the reference's scope
(§2.8); the verified-iteration pattern follows queries/graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LP_PACK = 1 << 20  # label < LP_PACK; count < LP_MAXC
LP_MAXC = 1 << 40


def label_propagation(
    edges: DataFrame, nodes: DataFrame, iterations: int = 3
) -> DataFrame:
    """edges: (src, dst) DIRECTED rows of an undirected graph (both
    orientations present, no self-loops); nodes: (node). Returns
    (node, label) after `iterations` synchronous rounds."""
    # Packed-bigint domain guards, enforced IN the plan (raise_error,
    # no extra driver action): a label >= LP_PACK or a vote count
    # >= LP_MAXC would silently truncate through `p % LP_PACK` —
    # corrupt results, not an error (r6 ADVICE). The guard runs on
    # every vote row at codegen speed and fails the job loudly instead.
    guarded_label = F.expr(
        f"CASE WHEN label >= {LP_PACK} THEN CAST(raise_error("
        f"'label_propagation: node id >= 2^20 overflows the packed-bigint"
        f" argmax; re-id nodes densely first') AS BIGINT) ELSE label END"
    )
    guarded_cnt = F.expr(
        f"CASE WHEN cnt >= {LP_MAXC}L THEN CAST(raise_error("
        f"'label_propagation: vote count >= 2^40 overflows the"
        f" packed-bigint argmax') AS BIGINT) ELSE cnt END"
    )
    # Single-reference rounds (r13): the r12 loop rebuilt labels as
    # labels LEFT JOIN winners + coalesce — referencing the previous
    # round's labels twice (vote join AND rebuild), which duplicates
    # the whole upstream lineage per reference and grows the analyzed
    # plan exponentially in rounds (118 Exchange nodes at 3 rounds;
    # planning dominated the wall clock — persist() deduplicates
    # execution, not planning). The coalesce fallback only ever fires
    # for ISOLATED nodes: the winner set each round is exactly the
    # nodes with >= 1 incoming edge (the vote join's src side always
    # covers every node), which is constant across rounds, and an
    # isolated node's label never changes from its initial node id. So
    # labels_{i+1} = winners_{i+1} ∪ isolated-initials — a disjoint
    # union computed from CONSTANT inputs, leaving exactly one
    # reference to labels_i per round. Bit-identical to the left-join
    # form; the plan grows linearly with `iterations`.
    labels = nodes.select("node", F.col("node").cast("bigint").alias("label"))
    isolated = (
        nodes.join(
            edges.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .select("node", F.col("node").cast("bigint").alias("label"))
    )
    for _ in range(iterations):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        packed = votes.groupBy("node").agg(
            F.min(
                (F.lit(LP_MAXC) - guarded_cnt) * F.lit(LP_PACK)
                + guarded_label
            ).alias("p")
        )
        winners = packed.select(
            "node", F.expr(f"p % {LP_PACK}").cast("bigint").alias("label")
        )
        labels = winners.unionByName(isolated)
    return labels
