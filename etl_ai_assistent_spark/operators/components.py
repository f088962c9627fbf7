"""Connected components over near-duplicate pair graphs (SURVEY.md §7
Step 4: 'dedup's connected components' — one of the few engine-owned
algorithms).

Near-dup detectors emit PAIRS; deduplication needs GROUPS (a transitive
closure: if A~B and B~C, one cluster {A,B,C}, one keeper). This is
iterative min-label propagation — the standard large-graph CC algorithm
(GraphFrames does the same under the hood) expressed as DataFrame joins
the driver loops over until fixpoint:

    label(v) <- min(label(v), min over neighbors u of label(u))

Each iteration is one equi-join + one aggregation on the edge list
(shuffle on vertex id); iterations needed = graph diameter (near-dup
clusters are shallow — copies of copies — so typically 2-4). State per
iteration is persisted and the previous one unpersisted: nothing grows
with iteration count. Convergence is detected by counting changed
labels (a cheap aggregate), not by comparing full snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in `pairs`, component = min node
    id reachable through the pair graph. Deterministic."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_min", F.col("component"))
                    < F.col("component")
                ).cast("int").alias("changed"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        old = labels
        labels = new_labels.drop("changed").persist(StorageLevel.MEMORY_AND_DISK)
        old.unpersist()
        new_labels.unpersist()
        if changed == 0:
            break
    edges.unpersist()
    return labels
