"""Evidence tests for degree-ordered triangle enumeration
(operators/triangles.py): correctness vs brute force on a skewed graph,
and the scale claim — degree orientation shrinks the wedge-candidate
volume that id-orientation explodes at hub nodes."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators import triangles as TR

HUB = 100  # hub node id sits BETWEEN its neighbors' ids (worst case below)
LOW_FANOUT = 60  # leaves 1..60 attach to the hub from below
HIGH_FANOUT = 60  # leaves 101..160 attach from above
RING_EDGES = 15  # low-leaf chain i — i+1 closes triangles {i, i+1, hub}


def _skewed_graph(spark):
    """Power-law-ish worst case for id ordering: the hub's id is mid-
    range, so canonical a<b orientation gives it BOTH high in-degree
    (low leaves point at it) and high out-degree (it points at high
    leaves) — the path-wedge join through the hub then enumerates
    in·out = 60·60 candidates. Degree orientation points every hub edge
    INTO the hub (leaves have degree ≤ 3), so its out-degree — and the
    hub wedge volume — drops to zero. spark.range keeps the generator
    distributed, the q_synthetic_source pattern."""
    low = spark.range(1, LOW_FANOUT + 1).select(
        F.col("id").alias("a"), F.lit(HUB).cast("bigint").alias("b")
    )
    high = spark.range(HUB + 1, HUB + HIGH_FANOUT + 1).select(
        F.lit(HUB).cast("bigint").alias("a"), F.col("id").alias("b")
    )
    ring = spark.range(1, RING_EDGES + 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    return low.unionAll(high).unionAll(ring)


def _edge_pairs(edges):
    return {(r["a"], r["b"]) for r in edges.collect()}


def _brute_triangles(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tris.add((x, y, z))
    return tris


def test_degree_oriented_counts_match_brute_force(spark):
    und = _skewed_graph(spark)
    tri = TR.triangles(TR.orient_by_degree(und))
    got = {tuple(sorted((r["x"], r["y"], r["z"]))) for r in tri.collect()}
    expect = _brute_triangles(_edge_pairs(und))
    assert got == expect and len(got) == RING_EDGES

    counts = {
        r["node"]: r["n_triangles"]
        for r in TR.per_node_counts(tri).collect()
    }
    brute_counts: dict[int, int] = {}
    for t in expect:
        for n in t:
            brute_counts[n] = brute_counts.get(n, 0) + 1
    assert counts == brute_counts
    assert counts[HUB] == RING_EDGES  # hub corners every ring triangle


def test_degree_orientation_shrinks_wedges(spark):
    """The scale claim behind q_triangle_count's formulation: id
    orientation funnels in·out = 60·60 wedge candidates through the
    mid-id hub; degree orientation collapses that to zero (every hub
    edge points in). Wedge volume IS the join work, so this is the
    per-task candidate-volume drop."""
    und = _skewed_graph(spark)

    id_oriented = und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    w_id = TR.wedges(id_oriented).count()
    w_deg = TR.wedges(TR.orient_by_degree(und)).count()

    assert w_id >= LOW_FANOUT * HIGH_FANOUT  # the hub in·out blowup
    assert w_deg * 10 < w_id, (w_deg, w_id)
    # both orientations still close the same triangles
    t_id = TR.triangles(id_oriented).count()
    t_deg = TR.triangles(TR.orient_by_degree(und)).count()
    assert t_id == t_deg == RING_EDGES
