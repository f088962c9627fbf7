"""Graph-analytics queries (iterative algorithms beyond the dedup
connected components in queries/dedup.py). The verified algorithm is
integer fixed-point PageRank (operators/pagerank.py) over the
nation-level trade graph; the oracle replays the identical integer
recurrence as unrolled CTEs, so every iteration is bit-checked, not
just the final ranking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import io
from ..operators.pagerank import SCALE, pagerank_int
from ..registry import register

PR_ITERS = 5

_PR_EDGES = """
edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
nodes AS (SELECT n_nationkey AS node FROM nation),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM edges GROUP BY 1),
r0 AS (
  SELECT node, CAST(1000000000 AS BIGINT) // (SELECT n FROM nn) AS r FROM nodes
)
"""


def _pr_iter_cte(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
r{i} AS (
  SELECT n.node,
         CAST((15 * CAST(1000000000 AS BIGINT)) // (100 * (SELECT n FROM nn))
              + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(p.r // d.out_deg) AS BIGINT) AS contrib
    FROM edges e
    JOIN {prev} p ON e.src = p.node
    JOIN deg d ON e.src = d.src
    GROUP BY 1
  ) c ON n.node = c.node
)"""


_PR_ORACLE = (
    "WITH "
    + _PR_EDGES
    + ","
    + ",".join(_pr_iter_cte(i) for i in range(1, PR_ITERS + 1))
    + f"""
SELECT nat.n_name, rk.r AS rank_ppb,
       CAST(row_number() OVER (ORDER BY rk.r DESC, nat.n_name) AS INT) AS pos
FROM r{PR_ITERS} rk JOIN nation nat ON rk.node = nat.n_nationkey
"""
)


@register("q_pagerank_nations", oracle=_PR_ORACLE)
def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph (edge src→dst = a customer
    in nation src bought from a supplier in nation dst), 5 damped
    iterations in 64-bit ppb fixed point — bit-identical to the oracle's
    unrolled integer CTEs because every step is integer division and
    integer sums (no float order sensitivity anywhere). Per iteration:
    one edges⋈ranks equi-join (rank side broadcastable) + one
    partial-agg'd groupBy(dst) — k bounded shuffles total, the Pregel
    shape without a graph engine."""
    li = io.load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = io.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = io.load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = io.load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = io.load_table(spark, sf_dir, "nation")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ranks = pagerank_int(edges, nodes, iterations=PR_ITERS)
    w_pos = F.row_number().over(Window.orderBy(F.desc("rank_ppb"), F.asc("n_name")))
    return (
        ranks.join(nation, ranks.node == nation.n_nationkey)
        .select("n_name", "rank_ppb")
        .withColumn("pos", w_pos.cast("int"))
    )


# --- triangle counting (clustering structure) ------------------------------


@register(
    "q_triangle_count",
    oracle="""
WITH dir_edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
u AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM dir_edges WHERE src <> dst
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM u e1
  JOIN u e2 ON e2.a = e1.b
  JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b
),
member AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM member GROUP BY 1
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected nation trade graph —
    the clustering-structure primitive (community density, spam/bot
    subgraph detection). Edges are DEGREE-ORDERED (operators/triangles:
    orient each edge toward its higher-(degree, id) endpoint) so each
    triangle is enumerated exactly once as a rank-ordered wedge plus the
    closing-edge check — the compact-forward formulation whose wedge
    work stays bounded on power-law graphs where id-order would make
    low-id hubs enumerate O(deg²) candidates
    (tests/test_triangles.py proves the drop on a synthetic skewed
    graph). The per-node counts are
    orientation-invariant, so the id-ordered DuckDB oracle still
    verifies values exactly."""
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    s = io.load_table(spark, sf_dir, "supplier")
    dir_edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
    )
    from ..operators import triangles as TR

    # u feeds the degree aggregate, both wedge sides, and the
    # closing-edge check; persisting it computes the 4-way fact-table
    # edge derivation ONCE instead of once per alias. The edge set
    # itself is node²-bounded (≤300 rows for 25 nations) — trivially
    # cacheable at any fact-table scale.
    u = (
        dir_edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    # the oriented set feeds three scans (both wedge sides + closing
    # edges) — persist it too, or each reference re-runs the degree
    # aggregate and its two joins
    oriented = TR.orient_by_degree(u).persist()
    return TR.per_node_counts(TR.triangles(oriented))
