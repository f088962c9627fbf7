"""Embedding-cluster queries (semantic clustering for corpus curation).

q_kmeans_step gates ONE full Lloyd iteration (init → assign → update →
re-assign) of the integer-lattice k-means (operators/kmeans.py) against
a DuckDB replay of the identical integer arithmetic — the verification
pattern for iterative algorithms: prove one step bit-exact, then the
loop (exercised by tests/test_kmeans.py) is induction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..operators import kmeans as KM
from ..registry import register

K = 8
DIM = 64

_QUANT = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {KM.Q_SCALE})"
    f" AS BIGINT) + {KM.Q_OFFSET})"
)
_D2 = (
    "CAST(list_sum(list_transform(generate_series(1, {dim}),"
    " i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS BIGINT)"
).format(dim=DIM)


@register(
    "q_kmeans_step",
    oracle=f"""
WITH q AS (
  SELECT vec_id, {_QUANT} AS qv FROM embeddings
),
c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cid, qv AS cv FROM q WHERE vec_id < {K}
),
d1 AS (
  SELECT v.vec_id, {_D2} * {KM.PACK} + c.cid AS p
  FROM q v, c0 c
),
a1 AS (
  SELECT vec_id, min(p) % {KM.PACK} AS cluster FROM d1 GROUP BY vec_id
),
dims AS (
  SELECT a.cluster, u.i AS dim, q.qv[u.i] AS val
  FROM a1 a JOIN q ON q.vec_id = a.vec_id,
       unnest(generate_series(1, {DIM})) u(i)
),
c1 AS (
  SELECT cluster AS cid,
         list(CAST(s // n AS BIGINT) ORDER BY dim) AS cv
  FROM (SELECT cluster, dim, CAST(sum(val) AS BIGINT) AS s,
               count(*) AS n
        FROM dims GROUP BY 1, 2)
  GROUP BY cluster
),
d2 AS (
  SELECT v.vec_id, {_D2} * {KM.PACK} + c.cid AS p
  FROM q v, c1 c
),
a2 AS (SELECT vec_id, min(p) AS p FROM d2 GROUP BY vec_id)
SELECT vec_id,
       CAST(p % {KM.PACK} AS BIGINT) AS cluster,
       CAST(p // {KM.PACK} AS BIGINT) AS dist
FROM a2
""",
)
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration of integer-lattice k-means over the
    embeddings table: id-ordered init (vec_id < {K}), packed-bigint
    nearest-centroid assignment (distance ties break on lower centroid
    id), exact integer centroid means, re-assignment. Everything is
    64-bit integer arithmetic, so the result is identical on any
    partitioning and any engine — the property that makes distributed
    clustering verifiable. Scale: assignment is a K-row broadcast plus
    one packed-min shuffle of N rows; the update shuffle is K·dim rows
    after map-side combine."""
    emb = io.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", KM.quantize("embedding").alias("qv")
    )
    c0 = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").cast("bigint").alias("cid"), F.col("qv").alias("cv")
    )
    a1 = KM.assign(emb, c0).select("vec_id", "cluster")
    c1 = KM.update(emb, a1)
    return KM.assign(emb, c1)
