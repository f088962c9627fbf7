"""Vector similarity-search queries (SURVEY.md §2.5 Q1-Q3 + extensions).

The flagship is q_topk_cosine — the reference's retrieval query
(scripts/test.out.py:14-19: embed question -> top-5 cosine >= 0.5),
re-expressed as a single declarative plan: the "question embedding" is the
stored embedding of vec_id=0 (deterministic, no network — SURVEY.md §7
hard-part 5), joined in-plan (no collect) and scored with pure built-in
array expressions. `ORDER BY score LIMIT k` compiles to
TakeOrderedAndProject: per-partition top-k heaps, merge of k-row heads —
no global sort, 100 TB-safe.

DuckDB oracle parity: both engines widen FLOAT->DOUBLE (exact), multiply
elementwise, and fold left-to-right, so scores are bit-identical before
the final round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io
from ..functions import vector as V
from ..operators import similarity
from ..registry import register

# DuckDB fragment: dot(a, b) with the same DOUBLE left-to-right fold Spark
# uses in functions.vector.dot (zip_with + aggregate from 0.0).
_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _dot(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def _cosine(a: str, b: str) -> str:
    return (
        f"{_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}))"
    )


QUERY_VEC_ID = 0
TOP_K = 5
THRESHOLD = 0.5  # reference test.out.py:18


def _query_row(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("__qvec")
    )


@register(
    "q_topk_cosine",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, e.label,
         round({_cosine('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, score
FROM scored
WHERE score >= {THRESHOLD}
ORDER BY score DESC, vec_id
LIMIT {TOP_K}
""",
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+Q2+Q3: top-5 cosine retrieval with a 0.5 score threshold."""
    emb = io.load_table(spark, sf_dir, "embeddings")
    q = _query_row(emb)
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(V.cosine("embedding", "__qvec"), 6).alias("score"),
    )
    return (
        scored.filter(F.col("score") >= THRESHOLD)
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(TOP_K)
    )


N_QUERIES = 20
KNN_K = 3


@register(
    "q_knn_join",
    oracle=f"""
WITH queries AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT q.query_id, e.vec_id AS item_id,
         round({_cosine('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e CROSS JOIN queries q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, item_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, item_id) AS rank
  FROM pairs
)
SELECT query_id, item_id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {KNN_K}
""",
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force kNN join: top-3 neighbors for each of the first
    20 vectors. The query side is broadcast; scoring is map-side."""
    emb = io.load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = similarity.knn_join(emb, queries, k=KNN_K)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "q_ivf_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
pos AS (
  SELECT e.label, i AS pos, CAST(e.embedding[i] AS DOUBLE) AS x
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) AS t(i)
),
cent AS (
  SELECT label, list(cx ORDER BY pos) AS centroid
  FROM (SELECT label, pos, round(avg(x), 9) AS cx FROM pos GROUP BY label, pos)
  GROUP BY label
),
best AS (
  SELECT c.label
  FROM cent c CROSS JOIN q
  ORDER BY {_cosine('c.centroid', 'q.qv')} DESC, c.label
  LIMIT 1
),
scored AS (
  SELECT e.vec_id, e.label,
         round({_cosine('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e
  JOIN best b ON e.label = b.label
  CROSS JOIN q
)
SELECT vec_id, label, score
FROM scored
ORDER BY score DESC, vec_id
LIMIT {TOP_K}
""",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the nearest centroid's cluster only.

    At scale the embeddings table is partitioned by cluster id, so the
    semi-join prunes partitions instead of scanning the corpus.
    """
    emb = io.load_table(spark, sf_dir, "embeddings")
    q_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()[0]
    ]
    return similarity.ivf_topk(
        emb, q_vec, k=TOP_K, nprobe=1, threshold=-1.0
    )


@register(
    "q_pad_truncate",
    oracle="""
WITH sliced AS (
  SELECT vec_id, embedding[1:32] AS short_vec FROM embeddings WHERE vec_id < 50
),
padded AS (
  SELECT vec_id,
         list_concat(short_vec,
                     list_transform(generate_series(1, 64 - len(short_vec)),
                                    i -> CAST(0.0 AS FLOAT))) AS vec64
  FROM sliced
)
SELECT vec_id, CAST(len(vec64) AS INT) AS dim,
       round(list_reduce(list_transform(generate_series(1, len(vec64)),
             i -> CAST(vec64[i] AS DOUBLE)), (x, y) -> x + y), 6) AS checksum
FROM padded
""",
)
def q_pad_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 (embedder_service.py:6-9): pad with 0.0 / truncate to dim.

    Derives 32-dim variants by slicing, pads back to 64, and emits a
    deterministic checksum so the oracle verifies the padded values."""
    emb = io.load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    short = emb.select("vec_id", F.slice("embedding", 1, 32).alias("short_vec"))
    padded = short.select("vec_id", V.pad_truncate("short_vec", 64).alias("vec64"))
    return padded.select(
        "vec_id",
        F.size("vec64").alias("dim"),
        F.round(
            F.aggregate(V.as_double("vec64"), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("checksum"),
    )
