"""Similarity search operators.

Q1 — the reference's one real query shape — is top-k cosine retrieval
with a score threshold (reference scripts/test.out.py:14-19: limit=5,
score_threshold=0.5, cosine per qdrant_service.py:21). The reference
delegates the search to Qdrant's HNSW; here the engine owns it:

- ``topk_cosine``     exact single-query top-k. filter + ORDER BY + LIMIT
                      compiles to TakeOrderedAndProject — a distributed
                      top-k (per-partition heap, then merge of k-sized
                      heads on the driver), NOT a full sort. This is the
                      100 TB-safe exact path: one scan, no shuffle of the
                      data, only k rows per partition move.
- ``knn_join``        exact all-pairs top-k for a (small) query set:
                      broadcast the queries, score every (query, item)
                      pair map-side, keep top-k per query with a window.
                      The big side never shuffles its payload — only
                      (query_id, score, item_id) triples go through the
                      rank shuffle.
- ``ivf_topk``        the scale path: IVF-style coarse quantization. A
                      cluster id per vector (testdata ships `label`; in
                      production KMeans or any partitioner), centroids =
                      per-cluster mean; probe the nearest `nprobe`
                      centroids and scan only those clusters. Turns a
                      full-corpus scan into a partition-pruned scan when
                      the table is written partitioned by cluster id.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def _score(vec_col: str, query: Sequence[float]) -> "F.Column":
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
    return V.cosine(F.col(vec_col), q)


def topk_cosine(
    items: DataFrame,
    query: Sequence[float],
    *,
    vec_col: str = "embedding",
    k: int = 5,
    threshold: float = 0.5,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine retrieval (Q1).

    Emits the item columns + `score`, highest first; ties broken by the
    first non-vector column for determinism.
    """
    score = _score(vec_col, query)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    other = [c for c in items.columns if c != vec_col]
    scored = items.withColumn("score", score).filter(F.col("score") >= threshold)
    return (
        scored.select(*other, "score")
        .orderBy(F.desc("score"), *other[:1])
        .limit(k)
    )


def knn_join(
    items: DataFrame,
    queries: DataFrame,
    *,
    item_vec: str = "embedding",
    query_vec: str = "embedding",
    item_id: str = "vec_id",
    query_id: str = "vec_id",
    k: int = 3,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Exact brute-force kNN join: top-k items per query row.

    The query side is broadcast (it is the small side by contract), so
    scoring is a map-side nested loop over each item partition; the only
    shuffle carries (query_id, item_id, score) for the per-query rank.
    """
    # norms computed once per row BEFORE the join (columns cross the join
    # materialized): dot/(ni*nq) folds one O(d) pass per pair instead of
    # three — identical doubles to the inline cosine, just hoisted
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qvec"),
        F.sqrt(V.dot(query_vec, query_vec)).alias("__qn"),
    )
    it = items.select(
        F.col(item_id).alias("item_id"),
        F.col(item_vec).alias("__ivec"),
        F.sqrt(V.dot(item_vec, item_vec)).alias("__in"),
    )
    score = V.dot(F.col("__ivec"), F.col("__qvec")) / (
        F.col("__in") * F.col("__qn")
    )
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    pairs = (
        it.crossJoin(F.broadcast(q))
        .withColumn("score", score)
        .filter(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("item_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "score", "rank")
    )


def centroids(items: DataFrame, *, vec_col: str = "embedding", cluster_col: str = "label") -> DataFrame:
    """Per-cluster mean vector via posexplode + positional average.

    Decimal-rounded so downstream comparisons are reproducible across
    aggregation orders (float sums are order-sensitive; see SURVEY.md §7
    hard-part 4).
    """
    return (
        items.select(cluster_col, F.posexplode(V.as_double(vec_col)).alias("pos", "x"))
        .groupBy(cluster_col, "pos")
        .agg(F.round(F.avg("x"), 9).alias("cx"))
        .groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("pairs"))
        .select(
            cluster_col,
            F.transform("pairs", lambda p: p["cx"]).alias("centroid"),
        )
    )


def ivf_topk(
    items: DataFrame,
    query: Sequence[float],
    *,
    vec_col: str = "embedding",
    cluster_col: str = "label",
    k: int = 5,
    nprobe: int = 1,
    threshold: float = -1.0,
    score_decimals: int | None = 6,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: probe the nprobe nearest centroids,
    exact-search only their clusters.

    At 100 TB the items table is written partitioned by cluster id, so the
    semi-join on cluster becomes partition pruning — the scan reads only
    nprobe/nlist of the data. Recall is tunable via nprobe. ``cents``
    lets the caller supply the (cached) centroid table — it is the IVF
    coarse index, an offline build artifact, not per-serve work.
    """
    if cents is None:
        cents = centroids(items, vec_col=vec_col, cluster_col=cluster_col)
    probed = (
        cents.withColumn("cscore", _score("centroid", query))
        .orderBy(F.desc("cscore"))
        .limit(nprobe)
        .select(cluster_col)
    )
    pruned = items.join(F.broadcast(probed), on=cluster_col, how="left_semi")
    return topk_cosine(
        pruned,
        query,
        vec_col=vec_col,
        k=k,
        threshold=threshold,
        score_decimals=score_decimals,
    )


# --- SRP-LSH (signed random projections) ---------------------------------

SRP_BITS = 16
SRP_BANDS = 4


def srp_signs(bits: int = SRP_BITS, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for cosine LSH: component
    (j, d) is ±1 from the parity of md5(f"{j}|{d}") — reproducible in
    any engine, here materialized as literals so signing costs zero
    hashes at run time."""
    import hashlib

    def sgn(j: int, d: int) -> float:
        h = int(hashlib.md5(f"{j}|{d}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 1 else -1.0

    return [[sgn(j, d) for d in range(dim)] for j in range(bits)]


def srp_bands(
    items: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = SRP_BITS,
    bands: int = SRP_BANDS,
    dim: int = 64,
) -> DataFrame:
    """(id, band_idx, band_val) LSH bucketing table for cosine: bit j is
    the sign of <v, h_j> (P[bits agree] = 1 - θ/π), grouped into `bands`
    sub-signatures. Equal band => candidate.

    The signing pass is an Arrow-batched pandas UDF doing the
    (rows × dim) · (dim × bits) product as `dim` vectorized
    accumulation steps IN INDEX ORDER — the identical left-to-right
    float64 fold the DuckDB oracle's list_reduce performs, so the signs
    are bit-exact across engines (a blas matmul or np.sum would
    re-associate the additions and could flip a near-zero sign). This
    replaced `bits` interpreted zip_with/aggregate fold expressions:
    ~dim × bits interpreted lambda evals per row became `dim` numpy
    axpy steps per Arrow batch (~2s → ~50ms on the sf0.1 signing).
    One narrow map, no shuffle, no runtime hashing."""
    from pyspark.sql import types as T

    signs = srp_signs(bits, dim)
    r = bits // bands
    smat = np.array(signs, dtype=np.float64).T  # (dim, bits)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _sign_bits(s: pd.Series) -> pd.Series:
        vecs = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in s], dtype=np.float64
        )
        acc = np.zeros((len(vecs), smat.shape[1]), dtype=np.float64)
        for d in range(smat.shape[0]):  # left-to-right fold, oracle order
            acc += vecs[:, d : d + 1] * smat[d]
        out = (acc >= 0).astype(np.int32)
        return pd.Series(list(out))

    from pyspark.storagelevel import StorageLevel

    # cache barrier: the banded table is self-joined (and CollapseProject
    # would otherwise duplicate the signing into every band expression —
    # same pattern as operators/dedup.minhash_bands)
    sig = items.select(
        F.col(id_col).alias("id"), _sign_bits(F.col(vec_col)).alias("bits")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    band_vals = F.array(
        *[
            sum(
                F.element_at(F.col("bits"), b * r + i + 1) * (1 << (r - 1 - i))
                for i in range(r)
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        "id", F.posexplode(band_vals).alias("band_idx", "band_val")
    )


def srp_topk(
    items: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    bits: int = SRP_BITS,
    bands: int = SRP_BANDS,
    dim: int = 64,
    score_decimals: int = 6,
    item_bands: DataFrame | None = None,
    query_bands: DataFrame | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k cosine: banded-signature equi-join
    generates candidates (never the full cross product), exact cosine
    verifies them, a per-query window keeps the top k. The approximate
    twin of knn_join — recall is governed by the banding curve.

    ``item_bands``/``query_bands`` let a caller supply a pre-built
    (cached) bucketing table — the signing pass over the corpus is an
    index build, not per-serve work (q_srp_topk routes it through the
    bounded per-sf substrate cache). Passing None keeps the inline
    build (per-row deterministic, so a cached table is value-identical
    by construction)."""
    ib = item_bands if item_bands is not None else srp_bands(
        items, vec_col=vec_col, id_col=id_col, bits=bits, bands=bands, dim=dim
    )
    qb = query_bands if query_bands is not None else srp_bands(
        queries, vec_col=vec_col, id_col=id_col, bits=bits, bands=bands, dim=dim
    )
    cands = (
        qb.withColumnRenamed("id", "query_id")
        .join(ib.withColumnRenamed("id", "item_id"), ["band_idx", "band_val"])
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    iv = items.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("iv"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        cands.join(iv, "item_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "item_id",
            F.round(V.cosine("iv", "qv"), score_decimals).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


# --- strategy chooser ----------------------------------------------------

ANN_EXACT_MAX_ROWS = 10_000_000


def ann_topk(
    items: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    exact_max_rows: int | None = None,
    score_decimals: int = 6,
) -> DataFrame:
    """The exact-vs-approximate chooser (SURVEY.md §4 'Top-k' row):
    plain Python planning logic, not a Catalyst rule. Small corpora get
    the exact brute-force knn_join (broadcast queries, map-side scoring,
    TakeOrderedAndProject-style rank); past `exact_max_rows` the SRP-LSH
    banded path takes over so the scored-pair volume stays bounded by
    the banding curve instead of |items| × |queries|.

    The row-count probe is a metadata-cheap `count()` on the id column —
    on parquet this is statistics-only, but it IS one Spark job per
    invocation. Callers invoking the chooser in a loop (per probe batch,
    per tuning sweep) should decide the strategy once and pin it by
    passing a bound that forces the branch they measured::

        n = corpus.count()                      # probe once, outside the loop
        for batch in probe_batches:
            ann_topk(corpus, batch, exact_max_rows=n + 1)   # always exact
            # or exact_max_rows=0 to always take the SRP-LSH path
    """
    limit = exact_max_rows if exact_max_rows is not None else ANN_EXACT_MAX_ROWS
    n = items.select(id_col).count()
    if n <= limit:
        out = knn_join(
            items,
            queries,
            item_vec=vec_col,
            query_vec=vec_col,
            item_id=id_col,
            query_id=id_col,
            k=k,
            score_decimals=score_decimals,
        )
        return out.withColumn("rank", F.col("rank").cast("int"))
    return srp_topk(
        items,
        queries,
        vec_col=vec_col,
        id_col=id_col,
        k=k,
        score_decimals=score_decimals,
    )
