"""Evidence tests for product quantization: determinism across
partitionings, compression contract, and ADC recall far above random
against the exact integer-lattice ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark import io
from etl_ai_assistent_spark.operators import kmeans as KM
from etl_ai_assistent_spark.operators import pq as PQ

M, K, TOPK, DIM = 4, 8, 10, 64


def _vectors(spark, sf_small):
    return io.load_table(spark, sf_small, "embeddings").select(
        "vec_id", KM.quantize("embedding").alias("qv")
    )


def test_pq_encode_deterministic_and_compact(spark, sf_small):
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    codes = PQ.encode(v, books, dim=DIM)
    assert codes.columns == ["vec_id"] + [f"code_{i}" for i in range(M)]
    assert codes.count() == v.count()
    # codes bounded by the codebook size
    for i in range(M):
        mx = codes.agg(F.max(f"code_{i}")).collect()[0][0]
        assert 0 <= mx < K
    # same input repartitioned -> identical codes (integer-lattice PQ)
    codes2 = PQ.encode(v.repartition(7), books, dim=DIM)
    assert codes.exceptAll(codes2).count() == 0


def test_pq_adc_recall_beats_random(spark, sf_small):
    """ADC top-10 must recover far more of the EXACT integer-L2 top-10
    than chance. The testdata embeddings are isotropic noise (no cluster
    structure — see test_kmeans), the hardest case for PQ: measured
    recall@10 stabilizes around 0.2 here vs 0.02 for random ordering;
    on real embedding manifolds PQ recall runs far higher."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    codes = PQ.encode(v, books, dim=DIM)

    q = v.filter(F.col("vec_id") == 0).collect()[0]["qv"]
    tables = PQ.adc_table(list(q), books)
    approx = {
        r["vec_id"] for r in PQ.adc_topk(codes, tables, k=TOPK).collect()
    }

    qlit = F.array(*[F.lit(int(x)) for x in q])
    exact = {
        r["vec_id"]
        for r in v.select("vec_id", KM.dist2(F.col("qv"), qlit).alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(TOPK)
        .collect()
    }
    recall = len(approx & exact) / TOPK
    assert 0 in approx  # the query vector itself always survives PQ
    assert recall >= 0.2, recall  # 10x better than random


def test_pq_rejects_ragged_subspaces(spark, sf_small):
    import pytest

    v = _vectors(spark, sf_small)
    with pytest.raises(ValueError, match="not divisible"):
        PQ.subvectors(v, 7, DIM)


def test_multiquery_adc_matches_single_query_path(spark, sf_small):
    """probe_tables/adc_topk_multi (executor-built tables, stack unpivot,
    window top-k) must reproduce the single-probe adc_table/adc_topk
    map-literal path for every probe in the batch — same distances, same
    rank order, same ties."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    codes = PQ.encode(v, books, dim=DIM)

    nq = 3
    probes = v.filter(F.col("vec_id") < nq)
    multi = {
        (r["query_id"], r["rnk"]): (r["vec_id"], r["adc_dist"])
        for r in PQ.adc_topk_multi(
            codes, PQ.probe_tables(probes, books, dim=DIM), m=M, k=TOPK
        ).collect()
    }
    for qid in range(nq):
        q = probes.filter(F.col("vec_id") == qid).collect()[0]["qv"]
        single = PQ.adc_topk(codes, PQ.adc_table(list(q), books), k=TOPK)
        for rnk, r in enumerate(single.collect(), start=1):
            assert multi[(qid, rnk)] == (r["vec_id"], r["adc_dist"])
    # every probe got exactly k results
    assert len(multi) == nq * TOPK


def test_subvectors_truncates_wider_vectors_by_design(spark):
    """Pins the documented asymmetry: a vector WIDER than the declared
    dim is truncated to dim by F.slice (narrower fails loudly later).
    All production call sites pass the shared DIM constant; this test
    exists so any drift in that behavior is caught, per the
    operators/pq.py subvectors docstring."""
    v = spark.createDataFrame(
        [(0, list(range(12)))], "vec_id bigint, qv array<bigint>"
    )
    subs = PQ.subvectors(v, m=2, dim=8)  # declared 8, actual 12
    got = [r["qv"] for s in subs for r in s.collect()]
    assert got == [[0, 1, 2, 3], [4, 5, 6, 7]]  # elements 8..11 dropped


def test_probe_vector_matches_spark_quantize(spark, sf_small):
    """_probe_vector (DuckDB footer read + Python math.floor) must be
    bit-identical to KM.quantize of the same row — the invariant that
    let the index build drop its driver-side Spark first() probe
    (r6 verdict #6)."""
    from etl_ai_assistent_spark.queries.clustering import _probe_vector

    got = _probe_vector(sf_small)
    want = (
        io.load_table(spark, sf_small, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(KM.quantize("embedding").alias("qv"))
        .first()["qv"]
    )
    assert got == list(want)


def test_index_cache_evicts_other_sf_dirs(spark, sf_small):
    """_INDEX_CACHE is bounded (r6 verdict #7): touching a second
    sf_dir unpersists and drops the first one's index artifacts."""
    from etl_ai_assistent_spark.queries import clustering as C

    emb1, _, codes1, _, _ = C._pq_index(spark, sf_small)
    assert any(k[2] == sf_small for k in C._INDEX_CACHE)
    assert codes1.storageLevel.useMemory

    other = sf_small.replace("sf0.001", "sf0.01")
    C._pq_index(spark, other)
    assert not any(k[2] == sf_small for k in C._INDEX_CACHE)
    assert not codes1.storageLevel.useMemory  # storage released
    # moving back works and in turn evicts the other sf_dir
    C._pq_index(spark, sf_small)
    assert not any(k[2] == other for k in C._INDEX_CACHE)
