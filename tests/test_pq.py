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


def test_adc_table_rows_matches_adc_table(spark, sf_small):
    """The driver-side ADC table builder (adc_table_rows — used by the
    on-disk store adoption path, zero Spark jobs) is pinned to the
    collect-based adc_table: identical dicts for the same query vector
    and codebooks."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=1, dim=DIM)
    rows = [
        [(int(r["cid"]), [int(x) for x in r["cv"]]) for r in b.collect()]
        for b in books
    ]
    q0 = [int(x) for x in v.filter(F.col("vec_id") == 0).first()["qv"]]
    want = PQ.adc_table(q0, books)
    got = PQ.adc_table_rows(q0, rows)
    assert got == want


def test_ann_store_adopted_without_rebuild(spark, sf_small):
    """The on-disk ANN store (r9 verdict #1): artifacts exist after the
    first index use, and a 'fresh app' (cleared _INDEX_CACHE) re-serves
    by ADOPTING the files — no artifact is rewritten."""
    import os

    from etl_ai_assistent_spark.queries import clustering as C

    C._pq_index(spark, sf_small)
    path, n = C._ann_store_path(sf_small)
    for a in C.ANN_ARTIFACTS:
        assert os.path.exists(os.path.join(path, a, "_SUCCESS")), a
    assert C._ann_store_valid(path, n)
    marker = os.path.join(path, "codes", "_SUCCESS")
    mtime = os.path.getmtime(marker)

    C._INDEX_CACHE.clear()
    _, _, codes, tables, _ = C._pq_index(spark, sf_small)
    assert PQ.adc_topk(codes, tables, k=TOPK).count() == TOPK
    assert os.path.getmtime(marker) == mtime, "store was rebuilt"


def test_ann_store_damage_detected(spark, sf_small):
    """Adoption validation: a store whose codes are truncated (row
    count no longer covers the corpus) must fail _ann_store_valid."""
    from etl_ai_assistent_spark.queries import clustering as C

    C._pq_index(spark, sf_small)
    path, n = C._ann_store_path(sf_small)
    assert C._ann_store_valid(path, n)
    assert not C._ann_store_valid(path, n + 1)


def test_delta_encode_prunes_scan_and_matches_full_encode(spark, sf_small):
    """Incremental maintenance evidence (q_ann_delta_encode): the
    vec_id bound reaches the embeddings parquet scan as a pushed
    filter (maintenance reads O(|delta|), not the corpus), and the
    delta codes equal the corresponding slice of a full encode with
    the same codebooks."""
    from etl_ai_assistent_spark.queries import clustering as C

    df = C.q_ann_delta_encode(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(vec_id" in plan, (
        plan[:2000]
    )

    path, n = C._ann_store_path(sf_small)
    split = (n * 4) // 5
    full = C._read_artifact(spark, path, "codes").filter(
        F.col("vec_id") >= split
    )
    assert df.count() == n - split
    assert df.exceptAll(full).count() == 0
    assert full.exceptAll(df).count() == 0


def test_flat_probe_tables_match_per_subspace_path(spark, sf_small):
    """probe_tables_flat (single explode + one equi-join against the
    pre-merged codebook table) must produce the identical
    (query_id, subspace, cid, d) rows as probe_tables' M crossJoin
    branches — the serving-loop amortization (r11 verdict #6) is a
    pure plan change."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    probes = v.filter(F.col("vec_id") < 3)
    legacy = PQ.probe_tables(probes, books, dim=DIM)
    flat = PQ.probe_tables_flat(
        probes, PQ.codebook_table(books), m=M, dim=DIM
    ).select(*legacy.columns)
    assert flat.exceptAll(legacy).count() == 0
    assert legacy.exceptAll(flat).count() == 0


def test_melted_adc_matches_unmelted(spark, sf_small):
    """adc_topk_multi_melted over a pre-built melt must equal
    adc_topk_multi over raw codes — so caching the melt across
    streaming triggers cannot change served results."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    codes = PQ.encode(v, books, dim=DIM)
    probes = v.filter(F.col("vec_id") < 3)
    tables = PQ.probe_tables_flat(
        probes, PQ.codebook_table(books), m=M, dim=DIM
    )
    a = PQ.adc_topk_multi(codes, tables, m=M, k=TOPK)
    b = PQ.adc_topk_multi_melted(PQ.melt_codes(codes, M), tables, k=TOPK)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_encode_rows_matches_encode(spark, sf_small):
    """encode_rows (single-projection expression argmin over driver-
    resident codebook rows — zero exchanges) must be bit-equal to
    encode (broadcast crossJoin + packed-min shuffle per subspace +
    vec_id reassembly joins) on every partitioning, including the
    packed tie-break toward the lower centroid id."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    rows = [
        [(int(r["cid"]), [int(x) for x in r["cv"]]) for r in cb.collect()]
        for cb in books
    ]
    legacy = PQ.encode(v, books, dim=DIM)
    expr_form = PQ.encode_rows(v, rows, dim=DIM)
    assert legacy.exceptAll(expr_form).count() == 0
    assert expr_form.exceptAll(legacy).count() == 0
    expr_repart = PQ.encode_rows(v.repartition(5), rows, dim=DIM)
    assert legacy.exceptAll(expr_repart).count() == 0


def test_adc_maps_match_join_form(spark, sf_small):
    """adc_topk_multi_maps (per-probe lookup MAP, row-local M-term sum
    over un-melted codes) must equal adc_topk_multi (melt + broadcast
    equi-join + hash aggregate) — the r13 serving rewrite cannot change
    a single served row, rank, or distance."""
    v = _vectors(spark, sf_small)
    books = PQ.train_codebooks(v, m=M, k=K, iters=2, dim=DIM)
    codes = PQ.encode(v, books, dim=DIM)
    probes = v.filter(F.col("vec_id") < 3)
    tables = PQ.probe_tables_flat(
        probes, PQ.codebook_table(books), m=M, dim=DIM
    )
    a = PQ.adc_topk_multi(codes, tables, m=M, k=TOPK)
    b = PQ.adc_topk_multi_maps(
        codes, PQ.probe_lookup_maps(tables), m=M, k=TOPK
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_driver_built_probe_maps_match_executor_path(spark, sf_small):
    """r13 ADVICE: q_pq_multiquery_topk's driver-side probe path
    (_probe_vectors DuckDB read + adc_table_rows + the ADC_KEY_SPAN map
    fold) was only pinned component-wise. End-to-end pin: for the REAL
    serving batch (vec_id < NQ_PQ, the store's trained codebooks), the
    driver-built (query_id, tbl) map rows must equal
    probe_lookup_maps(probe_tables_flat(batch)) — the executor path the
    streaming serve loop uses."""
    from etl_ai_assistent_spark.queries.clustering import (
        DIM,
        M_SUB,
        NQ_PQ,
        _literal_codebooks,
        _pq_index,
        _probe_vectors,
    )

    _, cb_rows, _, _, _ = _pq_index(spark, sf_small)
    # driver path (exactly q_pq_multiquery_topk's build)
    entries = []
    for vid, qv in _probe_vectors(sf_small, NQ_PQ):
        tabs = PQ.adc_table_rows(qv, cb_rows)
        tbl = {
            i * PQ.ADC_KEY_SPAN + int(cid): int(d)
            for i, t in enumerate(tabs)
            for cid, d in t.items()
        }
        entries.append((vid, tbl))
    driver_rows = {
        vid: dict(sorted(tbl.items())) for vid, tbl in entries
    }
    # executor path (the streaming serve loop's per-trigger build)
    batch = (
        io.load_table(spark, sf_small, "embeddings")
        .filter(F.col("vec_id") < NQ_PQ)
        .select("vec_id", KM.quantize("embedding").alias("qv"))
    )
    cb_table = PQ.codebook_table(_literal_codebooks(spark, cb_rows))
    exec_maps = PQ.probe_lookup_maps(
        PQ.probe_tables_flat(batch, cb_table, m=M_SUB, dim=DIM)
    )
    exec_rows = {
        r["query_id"]: dict(sorted(r["tbl"].items()))
        for r in exec_maps.collect()
    }
    assert set(exec_rows) == set(driver_rows)
    assert exec_rows == driver_rows
