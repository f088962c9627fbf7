"""Evidence tests for incremental aggregate maintenance
(operators/incremental.py): delta application must equal a full
recompute over the merged snapshot on every CDC path — including the
group-move and upsert-fallthrough cases the TPC-H fixture batch never
exercises."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.incremental import incremental_group_sums
from etl_ai_assistent_spark.operators.merge import merge_apply


def _base(spark):
    rows = [
        (1, "a", 10),
        (2, "a", 20),
        (3, "b", 30),
        (4, "b", 40),
        (5, "c", 50),
    ]
    return spark.createDataFrame(rows, "k int, g string, m int")


def _agg(df):
    return df.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("m").cast("bigint").alias("sum_measure"),
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _check(spark, changes_rows):
    base = _base(spark)
    changes = spark.createDataFrame(
        changes_rows, "k int, op string, g string, m int"
    )
    maintained = incremental_group_sums(
        _agg(base), base, changes, key="k", group_col="g", measure_col="m"
    )
    recomputed = _agg(merge_apply(base, changes, key="k"))
    assert _rows(maintained) == _rows(recomputed)
    return _rows(maintained)


def test_plain_update_delete_insert(spark):
    got = _check(
        spark,
        [
            (1, "U", "a", 15),  # in-group update: sum moves, count doesn't
            (3, "D", "b", 30),  # delete retracts
            (6, "I", "c", 60),  # insert adds
        ],
    )
    assert got == {("a", 2, 35), ("b", 1, 40), ("c", 2, 110)}


def test_group_move_retracts_and_adds(spark):
    got = _check(spark, [(1, "U", "b", 11)])  # k=1 moves a -> b
    assert got == {("a", 1, 20), ("b", 3, 81), ("c", 1, 50)}


def test_group_emptied_disappears(spark):
    got = _check(spark, [(5, "D", "c", 50)])
    assert got == {("a", 2, 30), ("b", 2, 70)}


def test_upsert_fallthrough_and_noop_delete(spark):
    got = _check(
        spark,
        [
            (7, "U", "c", 70),  # U with no base row: insert (merge rule)
            (8, "D", "a", 99),  # D with no base row: no-op
        ],
    )
    assert got == {("a", 2, 30), ("b", 2, 70), ("c", 2, 120)}


def test_delta_join_empty_terms_fold_away(spark):
    """q_stream_delta_join's claim: calling the GENERAL delta_join with
    empty deltas costs nothing extra — Catalyst's empty-relation
    propagation erases the A⋈ΔB and ΔA⋈ΔB terms, leaving exactly ONE
    join (ΔA⋈B) in the optimized plan."""
    from pyspark.sql import functions as F

    from etl_ai_assistent_spark.operators.incremental import (
        delta_join,
        empty_delta,
    )

    a = empty_delta(spark, "k int, pa int")
    da = spark.createDataFrame([(1, 10, 1)], "k int, pa int, _w bigint")
    b = spark.createDataFrame([(1, 7)], "k int, pb int")
    db = empty_delta(spark, "k int, pb int, _w bigint")
    dv = delta_join(a, da, b, db, key="k")
    plan = dv._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1, plan
    assert [tuple(r) for r in dv.select("k", "pa", "pb", "_w").collect()] == [
        (1, 10, 7, 1)
    ]
    # and the trap the helper exists for: an RDD-backed empty DataFrame
    # is NOT visibly empty, so the rule cannot fire
    a_rdd = spark.createDataFrame([], "k int, pa int")
    db_rdd = spark.createDataFrame([], "k int, pb int, _w bigint")
    dv_rdd = delta_join(a_rdd, da, b, db_rdd, key="k")
    assert dv_rdd._jdf.queryExecution().optimizedPlan().toString().count("Join") == 3


def test_insert_only_fast_path_matches_general(spark):
    """insert_only=True must equal the general path on an append-only
    batch — the retraction join it skips matches nothing there, so
    skipping it is a pure plan change (r11 ADVICE: the general path's
    preserved-left-outer shape forces a full base scan per refresh)."""
    base = _base(spark)
    changes = spark.createDataFrame(
        [(6, "I", "c", 60), (7, "I", "d", 70), (8, "I", "a", 5)],
        "k int, op string, g string, m int",
    )
    general = incremental_group_sums(
        _agg(base), base, changes, key="k", group_col="g", measure_col="m"
    )
    fast = incremental_group_sums(
        _agg(base),
        None,
        changes,
        key="k",
        group_col="g",
        measure_col="m",
        insert_only=True,
    )
    assert _rows(fast) == _rows(general)
    assert _rows(fast) == {
        ("a", 3, 35),
        ("b", 2, 70),
        ("c", 2, 110),
        ("d", 1, 70),
    }


def test_insert_only_plan_has_no_retraction_join(spark):
    """The point of the fast path: ONE join in the whole plan (the
    full-outer merge onto the stored aggregate) — no batch⋈base
    retraction join, so no plan shape that could rescan history."""
    base = _base(spark)
    changes = spark.createDataFrame(
        [(6, "I", "c", 60)], "k int, op string, g string, m int"
    )
    fast = incremental_group_sums(
        _agg(base),
        None,
        changes,
        key="k",
        group_col="g",
        measure_col="m",
        insert_only=True,
    )
    plan = fast._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1, plan


def test_insert_only_requires_no_base(spark):
    import pytest as _pytest

    changes = spark.createDataFrame(
        [(6, "I", "c", 60)], "k int, op string, g string, m int"
    )
    with _pytest.raises(ValueError):
        incremental_group_sums(
            _agg(_base(spark)),
            None,
            changes,
            key="k",
            group_col="g",
            measure_col="m",
        )
