"""CDC MERGE operator semantics (operators/merge.py) — the edge cases
the q_cdc_merge oracle parity can't isolate: unmatched deletes, updates
to missing keys, column order, null-column updates."""

from __future__ import annotations

from etl_ai_assistent_spark.operators.merge import merge_apply

T_SCHEMA = "k bigint, a string, b double"
C_SCHEMA = "k bigint, op string, a string, b double"


def _merge(spark, target_rows, change_rows):
    t = spark.createDataFrame(target_rows, T_SCHEMA)
    c = spark.createDataFrame(change_rows, C_SCHEMA)
    out = merge_apply(t, c, key="k")
    assert out.columns == ["k", "a", "b"]  # target column order preserved
    return {r["k"]: (r["a"], r["b"]) for r in out.collect()}


def test_insert_update_delete(spark):
    got = _merge(
        spark,
        [(1, "one", 1.0), (2, "two", 2.0), (3, "three", 3.0)],
        [
            (2, "U", "TWO", 2.5),  # update
            (3, "D", None, None),  # delete
            (4, "I", "four", 4.0),  # insert
        ],
    )
    assert got == {1: ("one", 1.0), 2: ("TWO", 2.5), 4: ("four", 4.0)}


def test_unmatched_delete_is_noop(spark):
    got = _merge(spark, [(1, "one", 1.0)], [(99, "D", None, None)])
    assert got == {1: ("one", 1.0)}


def test_update_to_missing_key_inserts(spark):
    """An unmatched U behaves like an upsert (row appears) — the
    standard MERGE WHEN NOT MATCHED THEN INSERT fallthrough."""
    got = _merge(spark, [(1, "one", 1.0)], [(7, "U", "seven", 7.0)])
    assert got == {1: ("one", 1.0), 7: ("seven", 7.0)}


def test_update_is_full_row_image(spark):
    """CDC rows carry the FULL new row image: a null column in a U row
    really nulls the target column (not 'keep old value')."""
    got = _merge(spark, [(1, "one", 1.0)], [(1, "U", None, 9.0)])
    assert got == {1: (None, 9.0)}


def test_null_key_target_row_survives(spark):
    """Regression: a target row whose merge KEY is NULL never equi-joins
    a change row, so it must pass through untouched — the keep filter
    may only test the change op, never the target key."""
    got = _merge(
        spark,
        [(1, "one", 1.0), (None, "nullkey", 9.0)],
        [(2, "I", "two", 2.0), (99, "D", None, None)],
    )
    assert got == {1: ("one", 1.0), None: ("nullkey", 9.0), 2: ("two", 2.0)}
