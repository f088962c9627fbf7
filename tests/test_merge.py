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


def test_snapshot_diff_roundtrip_laws(spark):
    """diff ∘ merge and merge ∘ diff are identities (for one-row-per-key
    full-row-image batches) — the contract that makes snapshot_diff a
    change-data-feed generator."""
    from pyspark.sql import functions as F

    from etl_ai_assistent_spark.operators.merge import (
        merge_apply,
        snapshot_diff,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k int, v string, m int",
    )
    changes = spark.createDataFrame(
        [
            (1, "U", "a2", 11),     # value change
            (3, "U", "c", 30),      # null -> value change (null-safe cmp)
            (4, "D", "d", 40),      # delete, full-row image
            (9, "I", "x", 90),      # insert
        ],
        "k int, op string, v string, m int",
    )
    merged = merge_apply(base, changes, key="k")

    # diff(v0, merge(v0, ch)) == ch
    diff = snapshot_diff(base, merged, key="k")
    assert {tuple(r) for r in diff.collect()} == {
        tuple(r) for r in changes.collect()
    }
    # merge(v0, diff(v0, v1)) == v1
    replayed = merge_apply(base, diff, key="k")
    assert replayed.exceptAll(merged).count() == 0
    assert merged.exceptAll(replayed).count() == 0
    # identical snapshots diff to empty
    assert snapshot_diff(base, base, key="k").count() == 0


def test_snapshot_diff_null_key_roundtrip(spark):
    """A null-key row present in both snapshots matches ITSELF
    (eqNullSafe join): unchanged → no diff rows; changed → one U, and
    merge(v0, diff(v0, v1)) == v1 still holds. Plain key equality used
    to emit a D+I pair that duplicated the row on replay (r6 ADVICE)."""
    from etl_ai_assistent_spark.operators.merge import (
        merge_apply,
        snapshot_diff,
    )

    v0 = spark.createDataFrame(
        [(1, "a", 10), (None, "nk", 99)], "k int, v string, m int"
    )
    # unchanged null-key row: diff must be empty
    assert snapshot_diff(v0, v0, key="k").count() == 0
    # changed null-key row: exactly one U, and the replay law holds
    v1 = spark.createDataFrame(
        [(1, "a", 10), (None, "nk2", 100)], "k int, v string, m int"
    )
    diff = snapshot_diff(v0, v1, key="k")
    assert [tuple(r) for r in diff.collect()] == [(None, "U", "nk2", 100)]
    replayed = merge_apply(v0, diff, key="k")
    assert replayed.exceptAll(v1).count() == 0
    assert v1.exceptAll(replayed).count() == 0


def test_snapshot_diff_rejects_schema_mismatch(spark):
    import pytest

    from etl_ai_assistent_spark.operators.merge import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="column mismatch"):
        snapshot_diff(a, b, key="k")
