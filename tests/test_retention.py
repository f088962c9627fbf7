"""Evidence tests for snapshot retention/vacuum (operators/retention.py)
on throwaway version chains — the destructive path the registered
metadata query deliberately never takes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators import retention as RT


def _chain(spark, tmp_path, n_versions=4, torn=False):
    root = str(tmp_path / "table")
    os.makedirs(root, exist_ok=True)
    for v in range(n_versions):
        spark.range(100 + v).select(F.col("id")).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, f"snap_v{v}"))
    if torn:
        # a crash-torn, uncommitted write: directory without _SUCCESS
        torn_dir = os.path.join(root, f"snap_v{n_versions}")
        os.makedirs(torn_dir)
    return root


def test_versions_and_plan(spark, tmp_path):
    root = _chain(spark, tmp_path)
    versions = RT.snapshot_versions(root)
    assert versions == [(0, 100), (1, 101), (2, 102), (3, 103)]
    plan = RT.retention_plan(versions, keep_last=2)
    assert plan == [
        (0, 100, False),
        (1, 101, False),
        (2, 102, True),
        (3, 103, True),
    ]


def test_vacuum_deletes_only_dropped(spark, tmp_path):
    root = _chain(spark, tmp_path)
    deleted = RT.vacuum(root, keep_last=2)
    assert deleted == [0, 1]
    left = sorted(d for d in os.listdir(root) if d.startswith("snap_v"))
    assert left == ["snap_v2", "snap_v3"]
    # kept versions still readable (time travel)
    assert spark.read.parquet(os.path.join(root, "snap_v2")).count() == 102
    # idempotent: nothing more to delete
    assert RT.vacuum(root, keep_last=2) == []


def test_torn_write_is_invisible_and_unvacuumed(spark, tmp_path):
    root = _chain(spark, tmp_path, torn=True)
    versions = RT.snapshot_versions(root)
    assert [v for v, _ in versions] == [0, 1, 2, 3]  # torn v4 not listed
    RT.vacuum(root, keep_last=1)
    # the torn directory belongs to its replaying batch, never vacuum
    assert os.path.exists(os.path.join(root, "snap_v4"))


def test_live_snapshot_never_vacuumable():
    with pytest.raises(ValueError, match="keep_last"):
        RT.retention_plan([(0, 1)], keep_last=0)
    assert RT.retention_plan([], keep_last=2) == []
