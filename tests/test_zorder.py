"""Evidence tests for z-order clustering (operators/zorder.py): the
Morton value matches a bit-twiddling reference, and the layout's
multi-dimensional pruning beats a single-key sort where it must —
on predicates over the SECOND dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators import zorder as ZO
from etl_ai_assistent_spark.operators.compaction import (
    compact_fixed_width,
    partitioned_zone_maps,
)

SIDE = 64  # 64×64 grid → 4096 rows
N_FILES = 16


def _grid(spark):
    """Uniform 2-D grid: the geometry where layout quality is exactly
    measurable (every (a, b) in [0, SIDE)²)."""
    return spark.range(SIDE * SIDE).select(
        (F.col("id") % SIDE).cast("bigint").alias("a"),
        (F.col("id") / SIDE).cast("bigint").alias("b"),
    )


def _py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    rows = (
        _grid(spark)
        .select("a", "b", ZO.z_value("a", "b", bits=6).alias("z"))
        .collect()
    )
    for r in rows[:500]:
        assert r["z"] == _py_morton(r["a"], r["b"], 6)
    # Morton is a bijection on the grid
    assert len({r["z"] for r in rows}) == SIDE * SIDE


def _files_scanned(zones, lo, hi):
    return sum(1 for _, mn, mx, _ in zones if not (mx < lo or mn > hi))


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """A sort layout on `a` prunes perfectly on `a` and not at all on
    `b`; the z-order layout prunes a band predicate on EITHER dimension
    to a strict subset of files. This is the claim q_zorder_stats
    gate-checks; here it is measured against the 1-D layout."""
    g = _grid(spark)
    band = (SIDE // 4, SIDE // 2)  # the mid-band probe, ~25% of a dim

    sorted_dir = str(tmp_path / "sorted_a")
    # encode (a, b) into one sortable key so each file holds an a-range
    compact_fixed_width(
        g.withColumn("ab", F.col("a") * SIDE + F.col("b")),
        sorted_dir,
        key="ab",
        n_files=N_FILES,
    )
    z_dir = str(tmp_path / "zorder")
    ZO.write_zordered(g, z_dir, "a", "b", n_files=N_FILES, bits=6)

    # dimension b: the 1-D layout scans EVERYTHING, z-order prunes
    sorted_b = _files_scanned(partitioned_zone_maps(sorted_dir, "b"), *band)
    z_b = _files_scanned(partitioned_zone_maps(z_dir, "b"), *band)
    n_sorted = len(partitioned_zone_maps(sorted_dir, "b"))
    n_z = len(partitioned_zone_maps(z_dir, "b"))
    assert sorted_b == n_sorted  # 1-D sort: no pruning on b
    assert z_b <= n_z // 2, (z_b, n_z)  # z-order: at least half pruned

    # dimension a: z-order still prunes (need not beat the perfect sort)
    z_a = _files_scanned(partitioned_zone_maps(z_dir, "a"), *band)
    assert z_a < n_z

    # both layouts hold the same rows
    import pyspark.sql.functions as SF

    assert (
        spark.read.parquet(z_dir).select("a", "b").exceptAll(g).count() == 0
    )
    assert spark.read.parquet(z_dir).count() == SIDE * SIDE


def test_zorder_rejects_wide_bits_and_empty(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="bigint"):
        ZO.z_value("a", "b", bits=32)
    empty = _grid(spark).filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        ZO.write_zordered(empty, str(tmp_path / "e"), "a", "b", n_files=4)
