"""Evidence for sorted compaction: disjoint per-file key ranges in the
parquet footers, and a key-range predicate pruning to a strict subset
of files via those stats (the zone-map skipping the rewrite buys)."""

from __future__ import annotations

from etl_ai_assistent_spark import io
from etl_ai_assistent_spark.operators.compaction import (
    compact_sorted,
    file_key_ranges,
    files_matching_range,
)

N_FILES = 8


def test_compact_sorted_disjoint_ranges_and_pruning(spark, sf_small, tmp_path):
    events = io.load_events(spark, sf_small).select("event_id", "ts_us", "value")
    out = str(tmp_path / "events_by_ts")
    compact_sorted(events, out, key="ts_us", n_files=N_FILES)

    ranges = file_key_ranges(out, "ts_us")
    assert len(ranges) == N_FILES
    # range partitioning => pairwise disjoint [min, max] intervals
    ordered = sorted(ranges, key=lambda r: r[1])
    for (_, _, prev_hi), (_, nxt_lo, _) in zip(ordered, ordered[1:]):
        assert prev_hi <= nxt_lo

    # a 1-day window intersects only a strict subset of files
    lo = min(r[1] for r in ranges)
    day_us = 86_400_000_000
    hit = files_matching_range(ranges, lo, lo + day_us)
    assert 0 < len(hit) < N_FILES, (len(hit), N_FILES)

    # the rewrite is lossless
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert back.selectExpr("sum(ts_us)").collect() == events.selectExpr(
        "sum(ts_us)"
    ).collect()

    # and Spark's own scan of the window reads fewer rows than the table
    n_window = back.filter(
        (back["ts_us"] >= lo) & (back["ts_us"] <= lo + day_us)
    ).count()
    assert 0 < n_window < back.count()
