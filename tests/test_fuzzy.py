"""Pigeonhole-blocked Hamming near-join (operators/fuzzy.py): exact
equivalence to brute force, segment tiling, and the no-cross-join plan
property. Oracle value parity is covered by q_fuzzy_match_names in
test_parity.py."""

from __future__ import annotations

import itertools
import random

from etl_ai_assistent_spark.operators.fuzzy import (
    hamming_near_join,
    segment_keys,
)


def _brute(rows, k):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if len(sa) != len(sb):
            continue
        d = sum(1 for x, y in zip(sa, sb) if x != y)
        if d <= k:
            a, b = min(ia, ib), max(ia, ib)
            out.add((a, b, d))
    return out


def test_matches_brute_force_random(spark):
    rng = random.Random(7)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.choice([5, 6]))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    for k in (1, 2):
        got = {
            (r["a_id"], r["b_id"], r["dist"])
            for r in hamming_near_join(df, "id", "s", k=k).collect()
        }
        assert got == _brute(rows, k), f"k={k}"


def test_segments_tile_the_string(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xyz")], "id bigint, s string"
    )
    segs = segment_keys(df, "id", "s", k=2).collect()
    by_id: dict = {}
    for r in segs:
        by_id.setdefault(r["id"], []).append((r["seg_idx"], r["seg_val"]))
    for _id, s in ((1, "abcdefghij"), (2, "xyz")):
        parts = [v for _, v in sorted(by_id[_id])]
        assert "".join(parts) == s  # exact tiling, no gaps/overlap
        assert len(parts) == 3  # k+1 segments


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"{i:04d}") for i in range(50)], "id bigint, s string"
    )
    plan = (
        hamming_near_join(df, "id", "s", k=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
