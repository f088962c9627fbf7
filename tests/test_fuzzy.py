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


# --- banded Levenshtein join (PassJoin pigeonhole) ---------------------------


def _brute_lev(rows, k):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        d = lev(sa, sb)
        if d <= k:
            a, b = min(ia, ib), max(ia, ib)
            out.add((a, b, d))
    return out


def test_levenshtein_matches_brute_force_random(spark):
    """Exact equivalence to all-pairs DP Levenshtein on a random corpus
    that mixes substitutions AND indels (lengths 4-7, alphabet 3 —
    dense enough that near-pairs actually occur)."""
    from etl_ai_assistent_spark.operators.fuzzy import levenshtein_near_join

    rng = random.Random(13)
    rows = [
        (
            i,
            "".join(rng.choice("abc") for _ in range(rng.choice([4, 5, 6, 7]))),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    for k in (1, 2):
        got = {
            (r["a_id"], r["b_id"], r["dist"])
            for r in levenshtein_near_join(df, "id", "s", k=k).collect()
        }
        assert got == _brute_lev(rows, k), f"k={k}"


def test_levenshtein_catches_indel_twins(spark):
    """The case Hamming cannot express: a deleted character. The twin
    of every string (one char dropped) must pair at dist 1."""
    from etl_ai_assistent_spark.operators.fuzzy import levenshtein_near_join

    base = [(1, "wxyz"), (2, "pqrs")]
    twins = [(101, "wyz"), (102, "pqs")]
    df = spark.createDataFrame(base + twins, "id bigint, s string")
    got = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in levenshtein_near_join(df, "id", "s", k=1).collect()
    }
    assert got == {(1, 101, 1), (2, 102, 1)}


def test_levenshtein_no_cartesian_in_plan(spark):
    from etl_ai_assistent_spark.operators.fuzzy import levenshtein_near_join

    df = spark.createDataFrame(
        [(i, f"{i:04d}") for i in range(50)], "id bigint, s string"
    )
    plan = (
        levenshtein_near_join(df, "id", "s", k=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
