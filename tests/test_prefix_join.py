"""Prefix-filter exact Jaccard join: losslessness against brute force.

The theorem (any pair with Jaccard >= tau shares a prefix entry under a
global (df, gram) order) is exercised on corpora designed to stress it:
boilerplate shared by everyone (high-df grams must be prunable), exact
duplicates, disjoint docs, and a pair sitting exactly ON the threshold.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.dedup import jaccard_prefix_pairs


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(docs: list[tuple[int, str]], num: int, den: int):
    out = {}
    sh = {i: _shingles(t) for i, t in docs if _shingles(t)}
    for (ia, sa), (ib, sb) in combinations(sorted(sh.items()), 2):
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * den >= num * union:
            out[(ia, ib)] = 1_000_000 * inter // union
    return out


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (3, "completely different words entirely unrelated content here"),
    (4, "boilerplate header common to every document in this corpus"),
    (5, "boilerplate header common to every document in this corpus x"),
    (6, "alpha beta gamma delta epsilon zeta eta theta"),
    (7, "alpha beta gamma delta epsilon zeta eta iota"),  # on-threshold-ish
    (8, "one two"),  # too short for a 3-shingle: must drop silently
]


def test_lossless_vs_brute_force(spark):
    for num, den in ((1, 2), (7, 10), (9, 10)):
        docs = spark.createDataFrame(CORPUS, ["id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["jacc_ppm"]
            for r in jaccard_prefix_pairs(docs, num, den).collect()
        }
        assert got == _brute(CORPUS, num, den), f"tau={num}/{den}"


def test_exact_duplicates_hit_one_million_ppm(spark):
    docs = spark.createDataFrame(CORPUS, ["id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jacc_ppm"]
        for r in jaccard_prefix_pairs(docs, 9, 10).collect()
    }
    assert got[(0, 2)] == 1_000_000


def test_high_df_boilerplate_does_not_explode_candidates(spark):
    """50 docs sharing one boilerplate sentence plus a unique tail: at
    tau=0.8 no cross pair qualifies, and the rare-first prefix order
    must keep the result empty without an all-pairs comparison (the
    plan stays an equi-join; correctness checked here, plan shape by
    tests/test_plans.py on the registered query)."""
    rows = [
        (i, f"shared boilerplate prefix sentence here unique{i} tail{i} word{i} extra{i}")
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, ["id", "text"])
    assert jaccard_prefix_pairs(docs, 8, 10).count() == 0
    # the same corpus at a permissive threshold DOES pair up: every
    # cross pair shares 3 boilerplate shingles of 7 each (J = 3/11)
    assert jaccard_prefix_pairs(docs, 2, 10).count() == 50 * 49 // 2
