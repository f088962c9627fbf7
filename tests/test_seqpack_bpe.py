"""Sequence packing and BPE-training invariants.

q_sequence_pack: conservation laws a packing auditor relies on —
token totals survive the chop, every non-final window is exactly full,
doc start counts sum to the doc count.

q_bpe_train: the unrolled Spark loop against a pure-Python BPE
reference (same leftmost non-overlapping merge semantics) on the real
corpus slice — the merge schedule must match rank by rank.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from etl_ai_assistent_spark import io
from etl_ai_assistent_spark.functions import text as TX
from etl_ai_assistent_spark.queries.curation import SEQ_LEN, q_sequence_pack
from etl_ai_assistent_spark.queries.text_analysis import BPE_ITERS, q_bpe_train


def test_sequence_pack_conserves_tokens(spark, sf_small):
    docs = io.load_table(spark, sf_small, "documents")
    total = docs.select(
        F.sum(F.size(TX.tokens(F.lower(F.col("text"))))).alias("t")
    ).collect()[0]["t"]
    rows = q_sequence_pack(spark, sf_small).collect()
    assert sum(r["fill_tokens"] for r in rows) == total


def test_sequence_pack_windows_full_except_bucket_tails(spark, sf_small):
    rows = q_sequence_pack(spark, sf_small).collect()
    last_per_bucket = {}
    for r in rows:
        b = r["window_id"] // 100000
        last_per_bucket[b] = max(last_per_bucket.get(b, -1), r["window_id"])
    for r in rows:
        if r["window_id"] != last_per_bucket[r["window_id"] // 100000]:
            assert r["fill_tokens"] == SEQ_LEN, r
        # a window's docs are its starters plus at most one carry-in
        # (concatenation is gapless: only the doc covering the left
        # boundary enters without starting here)
        assert r["n_docs"] - r["n_starts"] in (0, 1), r


def test_sequence_pack_start_counts_sum_to_doc_count(spark, sf_small):
    docs = io.load_table(spark, sf_small, "documents")
    n_docs = docs.filter(
        F.size(TX.tokens(F.lower(F.col("text")))) > 0
    ).count()
    rows = q_sequence_pack(spark, sf_small).collect()
    assert sum(r["n_starts"] for r in rows) == n_docs


def _python_bpe(tokens: list[str], iters: int):
    """Reference BPE with the shared replace() semantics: leftmost
    non-overlapping, continue after the replacement."""
    spaced = [" " + " ".join(t) + " " for t in tokens if len(t) >= 2]
    schedule = []
    for _ in range(iters):
        counts: Counter[str] = Counter()
        for sp in spaced:
            arr = sp.strip().split(" ")
            for i in range(len(arr) - 1):
                counts[arr[i] + " " + arr[i + 1]] += 1
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        schedule.append((pair, n))
        merged = " " + pair.replace(" ", "") + " "
        spaced = [sp.replace(" " + pair + " ", merged) for sp in spaced]
    return schedule


def test_bpe_train_matches_python_reference(spark, sf_small):
    docs = io.load_table(spark, sf_small, "documents").select("text").collect()
    tokens = []
    for r in docs:
        t = r["text"].strip().lower()
        if t:
            tokens.extend(re.split(r"\s+", t))
    want = _python_bpe(tokens, BPE_ITERS)
    got = sorted(
        (r["rank"], r["pair"], r["n"]) for r in q_bpe_train(spark, sf_small).collect()
    )
    assert got == [(i + 1, p, n) for i, (p, n) in enumerate(want)]
