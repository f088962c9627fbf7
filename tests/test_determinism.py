"""Partition-invariance meta-test: queries documented as
"bit-deterministic on any partitioning" must return byte-identical
results when the shuffle width changes. This is the claim that lets a
result verified on local[32] stand for the same job on 1000 executors —
here it is executed, not asserted in prose: each query runs under a
narrow (3) and a wide (32) shuffle configuration and the canonicalized
rows are compared exactly."""

from __future__ import annotations

import pytest

from etl_ai_assistent_spark.registry import queries

# Queries whose docstrings claim partition-order independence through
# integer-exact or DECIMAL-exact arithmetic — one per family.
CLAIMED_INVARIANT = [
    "q_kmeans_step",  # integer-lattice Lloyd iteration
    "q_pq_adc_topk",  # PQ train/encode/score, all bigint
    "q_minhash_near_dup",  # md5-derived signatures + exact Jaccard
    "q_doc_surprisal",  # bitlength self-information sums
    "q_table_fingerprint",  # commutative aggregate checksum
    "q_pricing_summary",  # DECIMAL-exact aggregation
    "q_pagerank_nations",  # ppb fixed-point recurrence
    "q_rag_fusion",  # integer reciprocal-rank arithmetic over bigint BM25
    "q_cross_doc_spans",  # md5 span hashes + integer ppm
    "q_two_pass_median",  # integer cents, rank arithmetic
    "q_split_drift",  # exact bigint rational TVD
    "q_jaccard_prefix_join",  # md5 shingle order + integer ppm verify
    "q_sequence_pack",  # md5 bucketing + integer window offsets
    "q_kcore_prune",  # integer degrees, integer threshold
    "q_bpe_train",  # integer pair counts, deterministic argmax
    "q_attribution",  # DECIMAL cents + (ts, event_id)-ordered window
    "q_small_qty_revenue",  # half-up cents, cross-multiplied predicate
    "q_interval_union",  # integer epoch days, tie-immune island flags
    "q_benford_audit",  # integer ppm rationals over 9 digit groups
    "q_containment_join",  # md5 shingle order + integer ppm verify
    "q_l_diversity",  # stacked integer partial aggs, ppm shares
    "q_mmr_rerank",  # integer-ppm greedy argmax, item tie-breaks
    "q_grouped_median",  # integer cents, per-group rank arithmetic
    "q_urgent_backlog",  # half-up cents, integer top-10
    "q_discount_revenue",  # per-row floored cents before the sum
    "q_returned_revenue",  # half-up cents, integer top-20
    "q_linkage_score",  # integer FS weights, md5-keyed corruption
    "q_ivf_nprobe_sweep",  # round-6 scores, item/label tie-breaks
    "q_bpe_compression",  # integer symbol counts per merge stage
    "q_zipf_fit",  # bitlength logs, closed-form integer regression
    "q_heaps_fit",  # exact distinct counts, same integer regression
]


def _canon_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", CLAIMED_INVARIANT)
def test_result_identical_across_shuffle_widths(spark, sf_small, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    q = queries()[name]
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _canon_rows(q(spark, sf_small))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _canon_rows(q(spark, sf_small))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
    assert narrow == wide, f"{name} varies with shuffle width"
