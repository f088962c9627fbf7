"""Dedup-family cross-checks that don't fit the SQL-oracle shape:
the banded (LSH-candidate) embedding near-dup vs its exact all-pairs
twin — precision must be perfect (every reported pair really clears the
cosine threshold) and recall is governed by the banding curve."""

from __future__ import annotations

from etl_ai_assistent_spark.queries.dedup import (
    COS_THRESHOLD,
    embedding_near_dup_allpairs,
    q_embedding_near_dup,
)


def test_banded_near_dup_subset_of_allpairs(spark, sf_small):
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_allpairs(spark, sf_small).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in q_embedding_near_dup(spark, sf_small).collect()
    }
    # perfect precision: every banded pair is a true pair with the exact
    # same verified cosine
    for pair, cos in banded.items():
        assert pair in exact, pair
        assert cos == exact[pair]
        assert cos >= COS_THRESHOLD
    # recall sanity: 16-bit/4-band SRP at cos>=0.35 has per-pair recall
    # 1-(1-p^4)^4 with p = 1 - acos(cos)/pi >= ~0.44; on the small
    # fixture the banded plan must recover a nontrivial share
    if exact:
        recall = len(banded) / len(exact)
        assert recall >= 0.25, f"recall collapsed: {recall:.2f}"
