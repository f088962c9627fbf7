"""Pigeonhole-blocked fuzzy string matching (segment blocking).

The missing tier between exact dedup (operators/dedup.py hash equality)
and token-set similarity (MinHash/Jaccard): CHARACTER-level near-match,
the entity-resolution primitive for names/codes/IDs with typos.

Semantics here are Hamming distance over equal-length strings (pure
substitutions — the dominant error model for fixed-format identifiers).
The scale trick is the PassJoin-family pigeonhole block: split every
string into k+1 contiguous segments — two equal-length strings within
distance k MUST agree exactly on at least one segment (k substitutions
cannot touch all k+1 segments). So candidate generation is an EQUI-join
on (segment_index, segment_value, length) — never an all-pairs cross
join — followed by exact distance verification on the deduplicated
candidate pairs only. Same candidates-then-verify architecture as the
MinHash band join (operators/dedup.py:148) and SimHash byte-banding.

At 100 TB: candidate volume is Σ per-block n², governed by the
selectivity of the blocking key (segments of low-entropy prefixes
degrade — pick segment count ≥ k+1 so segments land on the varying
region, or pre-strip constant prefixes); verification is a narrow
zip-compare, whole-stage codegen, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming(a, b) -> "F.Column":
    """Exact Hamming distance between two equal-length string columns —
    positional char compares via sequence + aggregate (codegen, no
    UDF). Caller guarantees equal lengths (the join key includes
    length)."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(a)),
            lambda i: (a.substr(i, F.lit(1)) != b.substr(i, F.lit(1))).cast(
                "bigint"
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def segment_keys(df: DataFrame, id_col: str, s_col: str, k: int) -> DataFrame:
    """Explode each row into k+1 blocking keys: (id, s, seg_idx,
    seg_val, len). Segment boundaries are the canonical equal split
    (remainder spread over the leading segments) — both join sides use
    the same formula, so agreeing segments share identical spans."""
    n_seg = k + 1
    segs = F.transform(
        F.sequence(F.lit(0), F.lit(n_seg - 1)),
        lambda i: F.struct(
            i.alias("seg_idx"),
            F.col(s_col)
            .substr(
                (F.length(s_col) * i / n_seg).cast("int") + 1,
                ((F.length(s_col) * (i + 1) / n_seg).cast("int"))
                - (F.length(s_col) * i / n_seg).cast("int"),
            )
            .alias("seg_val"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.col(s_col),
        F.length(s_col).alias("len"),
        F.explode(segs).alias("seg"),
    ).select(id_col, s_col, "len", "seg.seg_idx", "seg.seg_val")


def hamming_near_join(
    df: DataFrame, id_col: str, s_col: str, k: int = 2
) -> DataFrame:
    """Self-join: pairs (a_id, b_id, dist) with a_id < b_id and
    Hamming(s_a, s_b) <= k over equal-length strings. Pigeonhole
    candidates on (seg_idx, seg_val, len), distinct pairs, exact
    verify."""
    a = segment_keys(df, id_col, s_col, k).select(
        F.col(id_col).alias("a_id"),
        F.col(s_col).alias("a_s"),
        "len",
        "seg_idx",
        "seg_val",
    )
    b = segment_keys(df, id_col, s_col, k).select(
        F.col(id_col).alias("b_id"),
        F.col(s_col).alias("b_s"),
        "len",
        "seg_idx",
        "seg_val",
    )
    cands = (
        a.join(b, ["len", "seg_idx", "seg_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_s", "b_s")
        .distinct()  # a pair may agree on several segments
    )
    return cands.select(
        "a_id",
        "b_id",
        hamming(F.col("a_s"), F.col("b_s")).alias("dist"),
    ).filter(F.col("dist") <= k)


# --- banded edit-distance (Levenshtein) join ---------------------------------
#
# The tier the Hamming pigeonhole can't cover: substitutions AND
# insertions/deletions (names with dropped characters, codes with a
# doubled digit). The reference declares the dependency for exactly
# this (`rapidfuzz` in pyproject.toml:22 — an edit-distance library,
# never imported); here it is the PassJoin banding (Li, Deng, Feng —
# PVLDB 2011): partition every string into k+1 contiguous segments; an
# alignment with <= k edit operations must leave at least one segment
# untouched, and that segment appears VERBATIM in the other string at
# a position shifted by at most the net indels before it (<= k). So
# candidate generation is an EQUI-join of the partitioned side's
# segments against the probe side's (length-adjusted, +-k-shifted)
# substrings — never an all-pairs cross join — and exact verification
# is Spark's built-in levenshtein() on the deduplicated candidates
# only (JVM expression, no UDF anywhere).
#
# Precondition: len(s) >= k+1 for every input string (shorter strings
# produce empty segments whose blocks degenerate to all-pairs; trivial
# short strings belong in a direct small-side pass). At 100 TB the
# candidate volume is governed by segment-block selectivity exactly
# like hamming_near_join — strip constant prefixes first.


def levenshtein_probe_keys(
    df: DataFrame, id_col: str, s_col: str, k: int
) -> DataFrame:
    """Probe side: for every candidate partner length l within +-k of
    this string's own length m, emit the substring that would sit at
    each of the k+1 canonical segment spans OF A LENGTH-l STRING,
    shifted by every d in [-k, k] — (id, s, l, seg_idx, seg_val). The
    (2k+1)^2 * (k+1) fan-out is a constant (18 keys at k=1), paid
    row-local before the equi-join."""
    n_seg = k + 1
    keys = F.expr(
        f"""
        flatten(transform(sequence(-{k}, {k}), dl ->
          flatten(transform(sequence(0, {k}), i ->
            transform(sequence(-{k}, {k}), d ->
              struct(
                i AS seg_idx,
                length({s_col}) + dl AS l,
                cast((length({s_col}) + dl) * i / {n_seg} AS int) + 1 + d
                  AS pos,
                cast((length({s_col}) + dl) * (i + 1) / {n_seg} AS int)
                  - cast((length({s_col}) + dl) * i / {n_seg} AS int)
                  AS slen))))))
        """
    )
    return (
        df.select(F.col(id_col), F.col(s_col), F.explode(keys).alias("kk"))
        .select(
            id_col,
            s_col,
            F.col("kk.seg_idx").alias("seg_idx"),
            F.col("kk.l").alias("l"),
            F.col("kk.pos").alias("pos"),
            F.col("kk.slen").alias("slen"),
        )
        .filter(
            (F.col("l") >= 1)
            & (F.col("slen") >= 1)
            & (F.col("pos") >= 1)
            & (F.col("pos") + F.col("slen") - 1 <= F.length(s_col))
        )
        .select(
            id_col,
            s_col,
            "seg_idx",
            "l",
            F.expr(f"substr({s_col}, pos, slen)").alias("seg_val"),
        )
        .distinct()  # overlapping (dl, d) windows can repeat a key
    )


def levenshtein_near_join(
    df: DataFrame, id_col: str, s_col: str, k: int = 1
) -> DataFrame:
    """Self-join: pairs (a_id, b_id, dist) with a_id < b_id and
    levenshtein(s_a, s_b) <= k. PassJoin pigeonhole candidates
    (partitioned segments ⋈ shifted probe substrings on
    (l, seg_idx, seg_val)), distinct ordered pairs, exact built-in
    levenshtein verification."""
    part = segment_keys(df, id_col, s_col, k).select(
        F.col(id_col).alias("p_id"),
        F.col(s_col).alias("p_s"),
        F.col("len").alias("l"),
        "seg_idx",
        "seg_val",
    ).filter(F.length("seg_val") >= 1)
    probe = levenshtein_probe_keys(df, id_col, s_col, k).select(
        F.col(id_col).alias("q_id"),
        F.col(s_col).alias("q_s"),
        "l",
        "seg_idx",
        "seg_val",
    )
    cands = (
        part.join(probe, ["l", "seg_idx", "seg_val"])
        .filter(F.col("p_id") != F.col("q_id"))
        .select(
            F.least("p_id", "q_id").alias("a_id"),
            F.greatest("p_id", "q_id").alias("b_id"),
            F.when(F.col("p_id") < F.col("q_id"), F.col("p_s"))
            .otherwise(F.col("q_s"))
            .alias("a_s"),
            F.when(F.col("p_id") < F.col("q_id"), F.col("q_s"))
            .otherwise(F.col("p_s"))
            .alias("b_s"),
        )
        .distinct()  # a pair may agree on several segments/windows
    )
    return cands.select(
        "a_id",
        "b_id",
        F.levenshtein(F.col("a_s"), F.col("b_s")).cast("bigint").alias("dist"),
    ).filter(F.col("dist") <= k)
