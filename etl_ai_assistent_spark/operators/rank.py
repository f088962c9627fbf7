"""Distributed exact global ranking — no single-partition sort.

A `Window.orderBy(...)` with no partitionBy funnels the WHOLE input
through one `Exchange SinglePartition` — the one plan shape that cannot
survive a 100× scale-up (the q_vocab_encode lesson, now enforced by the
plan lint in tests/test_plans.py). But exact global row numbers — and
the exact SQL `ntile()` built on them — don't need a global sort. This
module computes them with the two-pass histogram pattern
(q_two_pass_median generalized):

  1. bucket every row by a coarse, ORDER-PRESERVING integer division of
     the sort key. The bucket domain is bounded by the KEY RANGE (value
     span / bucket width), not by the row count — constant in SF;
  2. aggregate per-bucket counts (map-side combinable) and take a
     running sum over the BOUNDED histogram — the only unpartitioned
     window left touches ≤ a few thousand rows at any scale;
  3. broadcast the (bucket → rows-before, total) table back onto the
     data and add a row_number PARTITIONED by bucket — a parallel sort
     of each bucket's slice.

global row number = rows_before(bucket) + rank_within(bucket): exact,
deterministic (the caller supplies a unique tie-break key), and every
data-sized operation is hash-partitioned. Truncating integer division
is monotone, so bucket boundaries never interleave sort keys.

`ntile_on` reproduces SQL ntile semantics EXACTLY from (rn, total):
q = N div n, r = N mod n, the first r tiles get q+1 rows — the
front-loaded distribution every engine implements (floor((rn-1)·n/N)+1
spreads remainders evenly and is NOT the same assignment).

Reference shape: the reference has no ranking at all (its retrieval cap
is a client-side `limit`, scripts/services/qdrant_service.py:44-57);
this operator exists for the §2.6 window-function surface at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The whole pattern rests on the histogram staying ORDERS OF MAGNITUDE
# smaller than the data (its running sum is the one unpartitioned window
# left). bucket_div values are chosen from key-range stats, but a skewed
# or drifted domain can silently widen the "bounded" histogram into a
# data-sized global sort — so the bound is ENFORCED in-plan: every row
# carries the histogram cardinality on the same broadcast, and the rank
# expression raises past this ceiling instead of degrading (ADVICE r8:
# runtime guard on histogram cardinality). Limitation (ADVICE r9): the
# guard evaluates after the histogram broadcast, so a GROSSLY mis-sized
# bucket_div (millions of buckets) fails first as a driver
# broadcast/OOM error rather than this message — still loud, just less
# specific. with_global_row_number_auto avoids mis-sizing entirely by
# deriving the width from in-plan range stats.
MAX_BUCKETS = 100_000

# Bucket count with_global_row_number_auto aims for: small enough that
# the histogram window is trivially bounded (far under MAX_BUCKETS),
# large enough that per-bucket slices parallelize the in-bucket sort.
TARGET_BUCKETS = 8_192


def with_global_row_number(
    df: DataFrame,
    sort_col: str,
    tiebreak: str,
    bucket_div: int,
    rn: str = "rn",
    total: str | None = None,
) -> DataFrame:
    """Append an exact global row number ordered by
    (`sort_col` ASC, `tiebreak` ASC) — see module docstring for the
    plan shape. `sort_col` must be an integral column (negate it for
    DESC order); `tiebreak` must be unique within equal sort keys;
    `bucket_div` is the coarse width — pick it from key-range stats so
    span/bucket_div stays ≲ 10⁴ buckets (at 100 TB: one stats read),
    or use with_global_row_number_auto to derive it in-plan.
    If `total` is given, the exact row count rides along on the same
    broadcast (no separate count() pass or 1-row cross join)."""
    b = df.withColumn("_bkt", F.expr(f"{sort_col} div {bucket_div}"))
    return _rank_bucketed(b, sort_col, tiebreak, rn, total)


def with_global_row_number_auto(
    df: DataFrame,
    sort_col: str,
    tiebreak: str,
    rn: str = "rn",
    total: str | None = None,
    target_buckets: int = TARGET_BUCKETS,
) -> DataFrame:
    """with_global_row_number with the bucket width derived IN-PLAN
    from the column's own range stats: a 1-row (min, max) aggregate
    rides a broadcast cross join and the width becomes
    ≈ span div `target_buckets` — so the histogram cardinality is
    ≤ ~2·target_buckets BY CONSTRUCTION on any domain, fixture-tuned
    constants can't drift (ADVICE/verdict r9: q_rfm_segments' divisors
    were sized to the fixture), and the MAX_BUCKETS guard becomes
    unreachable rather than load-bearing. The width divides min/max
    BEFORE subtracting (span itself can overflow bigint on a
    full-range domain) and rows bucket by plain `v div width` —
    truncating division is monotone on signed keys (the 0-straddling
    bucket is merely wider), so no (v − min) re-base is needed. Cost:
    one extra pass over `df` for the stats (at 100 TB: a footer/stats
    read, or persist `df` as the callers do)."""
    stats = df.agg(
        F.min(sort_col).alias("_vmin"), F.max(sort_col).alias("_vmax")
    )
    b = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_bkt",
            F.expr(
                f"{sort_col} div greatest(_vmax div {target_buckets}"
                f" - _vmin div {target_buckets}, 1)"
            ),
        )
        .drop("_vmin", "_vmax")
    )
    return _rank_bucketed(b, sort_col, tiebreak, rn, total)


def with_global_row_number_from_stats(
    df: DataFrame,
    sort_col: str,
    tiebreak: str,
    vmin_col: str,
    vmax_col: str,
    rn: str = "rn",
    total: str | None = None,
    target_buckets: int = TARGET_BUCKETS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """with_global_row_number_auto for callers that already carry the
    sort key's (min, max) range stats as COLUMNS on `df` — e.g. one
    shared 1-row stats broadcast serving several rankings over the same
    base (q_rfm_segments ranks three metrics: one combined aggregate
    replaces three per-axis stats passes). Same in-plan width
    derivation and overflow posture as the auto variant; the stats
    columns are consumed and dropped.

    `group_cols` generalizes to exact PER-GROUP row numbers in one
    pass: the histogram keys on (group, bucket), the running sum
    partitions by group (still bounded — ≤ groups × ~2·target_buckets
    rows), and `total` becomes the per-group row count. Several
    rankings over the same base collapse into one plan (explode the
    axes into a `group` column, rank grouped, pivot back) instead of
    one ranked branch + join per axis — q_rfm_segments measured
    2.38 s → ~1 s at sf0.1 from exactly that collapse, and the bound
    that keeps the broadcast tiny is unchanged because the per-row
    stats columns are per-group."""
    b = df.withColumn(
        "_bkt",
        F.expr(
            f"{sort_col} div greatest({vmax_col} div {target_buckets}"
            f" - {vmin_col} div {target_buckets}, 1)"
        ),
    ).drop(vmin_col, vmax_col)
    return _rank_bucketed(b, sort_col, tiebreak, rn, total, group_cols)


def _rank_bucketed(
    b: DataFrame,
    sort_col: str,
    tiebreak: str,
    rn: str,
    total: str | None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Histogram + broadcast + per-bucket rank over a DataFrame that
    already carries the order-preserving `_bkt` column. With
    `group_cols`, every step keys on (group, bucket) and row numbers
    restart per group."""
    g = list(group_cols)
    hist = b.groupBy(*g, "_bkt").agg(F.count("*").alias("_bc"))
    w_before = Window.partitionBy(*g).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*g).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_cols = [
        *[F.col(c) for c in g],
        F.col("_bkt"),
        F.coalesce(F.sum("_bc").over(w_before), F.lit(0)).alias("_before"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("_nb"),
    ]
    if total is not None:
        cum_cols.append(F.sum("_bc").over(w_all).cast("bigint").alias(total))
    cum = hist.select(*cum_cols)
    w_in = Window.partitionBy(*g, "_bkt").orderBy(
        F.asc(sort_col), F.asc(tiebreak)
    )
    out = (
        b.join(F.broadcast(cum), [*g, "_bkt"])
        .withColumn(
            rn,
            F.when(
                F.col("_nb") > MAX_BUCKETS,
                F.expr(
                    "raise_error(concat('rank histogram exceeded "
                    f"{MAX_BUCKETS} buckets (', _nb, '): bucket_div is "
                    "mis-sized for this key range'))"
                ).cast("bigint"),
            ).otherwise(
                (F.col("_before") + F.row_number().over(w_in)).cast("bigint")
            ),
        )
        .drop("_bkt", "_before", "_nb")
    )
    return out


def ntile_on(n: int, rn: str, total: str):
    """SQL-exact ntile(`n`) from a global row number `rn` and row count
    `total` (both column names): q = N div n, r = N mod n; tiles 1..r
    hold q+1 rows, tiles r+1..n hold q. `greatest(q, 1)` guards the
    unreachable else-branch division when N < n (CASE still type-checks
    both arms)."""
    q = f"({total} div {n})"
    r = f"({total} % {n})"
    boundary = f"({r} * ({q} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rn} <= {boundary}"
        f" THEN ({rn} - 1) div ({q} + 1) + 1"
        f" ELSE {r} + ({rn} - {boundary} - 1) div greatest({q}, 1) + 1"
        f" END AS INT)"
    )
