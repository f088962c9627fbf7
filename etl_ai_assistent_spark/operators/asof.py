"""As-of join — Spark lacks a native one (SURVEY.md §2.6 "Joins").

Implementation is the union + last(ignorenulls) window trick, NOT a range
cross-join: tag right rows 0 and left rows 1, union on the key, sort each
key group by (ts, tag), and fill the right payload forward. One shuffle on
the join key, no pair explosion — at 100 TB this is a single sort-merge
pass, robust to arbitrarily dense right sides (a range join would blow up
on hot keys; pd.merge_asof per group would need the whole key group in one
pandas frame).

Semantics: backward as-of, inclusive (each left row gets the latest right
row with right_ts <= left_ts), matching DuckDB's `ASOF JOIN ... ON l.ts >=
r.ts` which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_prefix: str = "r_",
) -> DataFrame:
    """Backward-inclusive as-of join; right columns (minus key) come back
    prefixed with ``payload_prefix``, null when no right row precedes."""
    payload = [c for c in right.columns if c != on]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("s")).schema["s"].dataType
        ).alias("__right"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__left"),
        F.struct(*payload).alias("__right"),
    )
    # right (__tag 0) sorts before left at equal __ts -> inclusive match
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        "__match", F.last("__right", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__tag") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{payload_prefix}{c}") for c in payload],
    )
    return out
