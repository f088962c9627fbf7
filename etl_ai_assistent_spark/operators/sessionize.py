"""Gap-based sessionization (SURVEY.md §2.6 "Streaming" — batch form).

Classic lag + cumulative-sum recipe: a session starts where the gap to
the previous event of the same key exceeds ``gap``; the running sum of
session-start flags is the session id. Window partitioned by the key, so
the only shuffle is the per-key hash exchange; no state store needed in
batch. The streaming twin (session_window + watermark) lives in
streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    gap: int | float,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Append a ``session_id`` column (1-based, per key, in time order).

    ``ts`` and ``gap`` must share a unit (e.g. epoch seconds). A
    ``order_tiebreak`` column makes ordering total when ts has duplicates
    — required for deterministic, oracle-checkable output.
    """
    order: list[Column] = [F.col(ts)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_new).over(run))
