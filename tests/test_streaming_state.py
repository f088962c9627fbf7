"""Evidence tests for the custom stateful streaming operator: state must
actually persist across micro-batches (not just one big batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark.streaming import pipeline as SP


def test_state_crosses_micro_batches(spark, sf_small):
    events = SP.read_events_stream_split(spark, sf_small, parts=4)
    drained = SP.run_to_memory(
        SP.stateful_user_totals(events), prefix="state_test", mode="update"
    )
    n_users = drained.select("user_id").distinct().count()
    n_rows = drained.count()
    # one cumulative row per touched user per batch: with 4 batches and
    # every user active in several of them, rows must exceed users —
    # proof the operator emitted from restored state more than once.
    assert n_rows > n_users, (n_rows, n_users)
    # cumulative counters are monotone per user: max == last == total
    totals = drained.groupBy("user_id").agg(
        F.max("cum_events").alias("n"), F.sum(F.lit(1)).alias("batches")
    )
    multi = totals.filter(F.col("batches") > 1).count()
    assert multi > 0
