"""Property-based laws for the snapshot-maintenance family, checked
against an independent pure-Python reference model on randomized CDC
workloads (hypothesis). The example counts are small — every example
runs real Spark jobs — but the generators cover the corners the fixture
batches never hit: repeated keys across batches, group moves, deletes
of missing keys, upsert fallthroughs, null measure-like values.

Laws:
  merge:        merge_apply == model apply          (any one-batch feed)
  mor:          resolve(base, log) == fold(merge)   (any multi-batch log)
  diff:         merge(v0, diff(v0, v1)) == v1       (any two snapshots)
  incremental:  maintain(agg, ch) == agg(merge)     (any one-batch feed)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators import mor as MOR
from etl_ai_assistent_spark.operators.incremental import incremental_group_sums
from etl_ai_assistent_spark.operators.merge import merge_apply, snapshot_diff

KEYS = st.integers(min_value=0, max_value=9)
GROUPS = st.sampled_from(["g0", "g1", "g2"])
VALS = st.integers(min_value=-50, max_value=50)

# base snapshot: unique keys
BASE = st.dictionaries(KEYS, st.tuples(GROUPS, VALS), max_size=8)


def _batch(draw):
    """One CDC batch: at most one change per key (the merge precondition)."""
    d = draw(
        st.dictionaries(
            KEYS, st.tuples(st.sampled_from("IUD"), GROUPS, VALS), max_size=6
        )
    )
    return [(k, op, g, v) for k, (op, g, v) in d.items()]


@st.composite
def batches(draw, max_batches=3):
    return [_batch(draw) for _ in range(draw(st.integers(1, max_batches)))]


def _model_apply(snapshot: dict, batch: list) -> dict:
    out = dict(snapshot)
    for k, op, g, v in batch:
        if op == "D":
            out.pop(k, None)
        else:  # I, or U (upsert fallthrough when missing)
            out[k] = (g, v)
    return out


def _df_snapshot(spark, snap: dict):
    rows = [(k, g, v) for k, (g, v) in snap.items()] or None
    return spark.createDataFrame(rows or [], "k int, g string, v int")


def _df_batch(spark, batch: list):
    return spark.createDataFrame(
        batch or [], "k int, op string, g string, v int"
    ).select("k", "op", "g", "v")


def _as_set(df):
    return {tuple(r) for r in df.collect()}


_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(base=BASE, log=batches())
@_SETTINGS
def test_merge_fold_and_mor_resolve_match_model(spark, base, log):
    base_df = _df_snapshot(spark, base)
    expect = dict(base)
    cow = base_df
    log_df = None
    for seq, batch in enumerate(log, start=1):
        expect = _model_apply(expect, batch)
        b_df = _df_batch(spark, batch)
        cow = merge_apply(cow, b_df, key="k")
        stamped = MOR.stamp_batch(b_df, seq)
        log_df = stamped if log_df is None else log_df.unionByName(stamped)

    want = {(k, g, v) for k, (g, v) in expect.items()}
    assert _as_set(cow) == want
    assert _as_set(MOR.resolve(base_df, log_df, key="k")) == want


@given(v0=BASE, v1=BASE)
@_SETTINGS
def test_diff_then_merge_reconstructs_any_snapshot(spark, v0, v1):
    d0, d1 = _df_snapshot(spark, v0), _df_snapshot(spark, v1)
    ch = snapshot_diff(d0, d1, key="k")
    rebuilt = merge_apply(d0, ch, key="k")
    assert _as_set(rebuilt) == {(k, g, v) for k, (g, v) in v1.items()}
    # and the diff is minimal: identical keys emit no change row
    same = {k for k in v0 if v0.get(k) == v1.get(k)}
    assert not same & {r["k"] for r in ch.collect()}


@given(base=BASE, log=batches(max_batches=1))
@_SETTINGS
def test_incremental_agg_matches_recompute(spark, base, log):
    batch = log[0]
    base_df = _df_snapshot(spark, base)
    agg = base_df.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sum_measure"),
    )
    maintained = incremental_group_sums(
        agg, base_df, _df_batch(spark, batch), key="k", group_col="g",
        measure_col="v",
    )
    merged = _model_apply(dict(base), batch)
    expect: dict = {}
    for _, (g, v) in merged.items():
        n, s = expect.get(g, (0, 0))
        expect[g] = (n + 1, s + v)
    assert _as_set(maintained) == {(g, n, s) for g, (n, s) in expect.items()}
