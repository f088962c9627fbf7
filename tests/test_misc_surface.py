"""Remaining API-surface demonstrations: Python UDTFs (Spark 4
table-valued functions) and df.observe in-flight metrics.

Both are CAPABILITY tests, deliberately not registered queries: a
row-oriented Python UDTF is the slow path (the registered chunker uses
an Arrow pandas UDF instead — operators/chunker.py), and observe()
emits side-channel metrics rather than a result relation. They live
here so the surface is exercised and documented."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_python_udtf_span_expand(spark):
    """A Python UDTF (one input row → N output rows with a declared
    schema) — the UDTF third of the UDF/UDAF/UDTF surface. The same
    expansion is expressible with explode (the fast path, asserted
    equal); the UDTF form exists for logic that genuinely needs
    imperative row fan-out."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, start: int, stop: int")
    class FixedSpans:
        def eval(self, doc_id: int, length: int, width: int):
            for s in range(0, length, width):
                yield doc_id, s, min(s + width, length)

    spark.udtf.register("fixed_spans", FixedSpans)
    rows = spark.sql(
        "SELECT s.* FROM VALUES (1, 10), (2, 5) AS t(id, len), "
        "LATERAL fixed_spans(t.id, t.len, 4) s"
    ).collect()
    got = {(r["doc_id"], r["start"], r["stop"]) for r in rows}
    assert got == {(1, 0, 4), (1, 4, 8), (1, 8, 10), (2, 0, 4), (2, 4, 5)}

    # fast-path twin: sequence + explode produces the identical relation
    fast = (
        spark.createDataFrame([(1, 10), (2, 5)], "doc_id bigint, len int")
        .select(
            "doc_id",
            F.explode(F.expr("sequence(0, len - 1, 4)")).alias("start"),
            "len",
        )
        .select(
            "doc_id", "start", F.least(F.col("start") + 4, F.col("len")).alias("stop")
        )
    )
    assert {(r["doc_id"], r["start"], r["stop"]) for r in fast.collect()} == got


def test_observe_metrics_without_extra_scan(spark):
    """df.observe: accumulate named aggregates ON the production
    dataflow — row counts and sums harvested from the SAME pass that
    computes the result, no second scan. At 100 TB this is how a
    pipeline reports ingest volume/quality counters for free."""
    from pyspark.sql import Observation

    obs = Observation("ingest")
    df = (
        spark.range(0, 10_000)
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum((F.col("id") % 7 == 0).cast("long")).alias("mod7_rows"),
        )
        .filter(F.col("id") % 2 == 0)
    )
    assert df.count() == 5_000  # the actual job
    got = obs.get
    assert got["rows_seen"] == 10_000  # metrics observed pre-filter
    assert got["mod7_rows"] == 1429
