"""Evidence for the schema-tolerant events loader: every physical type
the generator has shipped for `events.ts` (int64 epoch-nanos,
timestamp[us] NTZ, UTC-adjusted timestamp[us]) must normalize to the
SAME canonical `ts_us` values — and a unit mix-up must fail loudly, not
silently corrupt timestamps (the round-3 failure mode)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ai_assistent_spark import io

TS_US = [1_704_067_798_778_549, 1_704_068_166_738_090, 1_735_689_599_999_999]


def _write_events(dir_path: str, ts_array: pa.Array) -> str:
    os.makedirs(dir_path, exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 12], type=pa.int64()),
            "event_type": pa.array(["view", "purchase", "signup"]),
            "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":2}', '{"k":3}']),
        }
    )
    pq.write_table(t, os.path.join(dir_path, "events.parquet"))
    return dir_path


@pytest.mark.parametrize(
    "label,ts_array",
    [
        ("int64_nanos", pa.array([us * 1000 for us in TS_US], type=pa.int64())),
        ("timestamp_us_ntz", pa.array(TS_US, type=pa.timestamp("us"))),
        ("timestamp_us_utc", pa.array(TS_US, type=pa.timestamp("us", tz="UTC"))),
        ("timestamp_ns_ntz", pa.array([us * 1000 for us in TS_US], type=pa.timestamp("ns"))),
    ],
)
def test_load_events_normalizes_every_physical_ts_type(
    spark, tmp_path, label, ts_array
):
    sf_dir = _write_events(str(tmp_path / label), ts_array)
    e = io.load_events(spark, sf_dir)
    assert dict(e.dtypes)["ts_us"] == "bigint"
    got = {r["event_id"]: r["ts_us"] for r in e.collect()}
    assert got == {1: TS_US[0], 2: TS_US[1], 3: TS_US[2]}, label


def test_ts_unit_sanity_rejects_wrong_unit(spark, tmp_path):
    """A seconds-typed int64 column (or any unit drift) lands orders of
    magnitude outside the plausible epoch-µs band — the loader must
    refuse rather than produce 1000x-shrunk timestamps."""
    sf_dir = _write_events(
        str(tmp_path / "secs"),
        pa.array([us // 1_000_000 for us in TS_US], type=pa.int64()),
    )
    with pytest.raises(AssertionError, match="unit sanity"):
        io.assert_ts_unit_sane(os.path.join(sf_dir, "events.parquet"))


def test_streaming_source_matches_batch_normalization(spark, tmp_path):
    """The streaming file source must decode `ts` with the same
    normalization as the batch loader (the round-3 silent-corruption
    path was exactly this divergence)."""
    from pyspark.sql import functions as F

    from etl_ai_assistent_spark.streaming import pipeline as SP

    sf_dir = _write_events(
        str(tmp_path / "stream"), pa.array(TS_US, type=pa.timestamp("us"))
    )
    stream = SP.read_events_stream(spark, sf_dir).select(
        "event_id", "ts_us", F.unix_micros("ts_ts").alias("ts_ts_us")
    )
    drained = SP.run_to_memory(stream, prefix="schema_tol", mode="append")
    rows = {r["event_id"]: (r["ts_us"], r["ts_ts_us"]) for r in drained.collect()}
    assert rows == {1: (TS_US[0],) * 2, 2: (TS_US[1],) * 2, 3: (TS_US[2],) * 2}
