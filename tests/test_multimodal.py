"""Invariant tests for the multimodal + text-analysis families (beyond
the oracle parity gate, which covers exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark import io
from etl_ai_assistent_spark.operators import multimodal as MM


def _assets(spark, sf_small):
    docs = io.load_table(spark, sf_small, "documents").select("doc_id", "text")
    return MM.make_assets(docs)


def test_asset_metadata_typed_by_kind(spark, sf_small):
    a = _assets(spark, sf_small)
    bad = a.filter(
        ((F.col("kind") == "image") & (F.col("width").isNull() | F.col("fps").isNotNull()))
        | ((F.col("kind") == "audio") & F.col("sample_rate").isNull())
        | ((F.col("kind") == "video") & (F.col("n_frames").isNull() | F.col("width").isNotNull()))
    )
    assert bad.count() == 0


def test_byte_features_hist_sums_to_n_bytes(spark, sf_small):
    feats = MM.byte_features(_assets(spark, sf_small), bins=16)
    bad = feats.filter(
        F.aggregate("hist", F.lit(0).cast("bigint"), lambda a, x: a + x)
        != F.col("n_bytes")
    )
    assert bad.count() == 0


def test_frame_sample_within_bounds(spark, sf_small):
    a = _assets(spark, sf_small)
    frames = MM.frame_sample(a)
    joined = frames.join(a.select("asset_id", "n_frames", "fps"), "asset_id")
    bad = joined.filter(
        (F.col("frame_idx") < 0)
        | (F.col("frame_idx") >= F.col("n_frames"))
        | (F.col("frame_idx") % F.col("fps") != 0)
    )
    assert bad.count() == 0
    # every video appears (n_frames >= 30 > 0 guarantees >= 1 sample)
    assert frames.select("asset_id").distinct().count() == a.filter(
        F.col("kind") == "video"
    ).count()


def test_resize_never_upscales_and_fits(spark, sf_small):
    plan = MM.resize_plan(_assets(spark, sf_small), box=256)
    bad = plan.filter(
        (F.col("new_width") > F.least(F.col("width"), F.lit(256)))
        | (F.col("new_height") > F.least(F.col("height"), F.lit(256)))
        | (F.col("new_width") < 1)
        | (F.col("new_height") < 1)
    )
    assert bad.count() == 0
