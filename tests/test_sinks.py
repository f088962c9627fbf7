"""K2/K3/K4-style sink round-trips (SURVEY.md §2.2): table assets to
CSV, image assets (BinaryType) to parquet, points store partitioned by
document_version — written and read back losslessly."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark import io, schemas


def test_table_asset_csv_roundtrip(spark, tmp_path):
    rows = [
        (1, "Table 1: metrics", [["a b", "c"], ["d", "e  f"]]),
        (2, "Таблица 2", [["x", "y"]]),
    ]
    df = spark.createDataFrame(rows, schemas.TABLES_ASSET)
    # K2 shape: one CSV row per table row, cells whitespace-normalized
    flat = df.select(
        "doc_id",
        "caption",
        F.posexplode("rows").alias("row_idx", "cells"),
    ).select(
        "doc_id",
        "caption",
        "row_idx",
        F.concat_ws(
            "|",
            F.transform(
                "cells", lambda c: F.regexp_replace(F.trim(c), r"\s+", " ")
            ),
        ).alias("cells"),
    )
    out = str(tmp_path / "tables_csv")
    io.write_csv(flat, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    got = {
        (int(r["doc_id"]), int(r["row_idx"])): r["cells"] for r in back.collect()
    }
    assert got[(1, 0)] == "a b|c"
    assert got[(1, 1)] == "d|e f"  # whitespace normalized
    assert got[(2, 0)] == "x|y"


def test_image_asset_binary_roundtrip(spark, tmp_path):
    rows = [(1, "Рис 1", b"\x89PNG\r\n\x1a\nfakebytes", ".png")]
    df = spark.createDataFrame(rows, schemas.IMAGES_ASSET)
    out = str(tmp_path / "images")
    io.write_parquet(df, out)
    back = spark.read.parquet(out).collect()[0]
    assert bytes(back["content"]) == rows[0][2]
    assert back["ext"] == ".png"


def test_points_store_partitioned_by_version(spark, tmp_path):
    rows = [
        ("p1", [0.1, 0.2], "t1", "para A", "doc.docx", "v1"),
        ("p2", [0.3, 0.4], "t2", "para B", "doc.docx", "v2"),
    ]
    df = spark.createDataFrame(rows, schemas.POINTS)
    out = str(tmp_path / "points")
    io.write_parquet(df, out, partition_by=("document_version",))
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("document_version=")
    ) == ["document_version=v1", "document_version=v2"]
    back = spark.read.parquet(out)
    # partition filter prunes: only v2's file is read
    plan = (
        back.filter(F.col("document_version") == "v2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(document_version" in plan
    assert back.filter("document_version = 'v2'").count() == 1


def test_ann_topk_chooser(spark, sf_small):
    """ann_topk picks brute force under the threshold, SRP over it —
    and the exact path equals knn_join's output."""
    from etl_ai_assistent_spark.operators import similarity as S

    emb = io.load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.ann_topk(emb, queries, k=3, exact_max_rows=10_000_000)
    brute = S.knn_join(emb, queries, k=3)
    assert exact.exceptAll(brute).count() == 0
    approx = S.ann_topk(emb, queries, k=3, exact_max_rows=1)
    # approximate path returns a subset of queries (bucket-dependent) with
    # the same output shape
    assert approx.columns == ["query_id", "item_id", "score", "rank"]
    assert approx.count() > 0
