"""Source/sink wrappers (SURVEY.md §2.1 S4-S6, §2.2 K1-K7).

The reference's sources/sinks are row-at-a-time file loops; here every one
is a DataFrame reader/writer so Catalyst gets pushdown + pruning on the
read side and distributed writes on the sink side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata parquet table (S6-style full scan; columnar,
    predicate-pushdown capable — the Spark analogue of the reference's
    vector-store scroll scan at make_ragas_test.py:72-87)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the events table. Its `ts` is nanosecond-precision parquet,
    which Spark's timestamp type (microseconds) cannot hold — so it is
    read as epoch-nanos BIGINT (exact; also sidesteps ns-vs-us truncation
    drift against the DuckDB oracle, which reads full nanos). Queries
    derive epoch seconds via integer division.

    The conf is set here (runtime-settable) because the driver passes its
    own SparkSession that won't have it in the builder.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return load_table(spark, sf_dir, "events")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        t: load_events(spark, sf_dir) if t == "events" else load_table(spark, sf_dir, t)
        for t in schemas.TESTDATA_TABLES
    }


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql paths."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# --- sources (SURVEY.md §2.1) -------------------------------------------


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S4 text-lines source (vectorize_out.py:41-42): read + strip lines."""
    return spark.read.text(path).select(F.trim("value").alias("line"))


def read_json_dataset(spark: SparkSession, path: str) -> DataFrame:
    """S5 QA JSON source (make_ragas_dataset.py:61-69), explicit schema."""
    return spark.read.json(path, schema=schemas.QA_DATASET, multiLine=True)


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """S1 ingest edge: binary files (e.g. *.docx) one row per file.

    Columns: path, modificationTime, length, content (BinaryType).
    At scale each file is one task; parsing happens in mapInPandas
    (see operators.multimodal / sources.docx).
    """
    return spark.read.format("binaryFile").load(path_glob)


# --- sinks (SURVEY.md §2.2) ----------------------------------------------


def write_parquet(
    df: DataFrame, path: str, *, partition_by: tuple[str, ...] = (), mode: str = "overwrite"
) -> None:
    """K4/K5-style native store. Partitioning keys (e.g. document_version)
    enable static + dynamic partition pruning on later scans."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1/K5/K6 JSON sinks (app.py:37-38, vectorize_out.py:99)."""
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2/K7 CSV sinks (docx_etl.py:160-171, make_ragas_test.py:196)."""
    df.write.mode(mode).option("header", True).csv(path)
