"""Bucketed physical design: pre-shuffled tables for co-located joins
(100 TB posture; SURVEY.md §4).

``bucketBy(n, key)`` writes each table pre-hash-partitioned on the join
key; two tables bucketed the same way join with ZERO exchange — the
classic answer to "this fact-fact join shuffles 100 TB every night".
The write pays the shuffle once; every subsequent join (and any
aggregation keyed on the bucket column) reuses the on-disk layout.

Tables land as parquet data-source tables with an explicit /tmp path
(external), registered in the session's in-memory catalog keyed by
(sf-dir tag, table, bucket count). A fresh session re-registers by
rewriting — idempotent, seconds at test scale; in production this is a
one-time backfill into the warehouse."""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from .. import io

BUCKETED_ROOT = "/tmp/spark_graft_bucketed_v1"


def bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Read `table` as a bucketed catalog table, materializing it on
    first use in this session. sortBy(key) inside each bucket lets the
    join skip its sort too (SortMergeJoin over pre-sorted buckets)."""
    tag = re.sub(r"[^0-9A-Za-z_]", "_", os.path.basename(os.path.normpath(sf_dir)))
    name = f"bkt_{table}_{tag}_{buckets}"
    if not spark.catalog.tableExists(name):
        (
            io.load_table(spark, sf_dir, table)
            .write.format("parquet")
            .option("path", os.path.join(BUCKETED_ROOT, tag, f"{table}_{buckets}"))
            .bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return spark.table(name)
