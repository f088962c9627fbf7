"""Sorted file compaction — the lakehouse table-maintenance operator.

A 100 TB table accumulates small, unordered files (streaming ingest,
per-batch appends — e.g. the foreachBatch parquet sink in
streaming/pipeline.py writes one file set per micro-batch). Compaction
rewrites it as N range-partitioned, key-sorted files whose parquet
footer min/max statistics have DISJOINT key ranges — so any engine's
zone-map / row-group skipping turns a key-range predicate into a
subset-of-files scan instead of a full-table scan.

Spark-first: `repartitionByRange` (sampled range exchange) +
`sortWithinPartitions` keeps the whole rewrite distributed and
shuffle-optimal (one range exchange, no global sort barrier); the file
count is the explicit scale knob (files ~ table_bytes / target_file_size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_sorted(
    df: DataFrame, path: str, key: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Rewrite `df` as `n_files` key-clustered parquet files: a sampled
    range repartition on `key` (disjoint per-file key ranges) followed
    by an in-partition sort (monotone pages inside each file, so
    page-level indexes work too)."""
    (
        df.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, key: str) -> list[tuple[str, int, int]]:
    """(file, min, max) of `key` from parquet footer statistics only —
    the zone-map a reader consults; no data pages are touched."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, name))
        idx = [f.name for f in pf.schema_arrow].index(key)
        lo = hi = None
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((name, lo, hi))
    return out


def files_matching_range(
    ranges: list[tuple[str, int, int]], lo: int, hi: int
) -> list[str]:
    """Zone-map pruning decision: files whose [min, max] intersects
    [lo, hi] — exactly the skip logic a stats-aware reader applies."""
    return [f for f, mn, mx in ranges if not (mx < lo or mn > hi)]
