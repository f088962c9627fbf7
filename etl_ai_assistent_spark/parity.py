"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, column names, and an
order-insensitive view of the values. Used by tests/test_parity.py so
oracle drift is caught before the driver runs.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from . import schemas
from .registry import oracle_sql, queries


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in schemas.TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v,
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    return a == b


@dataclass
class ParityResult:
    name: str
    ok: bool
    row_count: tuple[int, int]
    columns: tuple[tuple[str, ...], tuple[str, ...]]
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name} rows={self.row_count}"
        if self.mismatches:
            msg += "\n  " + "\n  ".join(self.mismatches[:10])
        return msg


def check_query(
    spark: SparkSession, name: str, sf_dir: str, con=None
) -> ParityResult:
    q = queries()[name]
    sql = oracle_sql().get(name)
    if sql is None:
        spark_df = q(spark, sf_dir).toPandas()
        return ParityResult(
            name,
            ok=True,
            row_count=(len(spark_df), -1),
            columns=(tuple(sorted(spark_df.columns)), ()),
            mismatches=["rows-only check (no oracle)"],
        )
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        spark_pdf = _canon(q(spark, sf_dir).toPandas())
        duck_pdf = _canon(con.execute(sql).df())
    finally:
        if own_con:
            con.close()

    mismatches: list[str] = []
    if tuple(spark_pdf.columns) != tuple(duck_pdf.columns):
        mismatches.append(
            f"columns differ: spark={list(spark_pdf.columns)} duck={list(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        mismatches.append(f"row count differs: {len(spark_pdf)} vs {len(duck_pdf)}")
    if not mismatches:
        # the driver's value hash is dtype-KIND-sensitive (round 1:
        # DuckDB HUGEINT sums widened to float64 and hash-mismatched
        # against Spark's int64 despite equal values, while int32 vs
        # int64 hashed equal) — compare the pandas dtype kind
        for c in spark_pdf.columns:
            sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
            if sk != dk:
                mismatches.append(
                    f"col {c}: dtype kind differs "
                    f"{spark_pdf[c].dtype} vs {duck_pdf[c].dtype}"
                )
    if not mismatches:
        for c in spark_pdf.columns:
            sv, dv = spark_pdf[c].tolist(), duck_pdf[c].tolist()
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sv, dv))
                if not _values_equal(a, b)
            ]
            if bad:
                i, a, b = bad[0]
                mismatches.append(
                    f"col {c}: {len(bad)} value mismatches; first at row {i}: {a!r} vs {b!r}"
                )
    return ParityResult(
        name,
        ok=not mismatches,
        row_count=(len(spark_pdf), len(duck_pdf)),
        columns=(tuple(spark_pdf.columns), tuple(duck_pdf.columns)),
        mismatches=mismatches,
    )


def check_all(spark: SparkSession, sf_dir: str) -> list[ParityResult]:
    con = duckdb_connection(sf_dir)
    try:
        return [
            check_query(spark, name, sf_dir, con)
            for name in sorted(queries())
        ]
    finally:
        con.close()
