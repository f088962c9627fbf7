"""The local replica of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly at sf0.001 (fast) —
row count, column names, and order-insensitive values."""

from __future__ import annotations

import pytest

from etl_ai_assistent_spark import parity
from etl_ai_assistent_spark.registry import oracle_sql, queries


def _names():
    return sorted(queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_small, name):
    res = parity.check_query(spark, name, sf_small)
    assert res.ok, str(res)


def test_every_query_runs_at_smoke_sf(spark, sf_small):
    for name, fn in queries().items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name


def test_oracles_have_matching_queries():
    q, o = set(queries()), set(oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
