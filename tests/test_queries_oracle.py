"""Local replica of the driver's t2 correctness gate: every declared query
must hash-match its DuckDB oracle at sf0.01 (order-insensitive values,
columns sorted by name)."""

from __future__ import annotations

import pytest

from real_time_trip_processing_project_spark import testing
from real_time_trip_processing_project_spark.plans import REGISTRY


def _names():
    return sorted(REGISTRY.keys())


@pytest.fixture(scope="module")
def duck(sf_oracle):
    return testing.duckdb_conn(sf_oracle)


@pytest.mark.parametrize("qname", _names())
def test_query_matches_oracle(spark, sf_oracle, duck, qname):
    qdef = REGISTRY[qname]
    df = qdef.fn(spark, sf_oracle)
    if qdef.oracle is None:
        # rows-only contract: runs, stable schema, non-negative row count
        n = df.count()
        assert n >= 0
        assert len(df.columns) > 0
        return
    res = testing.compare_query(qname, df, qdef.oracle, duck)
    assert res.ok, f"{qname}: {res.detail}"
