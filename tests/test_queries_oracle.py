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


def test_bucket_refine_percentiles_long_tail(spark):
    """Auto-derived bucket width must keep the refinement exact on a
    long-tailed value domain (7 decades of magnitude — a fixed $100
    width would dump 99% of rows into one bucket).  Exactness is
    checked against numpy's type-7 interpolation on the same values."""
    import numpy as np
    from pyspark.sql import functions as F

    from real_time_trip_processing_project_spark.plans.core import (
        bucket_refine_percentiles,
    )

    vals = (
        spark.range(20_000)
        .select(
            (F.col("id") % 3).cast("string").alias("flag"),
            # deterministic long tail: ~10^(0..7), integer cents
            F.pow(
                F.lit(10.0), (F.col("id") % 7001).cast("double") / 1000.0
            )
            .cast("long")
            .alias("cents"),
        )
    )
    got = {
        r.flag: (r.p25, r.p50, r.p75)
        for r in bucket_refine_percentiles(
            vals, (("p25", 0.25), ("p50", 0.50), ("p75", 0.75))
        ).collect()
    }
    rows = vals.collect()
    by_flag: dict[str, list[int]] = {}
    for r in rows:
        by_flag.setdefault(r.flag, []).append(r.cents)
    for flag, xs in by_flag.items():
        want = np.percentile(np.array(xs, dtype=np.float64), [25, 50, 75])
        for g, w in zip(got[flag], want):
            assert abs(g - w / 100.0) < 1e-9, (flag, g, w / 100.0)
