"""Local replica of the driver's t2 correctness gate: every declared query
must hash-match its DuckDB oracle at sf0.01 (order-insensitive values,
columns sorted by name)."""

from __future__ import annotations

import pytest

from real_time_trip_processing_project_spark import testing
from real_time_trip_processing_project_spark.plans import REGISTRY, RETIRED

#: Retired queries keep their oracle and stay verified HERE (the driver's
#: rotated window no longer spends slots on them — plans/catalog.RETIRED).
_ALL = {**REGISTRY, **RETIRED}


def _names():
    return sorted(_ALL.keys())


@pytest.fixture(scope="module")
def duck(sf_oracle):
    return testing.duckdb_conn(sf_oracle)


@pytest.mark.parametrize("qname", _names())
def test_query_matches_oracle(spark, sf_oracle, duck, qname):
    qdef = _ALL[qname]
    df = qdef.fn(spark, sf_oracle)
    if qdef.oracle is None:
        # rows-only contract: runs, stable schema, non-negative row count
        n = df.count()
        assert n >= 0
        assert len(df.columns) > 0
        return
    res = testing.compare_query(qname, df, qdef.oracle, duck)
    assert res.ok, f"{qname}: {res.detail}"


def test_every_oracle_parses_in_duckdb(duck):
    """Every registered oracle — including the output of the
    registration-time ``_ns_robust`` regex rewrite — must still be a
    statement DuckDB can plan.  Guards against a future oracle whose
    token after ``FROM events`` the rewrite mis-classifies as an alias
    (e.g. TABLESAMPLE / PIVOT): a mis-rewrite fails loudly here at test
    time instead of surfacing as a confusing driver oracle error."""
    for qname, qdef in _ALL.items():
        if qdef.oracle is None:
            continue
        try:
            duck.execute("EXPLAIN " + qdef.oracle)
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(f"{qname}: oracle does not parse: {e}") from e


# Types the driver's value-hash encodes identically to their Spark
# counterparts.  Notably ABSENT: HUGEINT (int128) — DuckDB silently
# widens SUM(BIGINT) and windowed integer sums to HUGEINT, which the
# driver hashes differently from Spark's int64 even when every value is
# bit-identical (the r6 seven-red-rows incident).  Every integer
# aggregate in an oracle must therefore be wrapped in
# CAST(... AS BIGINT); this static gate makes the class unrepresentable.
_ORACLE_TYPE_ALLOWLIST = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "VARCHAR",
    "DOUBLE",
    "FLOAT",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


def test_oracle_output_types_are_driver_hashable(duck):
    """Static type gate the value-comparator structurally cannot perform
    (``testing.py:_norm`` collapses every integer width to Python
    ``int``, so a HUGEINT-emitting oracle looks green locally while the
    driver's type-aware hash diverges).  DESCRIBE each oracle and
    require every output column's declared type to be in the allowlist
    — no HUGEINT, no DECIMAL, no LIST in a hash-compared oracle."""
    bad = []
    for qname, qdef in sorted(_ALL.items()):
        if qdef.oracle is None:
            continue
        cols = duck.execute("DESCRIBE " + qdef.oracle).fetchall()
        for name, dtype, *_ in cols:
            base = dtype.split("(")[0].strip().upper()
            if base not in _ORACLE_TYPE_ALLOWLIST:
                bad.append(f"{qname}.{name}: {dtype}")
    assert not bad, (
        "oracle columns with driver-unhashable types (wrap integer "
        "aggregates in CAST(... AS BIGINT)): " + "; ".join(bad)
    )


def test_events_oracles_ns_robust(spark, tmp_path):
    """An ns-unit events fixture with sub-microsecond residues sitting
    exactly on predicate boundaries must hash-match through the SAME
    pipeline the driver uses: Spark's footer-sniffing loader truncates
    ns→us, and the registration-time oracle rewrite
    (plans/catalog._ns_robust) makes DuckDB truncate identically —
    without it, ``ts >= t_click`` / ``t_buy <= t_click + 1h`` flip on
    these rows (the r4 funnel_conversion red row)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    H = 3_600_000_000_000  # 1 hour in ns
    T0 = 1_704_067_200_000_000_000  # 2024-01-01 00:00:00 UTC in ns
    rows = [
        # user 1: purchase lands 700ns AFTER click+1h — converted only
        # after us-truncation (residues 300ns vs 700ns drop together)
        (1, T0 + 300, 1, "click", 1.0, "{}"),
        (2, T0 + H + 700, 1, "purchase", 9.0, "{}"),
        # user 2: purchase 500ns BEFORE its click (same microsecond) —
        # `ts >= t_click` is false at ns, true after truncation
        (3, T0 + 10_000_500, 2, "click", 1.0, "{}"),
        (4, T0 + 10_000_000, 2, "purchase", 5.0, "{}"),
        # user 3: plainly converted; user 4: click only; user 5: no click
        (5, T0, 3, "click", 1.0, "{}"),
        (6, T0 + H // 2, 3, "purchase", 7.0, "{}"),
        (7, T0 + 5 * H, 4, "click", 1.0, "{}"),
        (8, T0 + 6 * H, 5, "purchase", 3.0, "{}"),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"), store_schema=True)
    assert pq.read_schema(str(tmp_path / "events.parquet")).field("ts").type.unit == "ns"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    for qname in ("funnel_conversion", "asof_join_events"):
        qdef = _ALL[qname]  # funnel_conversion RETIRED r14
        df = qdef.fn(spark, str(tmp_path))
        res = testing.compare_query(qname, df, qdef.oracle, con)
        assert res.ok, f"{qname} on ns fixture: {res.detail}"
    # and the interesting rows actually exercised the boundary: user 1
    # and 2 count as converted under us semantics
    got = {
        r.click_date.isoformat(): (r.n_clickers, r.n_converted)
        for r in _ALL["funnel_conversion"].fn(spark, str(tmp_path)).collect()
    }
    # users 1-4 clicked on 2024-01-01; 1,2,3 converted post-truncation
    # (1 and 2 ONLY because both engines truncated the ns residues)
    assert got["2024-01-01"] == (4, 3)


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
