"""Local replica of the driver's correctness gate.

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count, column names, and the full
value multiset (order-insensitive, columns sorted by name — mirroring the
driver's value-hash).  Exact equality is required: both sides round float
aggregates identically, so any residue is a real conformance bug.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

FIXTURE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with each fixture registered as a view (driver contract)."""
    con = duckdb.connect()
    for name in FIXTURE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name within each row, then sort rows — the
    order-insensitive canonical form the driver hashes."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(
    name: str,
    spark_df: DataFrame,
    oracle: str,
    con: duckdb.DuckDBPyConnection,
    max_diff_report: int = 5,
) -> CompareResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.execute(oracle)
    d_cols = [c[0] for c in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return CompareResult(
            name, False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
        )
    if len(s_rows) != len(d_rows):
        return CompareResult(
            name, False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
        )
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = []
        for a, b in zip(s_set, d_set):
            if a != b:
                diffs.append(f"spark={a!r} duckdb={b!r}")
                if len(diffs) >= max_diff_report:
                    break
        return CompareResult(name, False, "value mismatch: " + "; ".join(diffs))
    return CompareResult(name, True)


def run_gate(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[CompareResult]:
    """Run every registered query with an oracle against DuckDB."""
    from real_time_trip_processing_project_spark.plans import REGISTRY

    con = duckdb_conn(sf_dir)
    results = []
    for qname, qdef in REGISTRY.items():
        if only and qname not in only:
            continue
        df = qdef.fn(spark, sf_dir)
        if qdef.oracle is None:
            n = df.count()
            results.append(CompareResult(qname, True, f"rows-only ({n} rows)"))
            continue
        results.append(compare_query(qname, df, qdef.oracle, con))
    return results
