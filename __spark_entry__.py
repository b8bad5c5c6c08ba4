"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``real_time_trip_processing_project_spark``; the
query catalogue is the plans registry (one entry per SURVEY.md §2
operator, EXTENSION-tier included).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def _registry():
    from real_time_trip_processing_project_spark.plans import REGISTRY

    return REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The trip-style daily KPI pipeline: start ⋈ end correlate + per-day
    five-KPI aggregate in a single pass (SURVEY.md §7 minimum slice).
    """
    return _registry()["trip_daily_kpis"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qdef.fn for name, qdef in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL-expressible
    ops (driver records a weaker rows-only check for those)."""
    return {
        name: qdef.oracle
        for name, qdef in _registry().items()
        if qdef.oracle is not None
    }
