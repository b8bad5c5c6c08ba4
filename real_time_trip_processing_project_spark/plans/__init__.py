"""Declared query catalogue.

Importing this package registers every query module into
``real_time_trip_processing_project_spark.plans.catalog.REGISTRY``, which
``__spark_entry__.py`` exposes to the driver via ``queries()`` /
``oracle_sql()``.
"""

from real_time_trip_processing_project_spark.plans import catalog
from real_time_trip_processing_project_spark.plans import core  # noqa: F401
from real_time_trip_processing_project_spark.plans import extended  # noqa: F401
from real_time_trip_processing_project_spark.plans import tpch  # noqa: F401
from real_time_trip_processing_project_spark.plans import training  # noqa: F401

REGISTRY = catalog.REGISTRY
RETIRED = catalog.RETIRED

__all__ = ["REGISTRY", "RETIRED", "catalog"]
