"""Batch trip correlation + daily KPIs (SURVEY.md §2.3 J1/J2, §2.4 A1-A7).

This is the batch expression of the reference pipeline: the notebook's
pandas inner join (eda.ipynb cell 782784dd) and the Glue job's five
separate aggregate actions (daily_kpi_aggregation.py:110-118), fused into
single-pass Spark plans.

Scale notes:
- start ⋈ end is a key-equality join on unique ``trip_id`` — at 100 TB this
  is a shuffle join on a uniform key (no skew); AQE picks the strategy.
- The five KPIs are computed in ONE ``groupBy().agg()`` — one scan, partial
  (map-side) + final HashAggregate — versus the reference's 5-6 jobs over
  the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_trips(start: DataFrame, end: DataFrame) -> DataFrame:
    """J1: inner-join start and end events on ``trip_id``; enrich (P3).

    Produces one row per completed trip carrying all start + end fields,
    ``date`` (calendar day of pickup — README.md:34,44) and
    ``status='Completed'`` (trip_processor.py:75).
    """
    return (
        start.join(end, "trip_id", "inner")
        .withColumn("date", F.to_date("pickup_datetime"))
        .withColumn("status", F.lit("Completed"))
    )


def orphan_ends(start: DataFrame, end: DataFrame) -> DataFrame:
    """J2: end events with no matching start (reference warns + drops —
    trip_processor.py:60-62).  Surfaced as a dataset instead of a log line."""
    return end.join(start, "trip_id", "left_anti")


def started_only(start: DataFrame, end: DataFrame) -> DataFrame:
    """J2 complement: starts that never completed (stay 'Started')."""
    return start.join(end, "trip_id", "left_anti")


def daily_kpis(trips: DataFrame, fare_col: str = "fare_amount") -> DataFrame:
    """A1-A6: the five spec KPIs per day, one hash-aggregate pass.

    Input must already carry ``date`` and be restricted to completed trips
    (F1) — the caller owns filtering so partition pruning on the trips
    store (S7/F2) stays visible to Catalyst.
    """
    return trips.groupBy("date").agg(
        F.sum(fare_col).alias("total_fare"),
        F.count("*").alias("count_trips"),
        F.avg(fare_col).alias("average_fare"),
        F.max(fare_col).alias("max_fare"),
        F.min(fare_col).alias("min_fare"),
    )


def kpis_for_date(trips: DataFrame, target_date: str) -> DataFrame:
    """A7 + F1/F2: the Glue job's shape — filter to one day of completed
    trips, then aggregate globally (daily_kpi_aggregation.py:107-118)."""
    one_day = trips.filter(
        (F.col("date") == F.lit(target_date)) & (F.col("status") == "Completed")
    )
    return one_day.agg(
        F.sum("fare_amount").alias("total_fare"),
        F.count("*").alias("count_trips"),
        F.avg("fare_amount").alias("average_fare"),
        F.max("fare_amount").alias("max_fare"),
        F.min("fare_amount").alias("min_fare"),
    )


def kpi_document(kpis_one_day: DataFrame) -> DataFrame:
    """Shape one day's KPI row into the nested output document
    ``{date, metrics{...}, timestamp}`` (daily_kpi_aggregation.py:120-125)."""
    return kpis_one_day.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        F.struct(
            F.date_format("date", "yyyy-MM-dd").alias("trip_date"),
            F.col("total_fare"),
            F.col("count_trips"),
            F.col("average_fare"),
            F.col("max_fare"),
            F.col("min_fare"),
        ).alias("metrics"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").alias(
            "timestamp"
        ),
    )
