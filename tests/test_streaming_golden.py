"""Golden end-to-end test (SURVEY.md §5): replay the reference's trip CSVs
through the streaming correlator, run the daily KPI job, and assert the
five golden numbers the reference's EDA notebook records for 2024-05-25
(BASELINE.md).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.operators import trip_batch
from real_time_trip_processing_project_spark.sources import producer, sinks
from real_time_trip_processing_project_spark.streaming import jobs

REF_DATA = "/root/reference/data"
GOLDEN = {
    "total_fare": 274393.882557,
    "count_trips": 4999,
    "average_fare": 54.889754,
    "max_fare": 99.990127,
    "min_fare": 10.036695,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not available"
)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """Replay both CSVs through the full streaming pipeline once."""
    root = tmp_path_factory.mktemp("golden")
    start_dir, end_dir = str(root / "start"), str(root / "end")
    store_dir, orphan_dir = str(root / "trips"), str(root / "orphans")
    ckpt = str(root / "ckpt")
    producer.produce_trip_streams(
        f"{REF_DATA}/trip_start.csv",
        f"{REF_DATA}/trip_end.csv",
        start_dir,
        end_dir,
        n_files=4,
    )
    jobs.run_pipeline_to_completion(
        spark, start_dir, end_dir, store_dir, orphan_dir, ckpt
    )
    return store_dir


def test_golden_daily_kpis(spark, store, tmp_path):
    out_root = str(tmp_path / "kpis")
    path = jobs.daily_kpi_job(spark, store, "2024-05-25", out_root)
    assert path is not None and path.endswith("2024-05/2024-05-25.json")
    with open(path) as fh:
        doc = json.load(fh)
    m = doc["metrics"]
    assert m["count_trips"] == GOLDEN["count_trips"]
    for k in ("total_fare", "average_fare", "max_fare", "min_fare"):
        assert m[k] == pytest.approx(GOLDEN[k], rel=1e-6), k
    assert doc["date"] == "2024-05-25"
    assert "timestamp" in doc


def test_all_trips_complete(spark, store):
    cur = sinks.current_trips(spark, store)
    by_status = dict(
        cur.groupBy("status").count().rdd.map(tuple).collect()
    )
    assert by_status == {"Completed": 4999}


def test_cross_midnight_trips_group_by_pickup_date(spark, store):
    """114 reference trips end on 2024-05-26 but count toward 05-25
    (day assignment uses pickup/event time — README.md:34,44)."""
    cur = sinks.current_trips(spark, store)
    cross = cur.filter(
        (F.to_date("dropoff_datetime") == "2024-05-26")
        & (F.col("date") == "2024-05-25")
    )
    assert cross.count() == 114
    assert cur.filter(F.col("date") == "2024-05-26").count() == 0


def test_null_numerics_preserved_as_nulls(spark, store):
    """531 end events carry null rate_code/passenger_count/payment_type/
    trip_type; the reference silently drops them via Decimal(NaN)
    (SURVEY §3.2 note c) — the engine keeps them as SQL NULLs."""
    cur = sinks.current_trips(spark, store)
    assert cur.filter(F.col("rate_code").isNull()).count() == 531
    # and they still aggregate: count(*) counts them, count(col) skips them
    row = cur.agg(
        F.count("*").alias("n"), F.count("rate_code").alias("nn")
    ).collect()[0]
    assert row["n"] == 4999 and row["nn"] == 4999 - 531


def test_batch_correlate_matches_stream(spark, store):
    """The batch correlator (notebook pandas join) and the streaming state
    machine agree on the completed set."""
    from real_time_trip_processing_project_spark.sources.readers import (
        read_trip_end_csv,
        read_trip_start_csv,
    )

    start = read_trip_start_csv(spark, f"{REF_DATA}/trip_start.csv")
    end = read_trip_end_csv(spark, f"{REF_DATA}/trip_end.csv")
    batch = trip_batch.correlate_trips(start, end)
    stream_cur = sinks.current_trips(spark, store).filter(
        F.col("status") == "Completed"
    )
    assert batch.count() == stream_cur.count()
    got = trip_batch.daily_kpis(stream_cur).filter(
        F.col("date") == "2024-05-25"
    ).collect()[0]
    want = trip_batch.daily_kpis(batch).filter(
        F.col("date") == "2024-05-25"
    ).collect()[0]
    assert got["total_fare"] == pytest.approx(want["total_fare"], rel=1e-9)
    assert got["count_trips"] == want["count_trips"]
