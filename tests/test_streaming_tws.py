"""v2 arbitrary-state correlator (transformWithStateInPandas): the same
trip state machine hosted by the Spark 4 stateful-processor API must
emit exactly what the v1 applyInPandasWithState host emits on the same
replay — both the happy path and the out-of-order buffering path."""

from __future__ import annotations

import json
import os

import importlib.util

import pytest

from real_time_trip_processing_project_spark.streaming import (
    correlator as C,
    jobs,
)

ROCKSDB = jobs.ROCKSDB_PROVIDER

#: The v2 state protocol is protobuf-framed; this container ships no
#: protobuf, so the live-parity tests are environment-gated (they run
#: wherever the dependency exists — any real deployment).
try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="transformWithStateInPandas needs protobuf"
)


def _write_events(dirpath, name, events):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _drain(spark, df, out, ckpt):
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows(spark, path):
    return {
        tuple(r)
        for r in spark.read.schema(C.OUT_SCHEMA).parquet(str(path)).collect()
    }


@needs_protobuf
@pytest.mark.parametrize("mode", ["buffer", "drop"])
def test_v2_correlator_matches_v1(spark, tmp_path, mode):
    start_dir, end_dir = tmp_path / "start", tmp_path / "end"
    _write_events(
        start_dir,
        "w1.json",
        [
            {
                "trip_id": "a",
                "vendor_id": 1,
                "pickup_location_id": 7,
                "dropoff_location_id": 9,
                "pickup_datetime": "2024-05-25 10:00:00",
                "estimated_dropoff_datetime": "2024-05-25 10:30:00",
                "estimated_fare_amount": 12.5,
            },
            {
                "trip_id": "b",
                "vendor_id": 2,
                "pickup_location_id": 3,
                "dropoff_location_id": 4,
                "pickup_datetime": "2024-05-25 11:00:00",
                "estimated_dropoff_datetime": "2024-05-25 11:20:00",
                "estimated_fare_amount": 8.0,
            },
        ],
    )
    _write_events(
        end_dir,
        "w1.json",
        [
            # completes trip a; trip c's end has no start (buffer vs drop)
            {
                "trip_id": "a",
                "dropoff_datetime": "2024-05-25 10:25:00",
                "rate_code": 1.0,
                "passenger_count": 2.0,
                "trip_distance": 3.2,
                "fare_amount": 13.75,
                "tip_amount": 2.0,
                "payment_type": 1.0,
                "trip_type": 1.0,
            },
            {
                "trip_id": "c",
                "dropoff_datetime": "2024-05-25 12:00:00",
                "rate_code": 1.0,
                "passenger_count": 1.0,
                "trip_distance": 1.0,
                "fare_amount": 5.0,
                "tip_amount": 0.0,
                "payment_type": 2.0,
                "trip_type": 1.0,
            },
        ],
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        tagged1, _ = jobs.tagged_union_stream(
            spark, str(start_dir), str(end_dir)
        )
        _drain(
            spark,
            C.correlate_stream(tagged1, mode=mode),
            tmp_path / f"out-v1-{mode}",
            tmp_path / f"ck-v1-{mode}",
        )
        tagged2, _ = jobs.tagged_union_stream(
            spark, str(start_dir), str(end_dir)
        )
        _drain(
            spark,
            C.correlate_stream_v2(tagged2, mode=mode),
            tmp_path / f"out-v2-{mode}",
            tmp_path / f"ck-v2-{mode}",
        )
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    v1 = _rows(spark, tmp_path / f"out-v1-{mode}")
    v2 = _rows(spark, tmp_path / f"out-v2-{mode}")
    assert v1, "v1 emitted nothing"
    assert v2 == v1
    statuses = {r[-1] for r in v1}
    if mode == "drop":
        assert "Orphaned" in statuses
    assert {"Started", "Completed"} <= statuses


def test_v2_without_protobuf_raises_actionably(spark, tmp_path):
    """Where the protobuf dependency is absent, the v2 entry point must
    fail eagerly with a clear message (not an opaque driver-worker
    crash at query start)."""
    if _HAS_PROTOBUF:
        pytest.skip("protobuf present; gate untestable")
    start_dir, end_dir = tmp_path / "s", tmp_path / "e"
    _write_events(start_dir, "w.json", [])
    _write_events(end_dir, "w.json", [])
    tagged, _ = jobs.tagged_union_stream(spark, str(start_dir), str(end_dir))
    with pytest.raises(RuntimeError, match="protobuf"):
        C.correlate_stream_v2(tagged)


@needs_protobuf
def test_v2_state_persists_across_drains(spark, tmp_path):
    """An end arriving in a later micro-batch run must complete against
    the v2 ValueState persisted in the checkpoint (buffer mode)."""
    start_dir, end_dir = tmp_path / "start", tmp_path / "end"
    _write_events(
        start_dir,
        "w1.json",
        [
            {
                "trip_id": "x",
                "vendor_id": 1,
                "pickup_location_id": 1,
                "dropoff_location_id": 2,
                "pickup_datetime": "2024-05-25 09:00:00",
                "estimated_dropoff_datetime": "2024-05-25 09:30:00",
                "estimated_fare_amount": 10.0,
            }
        ],
    )
    end_dir.mkdir(parents=True, exist_ok=True)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    try:
        tagged, _ = jobs.tagged_union_stream(spark, str(start_dir), str(end_dir))
        _drain(spark, C.correlate_stream_v2(tagged), out, ckpt)
        first = _rows(spark, out)
        assert {r[-1] for r in first} == {"Started"}
        _write_events(
            end_dir,
            "w2.json",
            [
                {
                    "trip_id": "x",
                    "dropoff_datetime": "2024-05-25 09:25:00",
                    "rate_code": 1.0,
                    "passenger_count": 1.0,
                    "trip_distance": 2.0,
                    "fare_amount": 11.0,
                    "tip_amount": 1.0,
                    "payment_type": 1.0,
                    "trip_type": 1.0,
                }
            ],
        )
        tagged, _ = jobs.tagged_union_stream(spark, str(start_dir), str(end_dir))
        _drain(spark, C.correlate_stream_v2(tagged), out, ckpt)
        both = _rows(spark, out)
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    comp = [r for r in both if r[-1] == "Completed"]
    assert len(comp) == 1
    # merged row carries both start fields and end fields
    row = comp[0]
    assert row[0] == "x" and row[11] == 11.0  # fare_amount


@needs_protobuf
def test_rolling_zscore_v2_matches_batch(spark, tmp_path):
    """The v2 host of the rolling z-score kernel must reproduce the
    batch query's rows on a time-ordered replay, exactly like the v1
    host (same shared kernel; this pins the v2 plumbing)."""
    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    sf = "/root/testdata/sf0.001"
    events = load_fixture(spark, sf, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    rows = events.orderBy("ts", "event_id").collect()
    half = max(len(rows) // 2, 1)
    src = tmp_path / "src"
    src.mkdir()
    for i, chunk in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/b*")
        )
        out = jobs.rolling_zscore_stream_v2(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("zstream_v2")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = {
        (r.event_id, r.user_id, r.n_frame, r.z_num, r.z_den_var, r.is_outlier)
        for r in spark.table("zstream_v2").collect()
    }
    want = {
        (r.event_id, r.user_id, r.n_frame, r.z_num, r.z_den_var, r.is_outlier)
        for r in REGISTRY["events_rolling_zscore_outliers"]
        .fn(spark, sf)
        .collect()
    }
    assert got == want and want
