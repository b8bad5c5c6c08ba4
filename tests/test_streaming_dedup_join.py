"""Streaming dedup (dropDuplicatesWithinWatermark) and the watermarked
stream-stream interval join — both running as real Structured Streaming
queries over file-source micro-batches."""

from __future__ import annotations

import json

from real_time_trip_processing_project_spark.streaming import jobs

START = {
    "trip_id": "t1",
    "pickup_location_id": 7,
    "dropoff_location_id": 9,
    "vendor_id": 1,
    "pickup_datetime": "2024-05-25 10:00:00",
    "estimated_dropoff_datetime": "2024-05-25 10:30:00",
    "estimated_fare_amount": 12.5,
}
END = {
    "trip_id": "t1",
    "dropoff_datetime": "2024-05-25 10:25:00",
    "rate_code": 1.0,
    "passenger_count": 2.0,
    "trip_distance": 3.1,
    "fare_amount": 13.0,
    "tip_amount": 2.0,
    "payment_type": 1.0,
    "trip_type": 1.0,
}


def _write(dirpath, name, events):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _drain(df, ckpt, out_dir):
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_stream_drops_redelivered_records(spark, tmp_path):
    """Three deliveries of the same start + a distinct second trip in the
    same batch ⇒ exactly two rows survive."""
    start2 = dict(START, trip_id="t2", pickup_datetime="2024-05-25 10:05:00")
    _write(tmp_path / "start", "b1.json", [START, START, START, start2])
    _write(tmp_path / "end", "b1.json", [])
    tagged, _ = jobs.tagged_union_stream(
        spark, str(tmp_path / "start"), str(tmp_path / "end")
    )
    deduped = jobs.dedup_stream(tagged)
    _drain(deduped, tmp_path / "ckpt", tmp_path / "out")
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert sorted(r.trip_id for r in rows) == ["t1", "t2"]


def test_dedup_state_is_watermark_bounded(spark, tmp_path):
    """The bounded-state trade-off, pinned from both sides: (a) a
    redelivery with an event time BELOW the watermark is discarded as
    late data (never re-emitted); (b) a same-key record ABOVE the
    watermark arriving after the key's state expired is emitted again —
    state really was reclaimed, not kept forever."""
    _write(tmp_path / "start", "b1.json", [START])
    _write(tmp_path / "end", "b1.json", [])
    tagged, _ = jobs.tagged_union_stream(
        spark, str(tmp_path / "start"), str(tmp_path / "end")
    )
    deduped = jobs.dedup_stream(tagged, delay="10 minutes")
    _drain(deduped, tmp_path / "ckpt", tmp_path / "out")
    # advance the watermark far past t1's expiry (12:00 − 10m = 11:50)
    probe = dict(START, trip_id="t9", pickup_datetime="2024-05-25 12:00:00")
    _write(tmp_path / "start", "b2.json", [probe])
    _drain(deduped, tmp_path / "ckpt", tmp_path / "out")
    # (a) stale redelivery (10:00 < watermark) → dropped as late;
    # (b) fresh same-key record (11:55 ≥ watermark, state expired) → emitted
    fresh_again = dict(START, pickup_datetime="2024-05-25 11:55:00")
    _write(tmp_path / "start", "b3.json", [START, fresh_again])
    _drain(deduped, tmp_path / "ckpt", tmp_path / "out")
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert sorted(r.trip_id for r in rows) == ["t1", "t1", "t9"]
    assert sorted(str(r.event_ts) for r in rows if r.trip_id == "t1") == [
        "2024-05-25 10:00:00",
        "2024-05-25 11:55:00",
    ]


def test_interval_join_matches_ends_within_bound(spark, tmp_path):
    """An end 25 min after its start joins; an end 5 h after its start
    (outside max_trip=4h) never emits."""
    slow_start = dict(START, trip_id="t3", pickup_datetime="2024-05-25 09:00:00")
    slow_end = dict(
        END, trip_id="t3", dropoff_datetime="2024-05-25 14:00:00"
    )  # 5h later
    _write(tmp_path / "start", "b1.json", [START, slow_start])
    _write(tmp_path / "end", "b1.json", [END, slow_end])
    tagged, _ = jobs.tagged_union_stream(
        spark, str(tmp_path / "start"), str(tmp_path / "end")
    )
    joined = jobs.interval_join_streams(tagged)
    _drain(joined, tmp_path / "ckpt", tmp_path / "out")
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert [r.trip_id for r in rows] == ["t1"]
    assert rows[0].fare_amount == 13.0 and rows[0].pickup_location_id == 7


def test_joined_daily_kpis_stream(spark, tmp_path):
    """Chained stateful operators (interval join → daily tumbling agg):
    two completed trips on day 1 aggregate into one finalized window row
    once the watermark passes the day boundary."""
    t2s = dict(
        START, trip_id="t2", pickup_datetime="2024-05-25 11:00:00"
    )
    t2e = dict(
        END, trip_id="t2", dropoff_datetime="2024-05-25 11:40:00",
        fare_amount=7.0,
    )
    _write(tmp_path / "start", "b1.json", [START, t2s])
    _write(tmp_path / "end", "b1.json", [END, t2e])
    tagged, _ = jobs.tagged_union_stream(
        spark, str(tmp_path / "start"), str(tmp_path / "end")
    )
    kpis = jobs.joined_daily_kpis_stream(tagged)
    _drain(kpis, tmp_path / "ckpt", tmp_path / "out")
    # advance both watermarks past day-1 end (+31 min delay margin)
    probe_s = dict(
        START, trip_id="t9", pickup_datetime="2024-05-27 12:00:00"
    )
    probe_e = dict(
        END, trip_id="t9", dropoff_datetime="2024-05-27 12:10:00"
    )
    _write(tmp_path / "start", "b2.json", [probe_s])
    _write(tmp_path / "end", "b2.json", [probe_e])
    _drain(kpis, tmp_path / "ckpt", tmp_path / "out")
    rows = {
        str(r.date): r for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert "2024-05-25" in rows
    day = rows["2024-05-25"]
    assert day.n_trips == 2
    assert day.total_fare == 20.0  # 13.00 + 7.00, exact through cents
    assert day.max_fare == 13.0
