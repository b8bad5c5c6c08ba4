"""Watermarked streaming aggregation (T3/T6 streaming-native): event-time
tumbling windows with late-data handling running as a real Structured
Streaming query over file-source micro-batches.

Each wave of files is drained with its own availableNow run sharing one
checkpoint — the watermark persists in the checkpoint, so wave N+1 sees
the watermark advanced by wave N (deterministic micro-batch boundaries).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

WIRE = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _write(dirpath, name, events):
    dirpath.mkdir(parents=True, exist_ok=True)
    with open(dirpath / name, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _drain(spark, src_dir, ckpt, out_dir):
    q = (
        spark.readStream.schema(WIRE)
        .json(str(src_dir))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_finalizes_windows_and_drops_too_late(spark, tmp_path):
    """Append mode emits a window only once the watermark passes its end;
    an event older than (max event time − 1h watermark) is discarded
    rather than mutating an already-finalized window — the streaming
    formalization of the reference's 'events may not be perfectly
    ordered' constraint (spec p.2)."""
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"
    # wave 1: two events in the 10:00 window
    _write(src, "b1.json", [
        {"event_id": 1, "ts": "2024-05-25 10:10:00", "value": 1.0},
        {"event_id": 2, "ts": "2024-05-25 10:40:00", "value": 2.0},
    ])
    _drain(spark, src, ckpt, out)
    # wave 2: event time jumps to 13:05 → watermark 12:05 finalizes 10:00
    _write(src, "b2.json", [
        {"event_id": 3, "ts": "2024-05-25 13:05:00", "value": 4.0},
    ])
    _drain(spark, src, ckpt, out)
    # wave 3: a too-late straggler for the finalized 10:00 window + an
    # on-time event for 13:00
    _write(src, "b3.json", [
        {"event_id": 4, "ts": "2024-05-25 10:55:00", "value": 100.0},
        {"event_id": 5, "ts": "2024-05-25 13:20:00", "value": 8.0},
    ])
    _drain(spark, src, ckpt, out)

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files, "streaming sink wrote no output"
    rows = {
        str(r["window_start"]): (r["n"], r["total"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # the 10:00 window was finalized with the two on-time events only —
    # the value=100.0 straggler was dropped by the watermark
    assert rows.get("2024-05-25 10:00:00") == (2, 3.0)
    # the 13:00 window is not yet emitted (watermark hasn't passed 14:00)
    assert "2024-05-25 13:00:00" not in rows



def test_session_activity_stream_matches_batch_twin(spark, tmp_path):
    """T11: streaming session_window parity — every session the
    watermarked stream emits must be identical to the batch
    session_window over the same files, and the only sessions the
    stream may withhold are those the final watermark had not closed.
    Controlled timeline: three vendor-1 sessions + one vendor-2
    session, with a late tail event that pushes the watermark past all
    of them."""
    import json as _json

    from real_time_trip_processing_project_spark.streaming import jobs

    start_dir, end_dir = tmp_path / "start", tmp_path / "end"
    start_dir.mkdir(); end_dir.mkdir()

    def ev(vendor, hhmm, fare=10.0, i=[0]):
        i[0] += 1
        return {
            "trip_id": f"t{i[0]}", "vendor_id": vendor,
            "pickup_location_id": 1, "dropoff_location_id": 2,
            "pickup_datetime": f"2024-05-25 {hhmm}:00",
            "estimated_dropoff_datetime": f"2024-05-25 {hhmm}:59",
            "estimated_fare_amount": fare,
        }

    events = (
        # vendor 1, session A: 10:00-10:10 (gap 30 min closes at 10:40)
        [ev(1, "10:00"), ev(1, "10:10")]
        # vendor 1, session B: 12:00 alone
        + [ev(1, "12:00", fare=20.5)]
        # vendor 2, session C: 11:00-11:20
        + [ev(2, "11:00"), ev(2, "11:15"), ev(2, "11:20")]
        # late tail: advances watermark to 22:00-30min=21:30 — far past
        # every earlier session's close; its own session stays open
        + [ev(1, "22:00")]
    )
    with open(start_dir / "w1.json", "w") as fh:
        for e in events:
            fh.write(_json.dumps(e) + "\n")
    # end stream: one valid no-op record so the source dir is non-empty
    with open(end_dir / "w1.json", "w") as fh:
        fh.write(_json.dumps({"trip_id": "t1",
                              "dropoff_datetime": "2024-05-25 10:30:00",
                              "fare_amount": 9.0}) + "\n")

    tagged_s, _ = jobs.tagged_union_stream(spark, str(start_dir), str(end_dir))
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        jobs.session_activity_stream(tagged_s)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.vendor_id, str(r.session_start), str(r.session_end), r.n_trips,
         r.est_fare_total)
        for r in spark.read.parquet(str(out)).collect()
    }
    want_all = {
        (r.vendor_id, str(r.session_start), str(r.session_end), r.n_trips,
         r.est_fare_total)
        for r in jobs.session_activity_stream(
            jobs.tagged_union_batch(spark, str(start_dir), str(end_dir))
        ).collect()
    }
    # batch twin sees 4 sessions; the stream withholds exactly the one
    # the final watermark (21:30) had not closed (the 22:00 tail)
    assert len(want_all) == 4
    open_tail = {w for w in want_all if w[1].startswith("2024-05-25 22:")}
    assert len(open_tail) == 1
    assert got == want_all - open_tail, (got, want_all)
    # session merge semantics: vendor-1 session A spans both events and
    # ends gap past the last one
    a = [g for g in got if g[0] == 1 and g[1] == "2024-05-25 10:00:00"][0]
    assert a[2] == "2024-05-25 10:40:00" and a[3] == 2
