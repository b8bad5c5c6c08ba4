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
