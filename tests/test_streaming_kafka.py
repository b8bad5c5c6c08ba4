"""Kafka-framed source decode (S3/S4 production mapping), RocksDB state
store, and the post-KPI compaction hook.

The Kafka decode path is connector-independent: ``decode_kafka_records``
takes any DataFrame with the Kafka wire columns (topic, key, value), so
it is driven here by injected frames — batch for value-level checks, a
text-stream wrapped into the wire shape for the end-to-end correlator
equivalence — with no broker needed.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.sources import producer, sinks
from real_time_trip_processing_project_spark.streaming import correlator as C
from real_time_trip_processing_project_spark.streaming import jobs

from tests.test_streaming_semantics import _dirs, _drain, _end_event, _start_event


def _kafka_rows(events: list[dict], topic: str) -> list[tuple]:
    """(topic, key, value) rows in the Kafka wire shape: key = trip id
    (the reference's Kinesis PartitionKey — send_to_kinesis.py:56),
    value = JSON payload."""
    return [
        (
            topic,
            (e.get("trip_id") or "").encode(),
            json.dumps(e).encode(),
        )
        for e in events
    ]


KAFKA_WIRE = "topic STRING, key BINARY, value BINARY"


def test_kafka_decode_matches_wire_semantics(spark):
    """Batch-injected Kafka frame: valid records decode to the tagged
    union schema with correct types; malformed payloads, key-less records
    and null values (tombstones) route to quarantine."""
    starts = [_start_event(i) for i in range(3)]
    ends = [_end_event(i) for i in range(3)]
    rows = _kafka_rows(starts, "trip-start") + _kafka_rows(ends, "trip-end")
    rows.append(("trip-start", b"tbad", b'{"trip_id": "tbad", "vendor_id": OOPS}'))
    rows.append(("trip-start", b"", b'{"pickup_location_id": 7}'))
    rows.append(("trip-end", b"t0", None))
    df = spark.createDataFrame(rows, KAFKA_WIRE)

    tagged, quarantine = jobs.decode_kafka_records(df)
    assert [f.name for f in tagged.schema.fields] == [
        f.name for f in C.WIRE_SCHEMA.fields
    ]
    got = tagged.collect()
    assert len(got) == 6
    by_type = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type["trip_start"]) == 3
    assert len(by_type["trip_end"]) == 3
    s0 = next(r for r in by_type["trip_start"] if r["trip_id"] == "t0000")
    assert s0["estimated_fare_amount"] == pytest.approx(10.0)
    e0 = next(r for r in by_type["trip_end"] if r["trip_id"] == "t0000")
    assert e0["fare_amount"] == pytest.approx(20.0)

    bad = quarantine.collect()
    assert len(bad) == 3
    assert {r["stream"] for r in bad} == {"trip_start", "trip_end"}
    # the malformed payload is preserved verbatim for replay
    assert any(r["raw"] and "OOPS" in r["raw"] for r in bad)


def test_kafka_wire_stream_matches_file_pipeline(spark, tmp_path):
    """End-to-end: the same events through (a) the file-source pipeline
    and (b) a Kafka-wire-shaped stream → decode_kafka_records → the
    correlator must land the identical current-trips state."""
    n = 8
    starts = [_start_event(i) for i in range(n)]
    ends = [_end_event(i) for i in range(n)]

    # (a) file path
    file_dirs = _dirs(tmp_path / "file")
    (tmp_path / "file").mkdir(exist_ok=True)
    start_dir, end_dir, store_a, _, _ = file_dirs
    producer.write_stream_files(starts, start_dir)
    producer.write_stream_files(ends, end_dir)
    _drain(spark, file_dirs)

    # (b) kafka-wire path: text streams wrapped into the wire shape
    kroot = tmp_path / "kafka"
    kroot.mkdir()
    stext, etext = str(kroot / "stext"), str(kroot / "etext")
    producer.write_stream_files(starts, stext)
    producer.write_stream_files(ends, etext)
    store_b = str(kroot / "store")
    orphan_b = str(kroot / "orphans")
    ckpt_b = str(kroot / "ckpt")

    def _as_kafka(path: str, topic: str):
        return spark.readStream.text(path).select(
            F.lit(topic).alias("topic"),
            F.encode(F.get_json_object("value", "$.trip_id"), "UTF-8").alias(
                "key"
            ),
            F.encode("value", "UTF-8").alias("value"),
        )

    frames = _as_kafka(stext, "trip-start").unionByName(
        _as_kafka(etext, "trip-end")
    )
    tagged, _ = jobs.decode_kafka_records(frames)
    trips = C.correlate_stream(tagged)
    q = (
        trips.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt_b)
        .foreachBatch(
            lambda df, bid: sinks.append_trip_batch(df, bid, store_b, orphan_b)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    key = lambda r: (r["trip_id"], r["status"], r["fare_amount"], str(r["date"]))
    via_files = {key(r) for r in sinks.current_trips(spark, store_a).collect()}
    via_kafka = {key(r) for r in sinks.current_trips(spark, store_b).collect()}
    assert via_files and via_kafka == via_files


def test_rocksdb_state_store_pipeline(spark, tmp_path):
    """The correlator pipeline must run green on the RocksDB state store
    provider (the 100 TB configuration) and produce the same completed
    set as the default provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    dirs = _dirs(tmp_path)
    start_dir, end_dir, store, orphans, ckpt = dirs
    n = 6
    producer.write_stream_files([_start_event(i) for i in range(n)], start_dir)
    producer.write_stream_files([_end_event(i) for i in range(n)], end_dir)
    try:
        jobs.run_pipeline_to_completion(
            spark, start_dir, end_dir, store, orphans, ckpt,
            state_store="rocksdb",
        )
        assert spark.conf.get(key) == jobs.ROCKSDB_PROVIDER
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    cur = sinks.current_trips(spark, store)
    by_status = {
        r["status"]: r["count"] for r in cur.groupBy("status").count().collect()
    }
    assert by_status == {"Completed": n}

    with pytest.raises(ValueError):
        jobs.start_trip_pipeline(
            spark, start_dir, end_dir, store, orphans, ckpt,
            state_store="dynamo",
        )


def test_daily_kpi_job_compacts_target_partition(spark, tmp_path):
    """daily_kpi_job(compact_to=...) writes the KPI document AND rewrites
    the day's partition to one row per trip; the compacted copy yields
    identical current-trips rows and identical KPIs."""
    dirs = _dirs(tmp_path)
    start_dir, end_dir, store, _, _ = dirs
    n = 6
    producer.write_stream_files([_start_event(i) for i in range(n)], start_dir)
    producer.write_stream_files([], end_dir)
    _drain(spark, dirs)
    producer.write_stream_files([_end_event(i) for i in range(n)], end_dir, prefix="e")
    _drain(spark, dirs)
    assert spark.read.parquet(store).count() == 2 * n  # append versions

    compacted = str(tmp_path / "compacted")
    out_root = str(tmp_path / "kpis")
    path = jobs.daily_kpi_job(
        spark, store, "2024-05-25", out_root, compact_to=compacted
    )
    assert path is not None
    with open(path) as fh:
        doc = json.load(fh)
    assert doc["metrics"]["count_trips"] == n

    assert spark.read.parquet(compacted).count() == n  # one row per trip
    key = lambda r: (r["trip_id"], r["status"], r["fare_amount"])
    before = {key(r) for r in sinks.current_trips(spark, store).collect()}
    after = {key(r) for r in sinks.current_trips(spark, compacted).collect()}
    assert before == after

    path2 = jobs.daily_kpi_job(
        spark, compacted, "2024-05-25", str(tmp_path / "kpis2")
    )
    with open(path2) as fh:
        doc2 = json.load(fh)
    assert doc2["metrics"] == doc["metrics"]
