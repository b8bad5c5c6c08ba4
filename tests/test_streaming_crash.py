"""Crash consistency of the streaming sink (SURVEY.md §2.5 T1/S5):
kill the pipeline MID-micro-batch — after the first write of the
dual-sink pair, and after the single-action write — restart from the
same checkpoint, and assert the read view equals a never-killed run.

This is the failure mode the reference survives only by accident: its
Lambda can die between the DynamoDB upsert loop and the end of the
batch (trip_processor.py:82-89 swallows per-record errors; Kinesis
re-polls the shard), and DynamoDB's idempotent put_item absorbs the
re-delivery.  Here the same guarantee comes from append + version-stamp
+ dedup-on-read: a re-run batch rewrites byte-identical rows (the
``updated_at`` stamp is a pure function of batch_id and status), so
last-writer-wins picks the same winner whether the batch ran once or
1+retries times.

Mechanics: ``sinks._CRASH_HOOK`` raises at a named point inside the
foreachBatch body on its first invocation only.  Structured Streaming
has already WAL'd the batch's offsets but never commits the batch, so
the restarted query re-runs the SAME batch with the SAME batch_id —
the at-least-once half of the contract the sink's dedup-on-read closes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors import StreamingQueryException

from real_time_trip_processing_project_spark.sources import producer, sinks
from real_time_trip_processing_project_spark.streaming import jobs

from test_streaming_semantics import _end_event, _start_event


class _CrashOnce(Exception):
    pass


def _arm(point: str):
    """Arm the sink's fault seam to raise the first time ``point`` is hit."""
    fired = {"done": False}

    def hook(p: str, batch_id: int) -> None:
        if p == point and not fired["done"]:
            fired["done"] = True
            raise _CrashOnce(f"injected crash at {p} batch={batch_id}")

    sinks._CRASH_HOOK = hook
    return fired


def _write_sources(tmp_path, tag: str, n: int = 40, n_orphans: int = 6):
    """n start+end pairs plus n_orphans ends with no start ever."""
    sdir = str(tmp_path / tag / "start")
    edir = str(tmp_path / tag / "end")
    producer.write_stream_files([_start_event(i) for i in range(n)], sdir)
    ends = [_end_event(i) for i in range(n)]
    orphan_ends = []
    for i in range(n_orphans):
        e = _end_event(1000 + i)
        orphan_ends.append(e)
    producer.write_stream_files(ends + orphan_ends, edir)
    return sdir, edir


def _run(spark, tmp_path, tag: str, sdir: str, edir: str, mode: str):
    store = str(tmp_path / tag / "store")
    orph = str(tmp_path / tag / "orph")
    ckpt = str(tmp_path / tag / "ckpt")
    jobs.run_pipeline_to_completion(
        spark, sdir, edir, store, orph, ckpt, mode=mode
    )
    return store, orph, ckpt


def _current_rows(spark, store: str):
    return sorted(
        (r.trip_id, r.status)
        for r in sinks.current_trips(spark, store)
        .select("trip_id", "status")
        .collect()
    )


def _orphan_rows(spark, orph: str):
    try:
        df = spark.read.parquet(orph)
    except Exception:
        return []
    return sorted(r.trip_id for r in df.select("trip_id").distinct().collect())


@pytest.mark.parametrize(
    ("mode", "point"),
    [
        # drop mode runs the dual-sink path: crash lands after the trips
        # write but BEFORE the orphan write — the half-written batch.
        ("drop", "between_dual_writes"),
        # buffer mode runs the single-action path: crash lands after the
        # store write but before the batch commits — pure re-delivery.
        ("buffer", "after_store_write"),
    ],
)
def test_mid_batch_crash_then_restart_equals_clean_run(
    spark, tmp_path, mode, point
):
    sdir, edir = _write_sources(tmp_path, "src")

    # ---- reference: never-killed run on fresh dirs ----
    ref_store, ref_orph, _ = _run(spark, tmp_path, "ref", sdir, edir, mode)
    want_current = _current_rows(spark, ref_store)
    want_orphans = _orphan_rows(spark, ref_orph)
    assert want_current, "reference run produced no trips"
    if mode == "drop":
        assert want_orphans, "drop-mode reference run produced no orphans"

    # ---- crash run: same inputs, hook armed ----
    fired = _arm(point)
    try:
        with pytest.raises(StreamingQueryException):
            _run(spark, tmp_path, "crash", sdir, edir, mode)
    finally:
        sinks._CRASH_HOOK = None
    assert fired["done"], f"crash point {point!r} was never reached"

    store = str(tmp_path / "crash" / "store")
    orph = str(tmp_path / "crash" / "orph")
    ckpt = str(tmp_path / "crash" / "ckpt")

    # restart from the SAME checkpoint, hook disarmed — Structured
    # Streaming re-runs the uncommitted batch, the sink re-appends
    # identical rows, dedup-on-read converges.
    jobs.run_pipeline_to_completion(
        spark, sdir, edir, store, orph, ckpt, mode=mode
    )

    assert _current_rows(spark, store) == want_current
    assert _orphan_rows(spark, orph) == want_orphans

    # the store may legitimately hold physical duplicates from the
    # re-run batch — but every duplicate must be byte-identical on the
    # (trip_id, status, updated_at) key so last-writer-wins is stable.
    raw = spark.read.parquet(store)
    versions = (
        raw.groupBy("trip_id", "status")
        .agg(F.countDistinct("updated_at").alias("nv"))
        .filter("nv > 1")
        .count()
    )
    assert versions == 0


def test_crash_after_both_dual_writes_orphans_still_exactly_once(
    spark, tmp_path
):
    """Worst case for the orphan sink: the batch crashes AFTER both
    writes landed but before commit, so the retry re-appends BOTH.  The
    trips store converges by version-stamp dedup; the orphan quarantine
    must converge under ``distinct``-on-read because the re-run rows are
    byte-identical (same batch_id → same updated_at)."""
    sdir, edir = _write_sources(tmp_path, "src2")
    ref_store, ref_orph, _ = _run(spark, tmp_path, "ref2", sdir, edir, "drop")
    want_current = _current_rows(spark, ref_store)
    want_orphans = _orphan_rows(spark, ref_orph)

    # A crash after BOTH writes leaves no seam to raise from, so model
    # the retry directly: run the batch clean, then re-invoke the sink
    # body with batch 0's exact emitted rows and the same batch_id —
    # precisely the write set a post-both-writes restart re-appends.
    jobs.run_pipeline_to_completion(
        spark, sdir, edir,
        str(tmp_path / "c2" / "store"), str(tmp_path / "c2" / "orph"),
        str(tmp_path / "c2" / "ckpt"), mode="drop",
    )
    store, orph = str(tmp_path / "c2" / "store"), str(tmp_path / "c2" / "orph")
    # reconstruct batch 0's input from the clean run's own physical
    # output: the version stamp encodes batch_id*10 + status rank, so
    # unix_micros(updated_at) < 10 selects exactly batch 0's rows.
    raw = spark.read.parquet(store).filter(F.unix_micros("updated_at") < 10)
    orphans_raw = spark.read.parquet(orph).filter(
        F.unix_micros("updated_at") < 10
    )
    batch0 = raw.drop("updated_at").unionByName(
        orphans_raw.drop("updated_at").withColumn(
            "date", F.lit(None).cast("date")
        ),
        allowMissingColumns=True,
    )
    assert batch0.count() > 0, "batch-0 reconstruction came up empty"
    sinks.append_trip_batch(batch0, 0, store, orph, expect_orphans=True)

    assert _current_rows(spark, store) == want_current
    assert _orphan_rows(spark, orph) == want_orphans
