"""Streaming knee sweep (r8 verdict item #2): steady-state events/sec
across key_groups × batch-size × state-store at 32 cores, to either
adopt a faster pipeline configuration or justify the current one
(key_groups=16, maxFilesPerTrigger=8, HDFS-backed state).

Method = bench.py's steady-state block: replay the reference's 9,998
trip events as 9 disjoint waves through ONE long-lived availableNow
query, read per-batch rates from the query's own progress metrics with
batch 0 (plan + codegen + state-store open) excluded.  Scratch on
/dev/shm so virtio-disk fsyncs don't bill to the configuration.

Usage: python tools/stream_knee.py [--quick]   → JSON lines + md table
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/data"


def measure(spark, key_groups: int, max_files: int, state_store: str,
            waves: int = 9, n_files: int = 4) -> dict:
    """One configuration → steady-state ev/s (cold batch 0 excluded)."""
    from real_time_trip_processing_project_spark.sources import producer
    from real_time_trip_processing_project_spark.streaming import jobs

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="knee-", dir=shm)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nd = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    try:
        wdirs = {m: os.path.join(root, m) for m in ("start", "end")}
        producer.produce_trip_waves(
            f"{REF}/trip_start.csv", f"{REF}/trip_end.csv",
            wdirs["start"], wdirs["end"], waves=waves, n_files=n_files,
        )
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
        pq = jobs.start_trip_pipeline(
            spark,
            wdirs["start"], wdirs["end"],
            os.path.join(root, "store"),
            os.path.join(root, "orphans"),
            os.path.join(root, "ckpt"),
            key_groups=key_groups, available_now=True,
            max_files_per_trigger=max_files, evict_completed_after=2,
            state_store=state_store,
        )
        pq.await_termination()
        progs = [json.loads(str(x)) for x in pq.main.recentProgress]
        tail = [x for x in progs[1:] if x.get("numInputRows")]
        rows = sum(x["numInputRows"] for x in tail)
        ms = sum(x["durationMs"]["triggerExecution"] for x in tail)
        return {
            "key_groups": key_groups,
            "max_files_per_trigger": max_files,
            "state_store": state_store,
            "batches": len(tail),
            "rows": rows,
            "steady_ev_per_sec": round(1000.0 * rows / ms, 1) if ms else None,
            "mean_batch_ms": round(ms / len(tail), 1) if tail else None,
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nd
        )
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from real_time_trip_processing_project_spark.session import get_spark

    quick = "--quick" in sys.argv
    spark = get_spark(app_name="stream-knee")
    spark.sparkContext.setLogLevel("ERROR")

    grid = []
    for kg in (16, 32, 64):
        for mf in (4, 8, 16):
            grid.append((kg, mf, "hdfs"))
    # RocksDB only at the current operating point and its neighbors —
    # the provider question is orthogonal to the grid shape
    for kg in (16, 32):
        grid.append((kg, 8, "rocksdb"))
    if quick:
        grid = [(16, 8, "hdfs"), (32, 8, "hdfs"), (16, 8, "rocksdb")]

    results = []
    for kg, mf, ss in grid:
        r = measure(spark, kg, mf, ss)
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\n| key_groups | maxFiles/trigger | state store | steady ev/s | mean batch ms |")
    print("|---|---|---|---|---|")
    for r in sorted(results, key=lambda r: -(r["steady_ev_per_sec"] or 0)):
        print(
            f"| {r['key_groups']} | {r['max_files_per_trigger']} "
            f"| {r['state_store']} | {r['steady_ev_per_sec']} "
            f"| {r['mean_batch_ms']} |"
        )


if __name__ == "__main__":
    main()
