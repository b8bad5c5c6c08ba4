"""Streaming at sf10-like scale (r13 verdict item 5): one long-lived
correlator run over a 10 M-event replay with bounded state eviction
active, recording sustained events/sec AND the state-store size curve
per micro-batch — the evidence that state stays bounded (plateau, not
monotonic growth) over a run three orders of magnitude past the bench's
70 k-event steady-state window.

Method: the reference's 9,998 trip events are replayed as W disjoint
trip-id waves (one start + one end JSON file per wave, written by a
token-replace over pre-serialized base files so producing 10 M events
takes seconds, not minutes).  ONE availableNow query drains everything
at ``max_files_per_trigger`` files per source per trigger (= MF waves
per micro-batch); per-batch rates and state-operator rows/bytes come
from the query's own progress metrics (retention raised to cover every
batch).  Scratch on /dev/shm so virtio fsyncs don't bill to the engine.

Usage: python tools/stream_scale.py [waves] [max_files] [state_store]
       defaults: 1000 20 hdfs   (≈ 10 M events, ≈ 50 micro-batches)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/data"
TOKEN = "WAVETOKEN"


def produce_waves_fast(
    start_csv: str, end_csv: str, start_dir: str, end_dir: str, waves: int
) -> int:
    """W waves × (1 start file + 1 end file): serialize the base rows
    ONCE with a trip-id prefix token, then write each wave as one
    string-replace of the whole file body."""
    from real_time_trip_processing_project_spark.sources.producer import (
        _rows_from_csv,
    )

    total = 0
    for csv_path, out_dir in ((start_csv, start_dir), (end_csv, end_dir)):
        rows = _rows_from_csv(csv_path)
        base = "\n".join(
            json.dumps({**r, "trip_id": f"{TOKEN}-{r['trip_id']}"})
            for r in rows
        ) + "\n"
        os.makedirs(out_dir, exist_ok=True)
        for w in range(waves):
            with open(os.path.join(out_dir, f"w{w:04d}-00000.json"), "w") as f:
                f.write(base.replace(TOKEN, f"w{w:04d}"))
        total += len(rows) * waves
    return total


def main() -> None:
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    max_files = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    state_store = sys.argv[3] if len(sys.argv) > 3 else "hdfs"

    from real_time_trip_processing_project_spark.session import get_spark
    from real_time_trip_processing_project_spark.streaming import jobs

    spark = get_spark(app_name="stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    # keep EVERY batch's progress (default retention is 100)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="stream-scale-", dir=shm)
    try:
        t0 = time.perf_counter()
        n_events = produce_waves_fast(
            f"{REF}/trip_start.csv", f"{REF}/trip_end.csv",
            os.path.join(root, "start"), os.path.join(root, "end"), waves,
        )
        produce_sec = time.perf_counter() - t0
        print(
            json.dumps(
                {"events": n_events, "waves": waves,
                 "produce_sec": round(produce_sec, 1)}
            ),
            flush=True,
        )

        t0 = time.perf_counter()
        pq = jobs.start_trip_pipeline(
            spark,
            os.path.join(root, "start"), os.path.join(root, "end"),
            os.path.join(root, "store"), os.path.join(root, "orphans"),
            os.path.join(root, "ckpt"),
            key_groups=16, available_now=True,
            max_files_per_trigger=max_files, evict_completed_after=2,
            state_store=state_store,
        )
        pq.await_termination()
        wall = time.perf_counter() - t0

        progs = [json.loads(str(x)) for x in pq.main.recentProgress]
        batches = []
        for p in progs:
            rows = p.get("numInputRows") or 0
            if not rows:
                continue
            ms = p["durationMs"]["triggerExecution"]
            st = (p.get("stateOperators") or [{}])[0]
            batches.append(
                {
                    "batch": p["batchId"],
                    "rows": rows,
                    "ms": ms,
                    "ev_s": round(1000.0 * rows / ms, 1),
                    "state_rows": st.get("numRowsTotal"),
                    "state_mb": round(
                        (st.get("memoryUsedBytes") or 0) / 1e6, 1
                    ),
                }
            )
        for b in batches:
            print(json.dumps(b), flush=True)

        tail = batches[1:]  # batch 0 = plan + codegen + store open
        rows = sum(b["rows"] for b in tail)
        ms = sum(b["ms"] for b in tail)
        # with key-group state, numRowsTotal is pinned at key_groups —
        # the boundedness signal is the store's MEMORY curve (each
        # group's dict holds open + recently-completed trips; eviction
        # must plateau it)
        mem_curve = [b["state_mb"] for b in batches if b["state_mb"]]
        third = max(1, len(mem_curve) // 3)
        summary = {
            "events": n_events,
            "batches": len(batches),
            "wall_sec": round(wall, 1),
            "sustained_ev_per_sec": round(1000.0 * rows / ms, 1),
            "wall_ev_per_sec": round(n_events / wall, 1),
            "state_rows_max": max(
                (b["state_rows"] for b in batches if b["state_rows"]),
                default=None,
            ),
            "state_mb_last": mem_curve[-1] if mem_curve else None,
            "state_mb_mid_third_max": (
                max(mem_curve[third : 2 * third]) if mem_curve else None
            ),
            "state_mb_final_third_max": (
                max(mem_curve[2 * third :]) if mem_curve else None
            ),
            "state_mb_max": max(mem_curve, default=None),
        }
        # bounded-state assertion: the final third's memory never
        # exceeds the mid third's by more than 10% — a monotonically
        # growing store fails this
        bounded = (
            summary["state_mb_final_third_max"] is not None
            and summary["state_mb_final_third_max"]
            <= 1.1 * summary["state_mb_mid_third_max"]
        )
        summary["state_bounded"] = bool(bounded)
        print(json.dumps(summary), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
