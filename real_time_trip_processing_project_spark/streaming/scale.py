"""Sustained long-lived streaming replay — the shared core behind
``tools/stream_scale.py`` (the 10 M-event scale probe, SCALE.md r14)
and ``bench.py``'s per-round sustained gate (r14 verdict item 5: the
bench's 70 k-event steady-state window was the weakest streaming number
on file, so sustained throughput and the bounded-state curve are now
regression-gated every round instead of measured once).

Method (unchanged from the r14 probe): the reference's 9,998 trip
events are replayed as W disjoint trip-id waves (one start + one end
JSON file per wave, written by a token-replace over pre-serialized base
bodies so producing millions of events takes seconds), then ONE
``availableNow`` correlator query drains everything at
``max_files_per_trigger`` files per source per trigger.  Per-batch
rates and state-store size come from the query's own progress metrics.

The boundedness signal: with key-group state, ``numRowsTotal`` is
pinned at ``key_groups``, so the curve that must plateau is the store's
MEMORY — each group's dict holds open + recently-completed trips and
eviction must cap it by the horizon, not the replay volume.  The
assertion compares the final third of the memory curve against the mid
third (>10% growth ⇒ unbounded).
"""

from __future__ import annotations

import json
import os
import time

_TOKEN = "WAVETOKEN"


def produce_waves_fast(
    start_csv: str, end_csv: str, start_dir: str, end_dir: str, waves: int
) -> int:
    """W waves × (1 start file + 1 end file): serialize the base rows
    ONCE with a trip-id prefix token, then write each wave as one
    string-replace of the whole file body.  Returns total event count."""
    from real_time_trip_processing_project_spark.sources.producer import (
        _rows_from_csv,
    )

    total = 0
    for csv_path, out_dir in ((start_csv, start_dir), (end_csv, end_dir)):
        rows = _rows_from_csv(csv_path)
        base = "\n".join(
            json.dumps({**r, "trip_id": f"{_TOKEN}-{r['trip_id']}"})
            for r in rows
        ) + "\n"
        os.makedirs(out_dir, exist_ok=True)
        for w in range(waves):
            with open(
                os.path.join(out_dir, f"w{w:04d}-00000.json"), "w"
            ) as f:
                f.write(base.replace(_TOKEN, f"w{w:04d}"))
        total += len(rows) * waves
    return total


def sustained_replay(
    spark,
    root: str,
    waves: int,
    max_files: int = 20,
    state_store: str = "hdfs",
    ref: str = "/root/reference/data",
    key_groups: int = 16,
) -> tuple[dict, list[dict]]:
    """Produce ``waves`` waves under ``root`` and drain them through one
    long-lived correlator query.  Returns (summary, per-batch list);
    ``summary["state_bounded"]`` is the plateau assertion.

    Caller owns ``root`` (created, cleaned up) and the session's
    shuffle-partition / noDataMicroBatches settings — this function
    only sets the progress-retention knob it needs to see every batch.
    """
    from real_time_trip_processing_project_spark.streaming import jobs

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")
    t0 = time.perf_counter()
    n_events = produce_waves_fast(
        f"{ref}/trip_start.csv", f"{ref}/trip_end.csv",
        os.path.join(root, "start"), os.path.join(root, "end"), waves,
    )
    produce_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    pq = jobs.start_trip_pipeline(
        spark,
        os.path.join(root, "start"), os.path.join(root, "end"),
        os.path.join(root, "store"), os.path.join(root, "orphans"),
        os.path.join(root, "ckpt"),
        key_groups=key_groups, available_now=True,
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
    tail = batches[1:]  # batch 0 = plan + codegen + store open
    rows = sum(b["rows"] for b in tail)
    ms = sum(b["ms"] for b in tail)
    mem_curve = [b["state_mb"] for b in batches if b["state_mb"]]
    third = max(1, len(mem_curve) // 3)
    summary = {
        "events": n_events,
        "waves": waves,
        "produce_sec": round(produce_sec, 1),
        "batches": len(batches),
        "wall_sec": round(wall, 1),
        "sustained_ev_per_sec": (
            round(1000.0 * rows / ms, 1) if ms else None
        ),
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
    if len(mem_curve) < 9:
        # too short to split into meaningful thirds: a smoke-scale burn
        # (bench's 24-wave sf0.001 run yields ~3 batches) is still in
        # the state-store FILL phase, so a false here would read as
        # "unbounded" when the honest verdict is "not enough curve".
        # None = no verdict; the canonical sf0.1/sf10 gates always run
        # ≥ 15 batches.
        summary["state_bounded"] = None
    else:
        bounded = (
            summary["state_mb_final_third_max"] is not None
            and summary["state_mb_final_third_max"]
            <= 1.1 * summary["state_mb_mid_third_max"]
        )
        summary["state_bounded"] = bool(bounded)
    return summary, batches
