"""Clamped per-query timing probe at an arbitrary fixture dir — the
general form of sf10_sweep's timer for targeted A/Bs and the r15 sf30
third-decade slope probe (r14 verdict stretch item 8).

Usage: python tools/sf_probe.py SF_DIR QUERY_CSV [N_RUNS] [CAP_SEC]
Prints one JSON line per query:
  {"query": ..., "sf_dir": ..., "runs": [...], "min": ...}
A clamped/failed run records the error string in place of a time.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    qs = [q for q in sys.argv[2].split(",") if q]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 900

    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    spark = get_spark(app_name="sf-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for q in qs:
        runs: list[float | str] = []
        for i in range(n):
            group = f"probe-{q}-{i}"
            sc.setJobGroup(group, q, interruptOnCancel=True)
            timer = threading.Timer(cap, lambda: sc.cancelJobGroup(group))
            timer.start()
            t0 = time.perf_counter()
            try:
                REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 2))
            except Exception as e:
                el = time.perf_counter() - t0
                if el >= cap - 1 or "cancelled" in str(e).lower():
                    runs.append(f"timeout>{cap}s")
                else:
                    runs.append(f"error: {str(e)[:160]}")
                break
            finally:
                timer.cancel()
                sc.setJobGroup("", "")
        nums = [r for r in runs if isinstance(r, float)]
        print(
            json.dumps(
                {
                    "query": q,
                    "sf_dir": sf_dir,
                    "runs": runs,
                    "min": min(nums) if nums else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
