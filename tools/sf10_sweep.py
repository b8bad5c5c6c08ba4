"""Exhaustive sf10 secondary-tier sweep (r13 verdict item 8, stretch):
time every registered query once at sf0.1 AND sf10 in one session so
the catalogue-wide "no super-linear in actual input+output" claim is
backed by a complete table rather than a heaviest-first probe.

Per-query sf10 wall clamp via job-group cancellation (a codec query
over 5 M documents is linear per byte but minutes of CPU — a timeout
row documents the exclusion instead of stalling the sweep).

Usage: python tools/sf10_sweep.py [skip_csv] [cap_sec]
       skip_csv: comma-separated query names to skip (already measured)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF10 = "/root/repo/.localdata/sf10"


def main() -> None:
    skip = set(
        (sys.argv[1] if len(sys.argv) > 1 else "").split(",")
    ) - {""}
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 120

    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    spark = get_spark(app_name="sf10-sweep", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def timed(name: str, sf_dir: str, clamp: int) -> tuple[float | None, str]:
        group = f"sweep-{name}-{os.path.basename(sf_dir)}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        timer = threading.Timer(clamp, lambda: sc.cancelJobGroup(group))
        timer.start()
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 2), "ok"
        except Exception as e:
            el = time.perf_counter() - t0
            if el >= clamp - 1 or "cancelled" in str(e).lower():
                return None, f"timeout>{clamp}s"
            return None, f"error: {str(e)[:120]}"
        finally:
            timer.cancel()
            sc.setJobGroup("", "")

    names = [n for n in sorted(REGISTRY) if n not in skip]
    print(json.dumps({"n_queries": len(names), "cap_sec": cap}), flush=True)
    for name in names:
        t01, s01 = timed(name, SF01, max(cap // 2, 60))
        t10, s10 = timed(name, SF10, cap)
        slope = (
            round(t10 / t01, 1) if (t01 and t10 and t01 > 0.01) else None
        )
        print(
            json.dumps(
                {
                    "query": name,
                    "sf0.1_sec": t01,
                    "sf10_sec": t10,
                    "x100_slope": slope,
                    "status": s10 if s10 != "ok" else s01,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
