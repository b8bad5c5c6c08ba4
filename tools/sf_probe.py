"""Clamped per-query timing probe at an arbitrary fixture dir — the
general form of sf10_sweep's timer for targeted A/Bs and the r15 sf30
third-decade slope probe (r14 verdict stretch item 8).

Usage: python tools/sf_probe.py SF_DIR QUERY_CSV [N_RUNS] [CAP_SEC]
       [--isolate] [--prewarm]
Prints one JSON line per query:
  {"query": ..., "sf_dir": ..., "runs": [...], "min": ...,
   "steal_pct_max": [...]}
A clamped/failed run records the error string in place of a time.
``steal_pct_max`` carries the per-run contention tape (max CPU steal%
sampled from /proc/stat at 10 s cadence while the run was timed;
null for runs shorter than one sample): >~5 on the min run means the
row is an upper bound, not a quiet-box number — the r17 discipline
that replaced the uptime bracket, which cannot tell host-tenant
contention from our own just-finished 32-core load.

``--isolate`` (r15 verdict item 6 — probe-cancellation honesty): run
each query in its OWN subprocess/JVM.  In local mode a cancelled
CPU-bound task can outlive ``cancelJobGroup`` by minutes (interpreted
TimSort/HOF loops rarely check interrupts) and a long session
accumulates shuffle files until ShuffleDependency GC — both pollute
successor measurements by up to ~2× (SCALE.md r15 caveats).  A fresh
JVM per query pays ~20 s startup (excluded from the timed runs — the
timer starts after the session is up) and removes both pollution
sources, so isolated sweep rows are directly comparable to paired
A/B numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _StealTape:
    """Samples /proc/stat CPU steal% while a run is timed.

    r17 finding (SCALE.md "fourth-decade row"): this box takes periodic
    external load spikes (~10-min cadence, host tenants) that an uptime
    bracket cannot attribute — a just-finished local[32] run leaves
    1-min load at ~26 all by itself.  Steal jiffies are the one signal
    that separates host contention from our own work, so every probe
    row now carries its own contention evidence: ``steal_pct_max`` per
    run; > ~5% during a timed run ⇒ treat the time as an upper bound.
    """

    def __init__(self, interval: float = 10.0):
        self._interval = interval
        self._samples: list[float] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @staticmethod
    def _read() -> tuple[int, int] | None:
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            total = sum(int(x) for x in parts[1:9])
            return int(parts[8]), total  # steal, total
        except (OSError, IndexError, ValueError):
            return None

    def _loop(self) -> None:
        prev = self._read()
        while not self._stop.wait(self._interval):
            cur = self._read()
            if prev and cur and cur[1] > prev[1]:
                self._samples.append(
                    100.0 * (cur[0] - prev[0]) / (cur[1] - prev[1])
                )
            prev = cur

    def __enter__(self) -> "_StealTape":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1)

    @property
    def max_pct(self) -> float | None:
        return round(max(self._samples), 1) if self._samples else None


def _isolated(sf_dir: str, qs: list[str], n: int, cap: int) -> None:
    """One subprocess (its own JVM, its own shuffle dirs) per query;
    relay each child's JSON line.  A child that dies without printing
    (OOM kill, JVM abort) records an error row instead of silence."""
    extra = ["--prewarm"] if "--prewarm" in sys.argv else []
    for q in qs:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, q,
             str(n), str(cap), *extra],
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("{")), None
        )
        if line:
            print(line, flush=True)
        else:
            err = (r.stderr or "no output").strip().splitlines()
            print(
                json.dumps(
                    {
                        "query": q,
                        "sf_dir": sf_dir,
                        "runs": [f"child died rc={r.returncode}: "
                                 + (err[-1][:160] if err else "")],
                        "min": None,
                    }
                ),
                flush=True,
            )


def main() -> None:
    sf_dir = sys.argv[1]
    qs = [q for q in sys.argv[2].split(",") if q]
    args = [
        a for a in sys.argv[3:] if a not in ("--isolate", "--prewarm")
    ]
    n = int(args[0]) if len(args) > 0 else 1
    cap = int(args[1]) if len(args) > 1 else 900
    if "--isolate" in sys.argv and len(qs) > 1:
        _isolated(sf_dir, qs, n, cap)
        return

    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    spark = get_spark(app_name="sf-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if "--prewarm" in sys.argv:
        # Spin up the Python worker pool + Arrow serde BEFORE the timed
        # runs (r17, verdict item 5): a fresh JVM's first Pandas-UDF
        # stage pays one python-worker fork + Arrow init per core, and
        # on min-of-2 probes that amortization leaked into the "warm"
        # number for UDF-heavy queries (dedup_minhash_lsh sf10 read
        # 126.6 s isolated vs 58.5 s in a long session).  One trivial
        # mapInPandas over every core makes run 1 pay only ITS OWN
        # compute.  Untimed by design — the pool is session
        # infrastructure, not query cost.
        def _noop(it):
            for b in it:
                yield b

        cores = sc.defaultParallelism
        (
            spark.range(cores * 4, numPartitions=cores)
            .mapInPandas(_noop, "id long")
            .write.format("noop").mode("overwrite").save()
        )

    for q in qs:
        runs: list[float | str] = []
        steal: list[float | None] = []
        for i in range(n):
            group = f"probe-{q}-{i}"
            sc.setJobGroup(group, q, interruptOnCancel=True)
            timer = threading.Timer(cap, lambda: sc.cancelJobGroup(group))
            timer.start()
            t0 = time.perf_counter()
            try:
                with _StealTape() as tape:
                    REGISTRY[q].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                runs.append(round(time.perf_counter() - t0, 2))
                steal.append(tape.max_pct)
            except Exception as e:
                el = time.perf_counter() - t0
                if el >= cap - 1 or "cancelled" in str(e).lower():
                    runs.append(f"timeout>{cap}s")
                else:
                    # elapsed-to-error matters: fail-fast guards are
                    # graded on HOW FAST they raise
                    runs.append(f"error@{el:.1f}s: {str(e)[:200]}")
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
                    # max steal% sampled during each timed run; >~5 on
                    # the min run ⇒ the row is an upper bound (SCALE.md
                    # r17 steal-tape discipline)
                    "steal_pct_max": steal,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
