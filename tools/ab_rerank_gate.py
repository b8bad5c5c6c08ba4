"""Paired A/B of the ANN re-rank kernel gate (r13 verdict item 3).

r13 made the `_cos_pair` pandas-UDF re-rank unconditional and
`sim_ann_ivf` regressed 0.570→0.857 s in the driver bench at sf0.1 —
the UDF spin-up tax at 2 k-vector scale.  r14 gates every re-rank on a
candidate-volume proxy (`similarity._rerank_cos`, threshold
`_COS_PAIR_MIN_ROWS`): below it the codegen cosine expression runs (no
UDF), above it the Arrow/einsum kernel (no interpreted HOF).

This tool measures the gate the way the box's ±25-40% noise demands:
N interleaved A/B pairs in ONE session — A = gate as shipped,
B = gate forced OFF (threshold 0 → always `_cos_pair`, the r13
behavior) — and reports per-arm medians plus the pairwise deltas.

Usage: python tools/ab_rerank_gate.py [query] [n_pairs] [sf_dir]
       defaults: sim_ann_ivf 6 /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "sim_ann_ivf"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from real_time_trip_processing_project_spark.operators import (
        similarity as SIM,
    )
    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    qdef = REGISTRY[qname]
    spark = get_spark(app_name="ab-rerank-gate", cpus=cpus)
    shipped = SIM._COS_PAIR_MIN_ROWS

    def run_once() -> float:
        t0 = time.perf_counter()
        qdef.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once()  # one warm-up rep outside the measurement
    a_times, b_times = [], []
    for _ in range(n_pairs):
        SIM._COS_PAIR_MIN_ROWS = shipped
        a_times.append(run_once())
        SIM._COS_PAIR_MIN_ROWS = 0  # r13 behavior: always _cos_pair
        b_times.append(run_once())
    SIM._COS_PAIR_MIN_ROWS = shipped

    deltas = [b - a for a, b in zip(a_times, b_times)]
    print(
        json.dumps(
            {
                "query": qname,
                "sf_dir": sf_dir,
                "n_pairs": n_pairs,
                "gate_on_median_sec": round(statistics.median(a_times), 3),
                "gate_off_median_sec": round(statistics.median(b_times), 3),
                "gate_on": [round(t, 3) for t in a_times],
                "gate_off": [round(t, 3) for t in b_times],
                "pair_deltas_off_minus_on": [round(d, 3) for d in deltas],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
