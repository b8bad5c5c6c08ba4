"""Paired A/B of spread_small_input on one query (r9 verdict item #1).

r9's 5b168bc routed the similarity corpus scans through
``spread_small_input``; at sf0.1 the embeddings fixture IS 1-2 parquet
splits, so the repartition actively fires.  It paid off for
sim_cosine_topk / sim_ann_ivf but sim_ann_lsh rose 1.175→1.535 s raw
(+30%) the same round — plausibly the repartition tax, plausibly box
load.  Single runs cannot tell on a box with ±25-40% noise
(round-build-protocol): this tool runs N interleaved A/B pairs in ONE
session (A = spread as shipped, B = SPARK_GRAFT_NO_SPREAD=1), reports
per-arm medians and the pairwise-delta distribution, and the decision
rule from the verdict: spread stays unless it costs >15% at sf0.1 with
no sf1 benefit for THIS query.

Usage: python tools/ab_spread.py [query] [n_pairs] [sf_dir]
       defaults: sim_ann_lsh 6 /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    qname = sys.argv[1] if len(sys.argv) > 1 else "sim_ann_lsh"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    qdef = REGISTRY[qname]
    spark = get_spark(app_name="ab-spread", cpus=cpus,
                      shuffle_partitions=cpus)
    spark.range(1000).selectExpr("sum(id) AS s").collect()

    def run_once(no_spread: bool) -> float:
        if no_spread:
            os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)
        t0 = time.perf_counter()
        qdef.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # warm both plans once (codegen) before timing
    run_once(False)
    run_once(True)

    a, b, deltas = [], [], []
    for i in range(n_pairs):
        # alternate arm order each pair so monotone drift cancels
        first_no_spread = bool(i % 2)
        t1 = run_once(first_no_spread)
        t2 = run_once(not first_no_spread)
        ta, tb = (t2, t1) if first_no_spread else (t1, t2)
        a.append(ta)
        b.append(tb)
        deltas.append(ta - tb)
        print(
            f"pair {i}: spread={ta:.3f}s no_spread={tb:.3f}s "
            f"delta={ta - tb:+.3f}s",
            flush=True,
        )

    med_a, med_b = statistics.median(a), statistics.median(b)
    print(json.dumps({
        "query": qname,
        "sf_dir": sf_dir,
        "n_pairs": n_pairs,
        "median_spread_sec": round(med_a, 3),
        "median_no_spread_sec": round(med_b, 3),
        "median_pair_delta_sec": round(statistics.median(deltas), 3),
        "spread_over_no_spread": round(med_a / med_b, 3) if med_b else None,
        "pair_deltas": [round(d, 3) for d in deltas],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
