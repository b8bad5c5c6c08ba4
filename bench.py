#!/usr/bin/env python
"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints TWO JSON lines:

1. the full detail object (all secondary timings, normalized values,
   quality floors, streaming) — also written to ``bench_detail.json``;
2. a FINAL compact line ≤1,500 chars —
   ``{"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ...}`` — sized so the driver's last-2,000-chars stdout capture
   always parses it (r6 lost its headline metric to a single oversized
   line).

Execution is measured with the "noop" sink so plans run fully (all
shuffles + aggregates) without driver-side row transfer skewing the
numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Headline queries: the flagship KPI pipeline, the heaviest
#: join/agg/window plans, and the training-data tier (dedup/similarity/
#: text) heavies.
HEADLINE = [
    "trip_daily_kpis",
    "global_agg",
    "join_inner",
    "multiway_join_agg",
    "latest_event_per_user",
    "windowed_event_agg",
    "event_correlation",
    "count_distinct",
    "percentiles",
    "topk_orders",
    "asof_join_events",
    "range_join_errors_before_purchase",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "text_fingerprint",
]

#: Secondary guard list: paths whose plans were reworked after round 1
#: (driver-canonicalizer fixes; the metric-blocked embedding pairs) plus
#: the round-2 curation/corpus-analytics heavies.  Timed identically but
#: reported under "secondary" so the headline total stays comparable
#: across rounds.
SECONDARY = [
    "sliding_window_agg",
    "array_agg_per_customer",
    "array_functions",
    "dedup_embedding_cosine",
    "curation_contamination",
    "curation_pack_sequences",
    "text_pii_redact",
    "text_repetition",
    "text_lm_score",
    "embedding_quantize_int8",
    "doc_domain_stats",
    # round-4 additions
    "multimodal_wav_windows",
    "funnel_conversion",
    "retention_cohorts",
    "corpus_zipf_fit",
    "quality_outlier_mad",
    "text_script_profile",
    "text_bigram_lm_score",
    "embedding_class_centroids",
    "tokenizer_train_bpe",
    "heavy_hitters_cms",
    "distinct_kmv",
    # round-5 additions
    "multimodal_image_features",
    "dedup_common_spans",
    "events_resample_1h_ffill",
    # round-6 additions
    "multimodal_video_frames",
    "curation_bloom_contamination",
    "graph_pagerank_dedup",
    "multimodal_sampled_frame_features",
    "event_transition_matrix",
    "tpch_q5_local_supplier",
    # round-6 session-2 additions
    "sessionize_batch",
    "scd2_event_type_versions",
    "doc_chunk_overlap",
    "tpch_q10_returned_item",
    "tpch_q18_large_orders",
    "sim_ann_pq",
    "graph_triangles_dedup",
    "curation_corpus_pipeline",
    "sim_ann_ivfpq",
    "tpch_q1_pricing_summary",
    "events_rolling_zscore_outliers",
    "doc_chunk_dedup",
    "text_hashing_vectors",
    "sparse_matmul_projection",
    "graph_bfs_depths",
    "funnel_3step_ordered",
    "fuzzy_join_levenshtein",
    "session_overlap_pairs",
    "embedding_random_projection",
    "events_trend_slopes",
    # round-7 additions: TPC-H batch 2 (plans/tpch.py)
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q12_late_lines",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive_predicates",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    # round-9 additions: TPC-H batch 3 — the derived-partsupp five,
    # completing 22/22 (plans/tpch.py)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q20_potential_promotion",
    # round-9 additions: training-pipeline curation pair
    "embedding_hard_negatives",
    "curation_importance_resample",
    # round-10 additions
    "embedding_hard_negatives_ann",
    "curation_dsir_pipeline",
    "multimodal_mp4_i16_stats",
    "multimodal_mp4_intra_stats",
    "curation_span_corruption",
    "join_skew_salted",
    "multimodal_mjpeg_frames",
    "ts_cross_correlation",
    "label_noise_centroid",
    "multimodal_png_features",
    "multimodal_wav_mulaw",
    "variant_json_ops",
    "bitmap_distinct_count",
    "multimodal_mp4_frames",
    # round-11 additions: the deterministic halves of the lossy-codec
    # tier under FULL oracles
    "multimodal_mp4_i16_index",
    "multimodal_mp4_intra_index",
    "multimodal_mp4_gop_index",
    "multimodal_mp4_cabac_index",
    "multimodal_mp4_cabac_gop_index",
    # round-12 additions: B-frame, multi-reference-P and CABAC-B GOP
    # container indexes (FULL oracles, registered r12)
    "multimodal_mp4_b_gop_index",
    "multimodal_mp4_p2_index",
    "multimodal_mp4_b_cabac_gop_index",
    # embedding_kmeans / embedding_kmeans_assign are oracle-gated per
    # round but, like tokenizer_apply_bpe_counts, kept out of the
    # timing list: the 3-iteration driver loop is ~90% fixed per-job
    # scheduling at fixture scale, which would drown the data-scaling
    # signal.
    # tokenizer_apply_bpe_counts is oracle-gated per round but kept out
    # of the timing list: its cost is ~90% fixed plan compilation
    # (training jobs + an 8-deep nested fold chain), which would drown
    # the data-scaling signal this list exists to track.
]

#: Executions per query; the reported number is the minimum (steady-state
#: engine time — first run also pays one-off codegen compilation, and the
#: shared box shows ±40% load noise between runs — r6 observed the pinned
#: probe swinging 0.12–4.3 s within one run).  Three samples everywhere:
#: on a box that noisy, min-of-2 regularly charged a query for a load
#: spike (r6's in-run min-of-3 cross-checks disagreed with min-of-2 bench
#: numbers by 2–3×).
REPS = 3
HEADLINE_REPS = 3


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


#: Timed queries between interleaved probe samples.  r9's gate had TWO
#: probes bracketing a ~70-query run and they disagreed by 33% — a
#: mid-run load excursion was invisible and 25 queries got flagged on
#: drift.  ~1 sample per 10 queries bounds the window any excursion can
#: silently poison to 10 queries.
PROBE_EVERY = 10


def _probe(spark, reps: int = 3) -> float:
    """Fixed calibration workload: a pinned ``spark.range`` aggregate
    whose plan never changes round-over-round.  Its runtime tracks box
    load, not repo code — query regressions that co-move with the probe
    are environmental; regressions against a stable probe are real.
    Min-of-3 to shed codegen/JIT on the first sample; interleaved
    samples use min-of-2 (JIT is warm — min still reflects SUSTAINED
    load, which is what normalization should charge for, while shedding
    one-off scheduler blips)."""
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        spark.range(500_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _probe_py_kernel(batches):
    """Fixed numpy workload per Arrow batch — module-level so the
    pickled closure is identical every run."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        x = pdf["id"].to_numpy()
        for _ in range(16):
            x = (x * 1103515245 + 12345) % 2147483648
        yield pd.DataFrame({"s": [int(x.sum())]})


def _probe_py(spark, reps: int = 2) -> float:
    """Python-WORKER calibration probe (r10 verdict item 3b): a pinned
    ``mapInPandas`` kernel over a fixed ``spark.range``.  The JVM probe
    above is blind to Python-worker-pool contention — r10's driver run
    had fast JVM probes while all 22 of its flags landed on
    pandas_udf/mapInPandas-heavy queries.  This probe's runtime tracks
    exactly that pool (Arrow transfer + numpy throughput across the
    worker fleet), so codec/curation/text kernels normalize against the
    resource they actually consume."""
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        spark.range(0, 8_000_000, 1, CPUS).mapInPandas(
            _probe_py_kernel, "s long"
        ).selectExpr("sum(s) AS s").collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


#: Physical-plan node names that put a query's hot path in the Python
#: worker pool (Arrow/pandas evaluation) rather than JVM codegen.
_PY_PLAN_NODE = re.compile(r"InPandas|EvalPython|InArrow")


def _probe_flavor(df) -> str:
    """Classify a query's normalization basis by inspecting its PHYSICAL
    plan: any pandas/Arrow evaluation node → the Python-worker probe;
    pure-JVM plans → the spark.range probe.  Automatic (no hand-kept
    query list) and exact — plan inspection costs planning only, no
    execution."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return "jvm"
    return "py" if _PY_PLAN_NODE.search(plan) else "jvm"


def _read_cpu() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat, or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]), sum(int(x) for x in parts[1:9])
    except (OSError, IndexError, ValueError):
        return None


class _StealTape:
    """Background sampler of CPU steal% — the one /proc signal that
    separates host-tenant contention from our own local[32] load (r17:
    the box takes periodic external spikes that rotate bench flags
    across same-code runs; loadavg cannot attribute them because a
    busy bench ITSELF holds 1-min load at ~26).  Max/mean land in the
    detail JSON so a flag carries its contention evidence."""

    def __init__(self, interval: float = 10.0):
        self._interval = interval
        self.samples: list[float] = []
        self._stop = __import__("threading").Event()
        t = __import__("threading").Thread(target=self._loop, daemon=True)
        self._thread = t

    def _loop(self) -> None:
        prev = _read_cpu()
        while not self._stop.wait(self._interval):
            cur = _read_cpu()
            if prev and cur and cur[1] > prev[1]:
                self.samples.append(
                    100.0 * (cur[0] - prev[0]) / (cur[1] - prev[1])
                )
            prev = cur

    def start(self) -> "_StealTape":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    def stats(self, since: int = 0) -> dict:
        s = self.samples[since:]
        if not s:
            return {"max": None, "mean": None}
        return {
            "max": round(max(s), 1),
            "mean": round(sum(s) / len(s), 1),
        }


def _steal_sample(window: float = 5.0) -> float | None:
    """CPU steal%% over one short window, or None off-Linux."""
    a = _read_cpu()
    if a is None:
        return None
    time.sleep(window)
    b = _read_cpu()
    if b is None or b[1] <= a[1]:
        return None
    return 100.0 * (b[0] - a[0]) / (b[1] - a[1])


def _quiet_wait(
    max_wait: float = 300.0,
    threshold: float = 4.0,
    steal_threshold: float = 5.0,
) -> dict:
    """Bounded wait for a quiet box before the calibration probe.  The
    r17 flag history shows same-code runs flagging 5 DIFFERENT queries
    across 3 runs purely on external spike timing — starting inside a
    spike wastes the whole run.  Bounded so a persistently loaded box
    still benches (the probe normalization then does what it can).

    Two independent gates (optimization r18, VERDICT r17 item 1):
    loadavg sees LOCAL load, but is blind to host-tenant contention —
    the r17 driver run started through a clean loadavg gate and still
    recorded steal_pct_max 14.9%%.  So the wait also samples /proc/stat
    steal%% over 5 s windows and holds while steal > ``steal_threshold``
    (the same >5%% band every adjudicated r17 contamination showed)."""
    waited = 0.0
    load = None
    steal = None
    while waited < max_wait:
        try:
            with open("/proc/loadavg") as f:
                load = float(f.read().split()[0])
        except (OSError, ValueError):
            break
        if load >= threshold:
            time.sleep(10)
            waited += 10
            continue
        steal = _steal_sample(5.0)
        waited += 5
        if steal is None or steal < steal_threshold:
            break
    return {
        "quiet_wait_sec": round(waited, 1),
        "start_load": load,
        "start_steal_pct": round(steal, 1) if steal is not None else None,
    }


def main() -> None:
    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    quiet = _quiet_wait()
    tape = _StealTape().start()
    spark = get_spark(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)

    # warm the JVM/codegen path so q1 isn't charged for session startup,
    # and the parquet file indexes/footers so q1 isn't charged for
    # one-time metadata listing either
    _run(spark.range(1000).selectExpr("sum(id) AS s"))
    for t in (
        "orders lineitem customer nation region events documents embeddings"
    ).split():
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).collect()

    # Interleaved probe tape: (position, seconds) samples threaded
    # through the run — one every PROBE_EVERY timed queries — so each
    # query normalizes against the probe NEAREST it in time instead of
    # one run-wide mean (r9: two bracketing probes 33% apart could not
    # see mid-run load, and 25 queries got flagged on drift).
    seq = {"n": 0}
    probe_samples: list[tuple[int, float]] = []
    probe_py_samples: list[tuple[int, float]] = []
    positions: dict[str, int] = {}
    flavors: dict[str, str] = {}

    def _sample_probe(reps: int = 2) -> None:
        probe_samples.append((seq["n"], _probe(spark, reps=reps)))
        probe_py_samples.append((seq["n"], _probe_py(spark, reps=reps)))

    def _time(names: list[str], reps: int = REPS) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            qdef = REGISTRY.get(name)
            if qdef is None:
                continue
            best = None
            for rep in range(reps):
                df = qdef.fn(spark, SF_DIR)
                if rep == 0 and name not in flavors:
                    flavors[name] = _probe_flavor(df)
                t0 = time.perf_counter()
                _run(df)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                # Evict ALL cached relations between reps (optimization
                # r18, VERDICT r17 item 1 "what's wrong"): a query fn
                # that persists a subtree builds an identical analyzed
                # plan every rep, and Spark's CacheManager silently
                # serves reps 2-3 from rep 1's materialized cache — the
                # reported min-of-N was then a warm-cache rep for the
                # six persisted queries (distinct_kmv, session_overlap_
                # pairs, ts_cross_correlation, tpch q11/q15, graph
                # tier).  Every rep now pays full materialization, and
                # nothing persists past its own query (the bench-session
                # half of the unpersist-epilogue item).
                spark.catalog.clearCache()
            timings[name] = round(best, 3)
            positions[name] = seq["n"]
            seq["n"] += 1
            if seq["n"] % PROBE_EVERY == 0:
                _sample_probe()
        return timings

    _sample_probe(reps=3)  # first sample also sheds probe codegen/JIT
    timings = _time(HEADLINE, reps=HEADLINE_REPS)
    secondary = _time(SECONDARY)
    if probe_samples[-1][0] != seq["n"]:
        _sample_probe()
    probe_start = probe_samples[0][1]
    probe_end = probe_samples[-1][1]

    def _nearest_probe(name: str) -> float:
        # each query normalizes against the NEAREST sample of the tape
        # matching its plan flavor: Python-worker-heavy queries against
        # the mapInPandas probe, pure-JVM queries against spark.range
        # (r10 verdict item 3b — the JVM tape is blind to Python-pool
        # contention and mis-flagged 22 pandas-heavy queries)
        tape = (
            probe_py_samples
            if flavors.get(name) == "py"
            else probe_samples
        )
        pos = positions.get(name, 0)
        return min(tape, key=lambda s: abs(s[0] - (pos + 0.5)))[1]

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "secondary": secondary,
        "secondary_total": round(sum(secondary.values()), 3),
        "sf": sf,
        # load calibration: compare across rounds FIRST — if the probe
        # moved, query deltas of the same ratio are box noise
        "probe_start_sec": probe_start,
        "probe_end_sec": probe_end,
        "probe_samples": [[p, s] for p, s in probe_samples],
        "probe_py_samples": [[p, s] for p, s in probe_py_samples],
    }
    # probe-normalized timings (seconds per second of probe): each query
    # divides by the interleaved probe sample NEAREST its run position,
    # so a mid-run load excursion only distorts the ≤PROBE_EVERY queries
    # around it instead of silently skewing the whole run (r10; was one
    # run-wide mean from two bracketing probes).  probe_mean_sec stays
    # the all-sample mean for the headline value and cross-round compare.
    probe_mean = (
        sum(s for _, s in probe_samples) / len(probe_samples)
    ) or 1.0
    probe_py_mean = (
        sum(s for _, s in probe_py_samples) / len(probe_py_samples)
    ) or 1.0
    out["normalized"] = {
        "probe_mean_sec": round(probe_mean, 3),
        "probe_py_mean_sec": round(probe_py_mean, 3),
        "value": round(out["value"] / probe_mean, 3),
        "queries": {
            k: round(v / _nearest_probe(k), 3) for k, v in timings.items()
        },
        "secondary": {
            k: round(v / _nearest_probe(k), 3) for k, v in secondary.items()
        },
        # normalization basis per query ("jvm" | "py") — _regressions
        # only compares a query against a previous record taken on the
        # SAME basis (a basis switch gets one comparison-free round)
        "flavors": flavors,
    }
    out["quality"] = _quality(spark)
    sustained_waves = int(
        os.environ.get(
            "SPARK_GRAFT_SUSTAINED_WAVES",
            # full sustained gate at the canonical sf0.1 record; a
            # shorter burn for smoke-scale local runs
            "150" if (sf or 0) >= 0.1 else "24",
        )
    )
    streaming = _stream_throughput(spark, sustained_waves=sustained_waves)
    if streaming:
        out["streaming"] = streaming
        # rates normalize the other way round: a loaded box lengthens
        # the probe AND lowers events/sec, so rate x probe is the
        # box-independent figure of merit
        for k in (
            "steady_state_events_per_sec",
            "events_per_sec",
            "sustained_events_per_sec",
        ):
            if streaming.get(k):
                out["normalized"]["streaming_" + k] = round(
                    streaming[k] * probe_mean, 1
                )

    # Load-adjusted round-over-round comparison (r7 verdict item #3):
    # bench_detail.json is committed per round, so the copy on disk at
    # start-of-run is the previous round's record.  A query counts as
    # regressed only if its PROBE-NORMALIZED time rose >30% (or its
    # normalized streaming rate FELL >30% — r8 verdict item #2) — raw
    # deltas that co-move with the probe are box load, not code.
    # Sub-0.15 s queries are skipped (timer noise dominates there).
    # The committed bench_detail.json is the CANONICAL sf0.1 record the
    # driver compares against — a local run at another scale factor
    # (sf0.001 smoke, sf1 scale point) writes its own per-sf file and
    # never clobbers or compares against the canonical baseline.
    detail_name = (
        "bench_detail.json" if sf == 0.1 else f"bench_detail_sf{sf}.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    out["regressions"] = _regressions(detail_path, out["normalized"], sf)

    # Reproduce-or-drop (r10 verdict item 3a): three same-code bench
    # runs produced 9/22/10 flags with near-disjoint sets — a flag that
    # does not reproduce within the SAME session is load churn, not a
    # regression.  Each flagged query is re-timed min-of-3 against a
    # FRESH probe sample of its own flavor; only flags still >1.3x
    # their previous normalized reading survive.  Streaming flags re-run
    # the replay once under the same rule.
    retest_tape_from = len(tape.samples)
    if out["regressions"]:
        survivors = []
        dropped = []
        fresh_probe: dict[str, float] = {}

        def _fresh(flavor: str) -> float:
            if flavor not in fresh_probe:
                fn = _probe_py if flavor == "py" else _probe
                fresh_probe[flavor] = fn(spark, reps=2)
            return fresh_probe[flavor]

        restream = None
        for reg in out["regressions"]:
            name = reg["query"]
            if name.startswith("streaming_"):
                if restream is None:
                    restream = (
                        _stream_throughput(
                            spark, sustained_waves=sustained_waves
                        )
                        or {}
                    )
                rate = restream.get(name.removeprefix("streaming_"))
                retest = (rate or 0.0) * _fresh("jvm")
                ratio2 = reg["prev_norm"] / retest if retest else 0.0
            else:
                qdef = REGISTRY.get(name)
                if qdef is None:
                    continue
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    _run(qdef.fn(spark, SF_DIR))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    # same cold-rep rule as the main _time loop
                    spark.catalog.clearCache()
                flavor = flavors.get(name, "jvm")
                retest = round(best / _fresh(flavor), 3)
                ratio2 = retest / reg["prev_norm"]
            reg["retest_norm"] = round(retest, 3)
            reg["retest_ratio"] = round(ratio2, 2)
            thr = reg.get("threshold", 1.3)
            # raw corroboration holds at retest too: the min-of-3 raw
            # time must also sit >15% over its rolling raw median
            raw_ok = True
            if not name.startswith("streaming_") and reg.get("raw_base"):
                reg["retest_raw"] = round(best, 3)
                raw_ok = best > reg["raw_base"] * 1.15
            (survivors if ratio2 > thr and raw_ok else dropped).append(reg)
        out["regressions"] = survivors
        out["regressions_unreproduced"] = dropped

    # Sustained-floor violation (retested once inside the gate) rides
    # the regression list so the driver sees a nonzero flag count —
    # visible, adjudicable, and the bench artifact still exists.
    flag = _floor_flag(streaming)
    if flag:
        out["regressions"].append(flag)

    # Contention context for the whole run and for the retest phase
    # specifically: a surviving flag whose retest window shows steal
    # means host-tenant contention, not code (adjudication evidence).
    tape.stop()
    out["quiet_start"] = quiet
    out["steal_pct"] = tape.stats()
    out["steal_pct_retest"] = tape.stats(since=retest_tape_from)

    # Output contract (r6 lesson): the driver captures only the LAST
    # 2,000 chars of stdout, and r6's single ever-growing JSON line
    # outgrew that — BENCH_r06.json recorded "parsed": null and the
    # round lost its headline metric entirely.  So: full detail first
    # (its own line, plus a file for humans), then a FINAL compact line
    # that stays parseable no matter how many queries the lists grow.
    print(json.dumps(out))
    # Deliberate working-tree churn (recurring verdict nit, adjudicated
    # r17): every sf0.1 run — including the driver's post-close run —
    # rewrites the canonical record, because the regression gate's
    # 4-sample ROLLING history lives inside it and a driver run that
    # wrote elsewhere would starve the median (one builder sample per
    # round is exactly the single-window baseline the median replaced).
    # The round-close baseline commit re-captures the file each round.
    try:
        with open(detail_path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass

    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "secondary_total": out["secondary_total"],
        "probe_start_sec": probe_start,
        "probe_end_sec": probe_end,
        "normalized_value": out["normalized"]["value"],
        "regression_count": len(out["regressions"]),
        "steal_pct_max": out["steal_pct"]["max"],
    }
    if streaming:
        compact["streaming"] = {
            k: streaming[k]
            for k in (
                "events",
                "steady_state_events_per_sec",
                "sustained_events",
                "sustained_events_per_sec",
                "sustained_state_bounded",
            )
            if k in streaming
        }
    # hard budget: the driver tail is 2,000 chars — keep the final line
    # ≤1,500 with margin for a stray warning; shed detail keys in
    # priority order before ever touching the contract keys
    line = json.dumps(compact)
    for shed in (
        "steal_pct_max",
        "normalized_value",
        "secondary_total",
        "queries",
    ):
        if len(line) <= 1500:
            break
        compact.pop(shed, None)
        line = json.dumps(compact)
    print(line)
    spark.stop()


def _floor_flag(streaming: dict | None) -> dict | None:
    """Regression-list entry for a sustained-floor violation, or None.

    The floor is reported, never raised (optimization r17): the assert
    form killed the bench before either JSON line printed, so a single
    host-tenant load spike during the driver's run would have cost the
    round its whole headline metric.  A flag in ``regressions`` is just
    as visible and leaves the artifact intact."""
    fv = (streaming or {}).get("sustained_floor_violation")
    if not fv:
        return None
    return {
        "query": "streaming_sustained_floor",
        "raw_now": fv["rate"],
        "threshold": fv["floor"],
        "retest_ratio": round(fv["rate"] / fv["floor"], 2),
    }


def _regressions(prev_path: str, normalized: dict, sf=None) -> list[dict]:
    """Queries whose probe-normalized time rose >30% vs the ROLLING
    MEDIAN of the last 4 recorded runs at the SAME scale factor.

    Why a median, not the single previous run (r11 adjudication): three
    same-code sf0.1 runs in one day showed sub-second queries
    oscillating ±60% BETWEEN sessions while reproducing WITHIN a
    session — one unusually fast window as the sole baseline then
    flags the whole next run.  The per-query history rides inside the
    detail record (``normalized.history``) so a single outlier run is
    one sample out of four, not the entire baseline; history resets
    when a query's probe flavor changes.  Returns [] when no previous
    record exists or it was taken at a different sf."""
    try:
        with open(prev_path) as f:
            prev_all = json.load(f)
        prev = prev_all.get("normalized", {})
        if sf is not None and prev_all.get("sf") not in (None, sf):
            return []
    except (OSError, ValueError):
        normalized["history"] = {
            k: [v]
            for k, v in {
                **normalized.get("queries", {}),
                **normalized.get("secondary", {}),
            }.items()
        }
        return []
    prev_q = {**prev.get("queries", {}), **prev.get("secondary", {})}
    # RAW (un-normalized) previous timings, for the corroboration check
    # below — the top-level "queries"/"secondary" keys of the detail
    # record hold raw seconds
    prev_raw = {
        **prev_all.get("queries", {}),
        **prev_all.get("secondary", {}),
    }
    now_q = {**normalized.get("queries", {}), **normalized.get("secondary", {})}
    now_flavors = normalized.get("flavors", {})
    prev_flavors = prev.get("flavors", {})
    prev_hist = prev.get("history", {})
    prev_hist_raw = prev.get("history_raw", {})
    new_hist: dict[str, list[float]] = {}
    new_hist_raw: dict[str, list[float]] = {}

    def _mean(rec: dict, flavor: str) -> float:
        if flavor == "py":
            return rec.get("probe_py_mean_sec", 1.0) or 1.0
        return rec.get("probe_mean_sec", 1.0) or 1.0

    def _median(vals: list[float]) -> float:
        v = sorted(vals)
        n = len(v)
        return v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2

    regs = []
    for name, now_norm in now_q.items():
        prev_norm = prev_q.get(name)
        flavor = now_flavors.get(name, "jvm")
        # a query is only comparable against history recorded on the
        # SAME probe basis — a flavor switch (e.g. the py tape's first
        # round, where the previous record was jvm-normalized) gets one
        # comparison-free round and a clean baseline next round
        raw_now = now_norm * _mean(normalized, flavor)
        if prev_flavors.get(name, "jvm") != flavor:
            new_hist[name] = [now_norm]
            new_hist_raw[name] = [round(raw_now, 3)]
            continue
        hist = [
            h for h in prev_hist.get(name, []) if isinstance(h, (int, float))
        ]
        if not hist and prev_norm is not None:
            hist = [prev_norm]  # migrate pre-history records
        raw_hist = [
            h
            for h in prev_hist_raw.get(name, [])
            if isinstance(h, (int, float))
        ]
        if not raw_hist and prev_raw.get(name) is not None:
            raw_hist = [prev_raw[name]]  # migrate pre-history records
        new_hist[name] = (hist + [now_norm])[-4:]
        new_hist_raw[name] = (raw_hist + [round(raw_now, 3)])[-4:]
        baseline = _median(hist) if hist else None
        # skip new queries and readings where EITHER side's raw time is
        # sub-0.15 s — timer noise dominates there, and a tiny previous
        # reading inflates the ratio just as spuriously as a tiny
        # current one
        if (
            baseline is None
            or baseline <= 0
            or raw_now < 0.15
            or baseline * _mean(prev, flavor) < 0.15
        ):
            continue
        ratio = now_norm / baseline
        # Raw-time corroboration: normalization divides by the nearest
        # probe, and the tape's own samples disagree up to ~1.6x within
        # one run — a fast probe window can flag a query whose RAW time
        # actually improved (observed on dedup_ngram_jaccard: raw
        # 1.835→1.149 s across rounds yet normalized ratio 1.61).  A
        # real code regression raises BOTH instruments, so a flag must
        # also show raw time up >15% vs its own rolling median.
        raw_base = _median(raw_hist) if raw_hist else None
        raw_ratio = raw_now / raw_base if raw_base else None
        # Runtime-scaled thresholds, set from measured SAME-CODE
        # cross-session spread on this box (r11: three sf0.1 runs in
        # one day — sub-0.5 s queries p90 1.4x / max 1.88x, 0.5-1.5 s
        # p90 1.33x, >=1.5 s max 1.04x; probe-invisible section-local
        # load): a flat 1.3 flags ~15% of the sub-second catalogue on
        # pure box noise every run.  Relative noise shrinks with
        # runtime, so the gate's sensitivity follows it.
        threshold = 1.3 if raw_now >= 1.5 else (
            1.6 if raw_now >= 0.5 else 2.0
        )
        if ratio > threshold and (raw_ratio is None or raw_ratio > 1.15):
            regs.append(
                {
                    "query": name,
                    "prev_norm": baseline,
                    "now_norm": now_norm,
                    "ratio": round(ratio, 2),
                    "threshold": threshold,
                    "raw_now": round(raw_now, 3),
                    "raw_base": round(raw_base, 3) if raw_base else None,
                }
            )
    normalized["history"] = new_hist
    normalized["history_raw"] = new_hist_raw
    # streaming rates (normalized as rate x probe): regression = the
    # normalized rate FELL >50% vs the previous round (raised from 30%
    # r11: same-code same-day replays measured 14.8k-19.7k ev/s — a
    # 1.33x spread the probe does not see)
    for name, now_rate in normalized.items():
        if not name.startswith("streaming_"):
            continue
        prev_rate = prev.get(name)
        if not prev_rate or not now_rate:
            continue
        ratio = prev_rate / now_rate
        if ratio > 1.5:
            regs.append(
                {
                    "query": name,
                    "prev_norm": prev_rate,
                    "now_norm": now_rate,
                    "ratio": round(ratio, 2),
                    "threshold": 1.5,
                }
            )
    regs.sort(key=lambda r: -r["ratio"])
    return regs


def _quality(spark) -> dict:
    """Measured quality of the approximate (rows-only) queries, so the
    five permanent no-oracle rows stay auditable round-over-round:
    recall vs the exact twin for the ANN/LSH paths, observed error vs
    the exact answer for the sketches.  Floors are asserted — a bench
    run with a silently-degraded approximate path fails loudly."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture,
    )

    q: dict[str, float] = {}

    # ANN recall@k vs the exact brute-force top-k (pair sets are
    # queries×k ≈ hundreds of rows — driver-safe at any corpus size)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["sim_cosine_topk"].fn(spark, SF_DIR).collect()
    }
    # Floors ratcheted to just below the REPEATED measured points (r11
    # verdict item 6) so a routing regression can't hide under slack —
    # two cited measurements each, the embedding_hard_negatives_ann
    # 0.85→0.95 discipline applied family-wide:
    #   sim_ann_lsh   r6 ≈0.975, r11 judge 0.96  → floor 0.95
    #   sim_ann_ivf   r6 ≈0.945, r11 judge 0.94  → floor 0.93
    #   sim_ann_pq    r6  0.98,  r11 judge 1.00  → floor 0.95
    #   sim_ann_ivfpq r6  0.94,  r11 judge 0.92  → floor 0.90
    for name, floor in (
        ("sim_ann_lsh", 0.95),
        ("sim_ann_ivf", 0.93),
        ("sim_ann_pq", 0.95),
        ("sim_ann_ivfpq", 0.90),
    ):
        ann = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY[name].fn(spark, SF_DIR).collect()
        }
        rec = round(len(bf & ann) / max(len(bf), 1), 4)
        assert rec >= floor, f"{name} recall {rec} < floor {floor}"
        q[f"{name}_recall_at_10"] = rec

    # Hard-negative serving path: match-rate@1 vs the exact twin (same
    # (d2, neg_id) argmin — a row matches iff the ANN probe found the
    # true nearest different-label neighbor in a probed cell)
    exact_neg = {
        r.query_id: r.neg_id
        for r in REGISTRY["embedding_hard_negatives"]
        .fn(spark, SF_DIR)
        .collect()
    }
    ann_neg = {
        r.query_id: r.neg_id
        for r in REGISTRY["embedding_hard_negatives_ann"]
        .fn(spark, SF_DIR)
        .collect()
    }
    match = round(
        sum(
            1 for k, v in exact_neg.items() if ann_neg.get(k) == v
        ) / max(len(exact_neg), 1),
        4,
    )
    # floor raised 0.85 -> 0.95 (r10 verdict item 7) after two rounds of
    # stability: match@1 measured 1.0 at sf0.01 AND sf0.1 in r10 (builder
    # gate run + driver BENCH_r10 + judge re-run) and again in r11 — a
    # routing regression can no longer hide under the old floor
    assert match >= 0.95, f"hard_negatives_ann match@1 {match} < floor 0.95"
    q["embedding_hard_negatives_ann_match_at_1"] = match

    # MinHash-LSH recall vs the exact PPJoin pair set (planted ~0.99-
    # Jaccard dups collide with prob ≈ 1-1e-22, so this should be ≈ 1)
    exact = {
        (r.id_a, r.id_b)
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    }
    rec = round(len(exact & lsh) / max(len(exact), 1), 4)
    assert rec >= 0.95, f"dedup_minhash_lsh recall {rec} < floor 0.95"
    q["dedup_minhash_lsh_recall"] = rec

    # HLL++ observed relative error vs exact distinct counts (configured
    # rsd 2%; assert a generous 10% ceiling)
    orders = load_fixture(spark, SF_DIR, "orders")
    exact_n = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx_n = {
        r["o_orderstatus"]: r["n_custs_approx"]
        for r in REGISTRY["approx_count_distinct"].fn(spark, SF_DIR).collect()
    }
    err = max(
        abs(approx_n[k] - n) / max(n, 1) for k, n in exact_n.items()
    )
    assert err <= 0.10, f"approx_count_distinct rel err {err} > 0.10"
    q["approx_count_distinct_max_rel_err"] = round(err, 4)

    # GK sketch observed RANK error (the sketch's actual guarantee:
    # ≤ n/accuracy = 0.1% of n) — rank of each approximate value
    # computed distributed (one broadcast join + agg, no collect of the
    # value column)
    appr = (
        REGISTRY["approx_quantiles"]
        .fn(spark, SF_DIR)
        .withColumnRenamed("o_orderstatus", "status")
    )
    p_map = F.create_map(
        *[
            x
            for tag, p in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95))
            for x in (F.lit(tag), F.lit(p))
        ]
    )
    ranks = (
        orders.join(
            F.broadcast(appr), orders["o_orderstatus"] == appr["status"]
        )
        .groupBy("status", "q", "v")
        .agg(
            F.sum(
                (F.col("o_totalprice") <= F.col("v")).cast("long")
            ).alias("rank"),
            F.count("*").alias("n"),
        )
        .withColumn("target", p_map[F.col("q")] * (F.col("n") - 1))
        .select(
            (F.abs(F.col("rank") - 1 - F.col("target")) / F.col("n")).alias(
                "rank_err"
            )
        )
        .agg(F.max("rank_err").alias("m"))
        .collect()[0]["m"]
    )
    assert ranks <= 0.01, f"approx_quantiles rank err {ranks} > 0.01"
    q["approx_quantiles_max_rank_err"] = round(float(ranks), 5)

    # MJPEG roundtrip floor: decoded per-frame px_sum vs the exact
    # source-byte sum (distributed join on the doc's frame grid; the
    # unit-quant pipeline bounds error at ±1/pixel → ≤256/frame).
    docs = load_fixture(spark, SF_DIR, "documents").filter(
        F.col("text").rlike(r"^[\x00-\x7F]*$")
    )
    src = (
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.posexplode(
                F.split(
                    F.rpad(
                        F.col("text"),
                        256
                        * F.greatest(
                            F.ceil(F.length("text") / 256), F.lit(1)
                        ).cast("int"),
                        "\x00",
                    ),
                    "(?<=\\G.{256})",
                )
            ).alias("frame_idx", "chunk"),
        )
        .filter(F.length("chunk") > 0)
        .select(
            "media_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.aggregate(
                F.transform(
                    F.split(F.col("chunk"), "(?!^)"),
                    lambda c: F.ascii(c).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sum_exact"),
        )
    )
    mj = REGISTRY["multimodal_mjpeg_frames"].fn(spark, SF_DIR)
    mae = (
        mj.join(src, ["media_id", "frame_idx"])
        .select(
            (F.abs(F.col("px_sum") - F.col("sum_exact")) / 256.0).alias("e")
        )
        .agg(F.avg("e").alias("mae"), F.max("e").alias("mx"))
        .collect()[0]
    )
    assert mae["mx"] <= 1.0, f"mjpeg per-pixel err {mae['mx']} > 1.0"
    q["mjpeg_mean_abs_px_err"] = round(float(mae["mae"]), 5)

    # Intra_16x16+CAVLC video tier (r10): quantizer distortion floors —
    # the codec chain is integer-deterministic, so these are stable
    # bounds, not statistical ones (qp=12 measures mean 0.48 / max 4)
    i16 = (
        REGISTRY["multimodal_mp4_i16_stats"]
        .fn(spark, SF_DIR)
        .agg(
            (F.sum("sum_abs_err") / F.sum("px_count")).alias("mean_err"),
            F.max("max_abs_err").alias("max_err"),
            F.avg("sample_bytes").alias("mean_sample_bytes"),
            F.max("sample_bytes").alias("max_sample_bytes"),
        )
        .collect()[0]
    )
    assert i16["mean_err"] <= 1.0, f"i16 mean px err {i16['mean_err']}"
    assert i16["max_err"] <= 8, f"i16 max px err {i16['max_err']}"
    # rate gate: the per-MB I_PCM fallback bounds any 16x16-frame
    # sample at ~398 B (length prefix + slice header + ue(25) + align
    # + 384 raw bytes); a CAVLC rate regression would break this ceiling
    assert i16["max_sample_bytes"] <= 400, (
        f"i16 sample {i16['max_sample_bytes']} B exceeds the PCM bound"
    )
    q["mp4_i16_mean_abs_px_err"] = round(float(i16["mean_err"]), 5)
    q["mp4_i16_max_abs_px_err"] = int(i16["max_err"])
    q["mp4_i16_mean_sample_bytes"] = round(
        float(i16["mean_sample_bytes"]), 1
    )

    # Full-intra tier (I4x4/I16/PCM mode decision): same floors, and
    # the mode decision must never code WORSE than the PCM rate bound
    intra = (
        REGISTRY["multimodal_mp4_intra_stats"]
        .fn(spark, SF_DIR)
        .agg(
            (F.sum("sum_abs_err") / F.sum("px_count")).alias("mean_err"),
            F.max("max_abs_err").alias("max_err"),
            F.avg("sample_bytes").alias("mean_sample_bytes"),
            F.max("sample_bytes").alias("max_sample_bytes"),
        )
        .collect()[0]
    )
    assert intra["mean_err"] <= 1.0, f"intra mean err {intra['mean_err']}"
    assert intra["max_err"] <= 8, f"intra max err {intra['max_err']}"
    assert intra["max_sample_bytes"] <= 400
    q["mp4_intra_mean_abs_px_err"] = round(float(intra["mean_err"]), 5)
    q["mp4_intra_mean_sample_bytes"] = round(
        float(intra["mean_sample_bytes"]), 1
    )

    # CABAC tier (r11): the arithmetic coder serializes the SAME i16
    # analysis, so on any doc slice its distortion stats must EQUAL the
    # CAVLC run's exactly (cross-entropy-coder conformance with no
    # external decoder); the rate ratio is recorded and ceilinged —
    # single-MB 16x16 samples pay the per-slice flush, so the bound is
    # a guard against catastrophic regression, not a win claim.
    from real_time_trip_processing_project_spark.operators import (
        multimodal as _MM,
    )
    from real_time_trip_processing_project_spark.sources.readers import (
        load_fixture as _lf,
    )

    cab_docs = _lf(spark, SF_DIR, "documents").filter(
        F.col("text").rlike(r"^[\x00-\x7F]*$") & (F.col("doc_id") % 16 == 0)
    )
    pair = {}
    for codec in ("i16", "i16_cabac"):
        pair[codec] = (
            _MM.mp4_i16_frame_stats(cab_docs, codec=codec)
            .agg(
                F.sum("sum_abs_err").alias("err"),
                F.max("max_abs_err").alias("mx"),
                F.sum("sample_bytes").alias("rate"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
    assert pair["i16"]["n"] == pair["i16_cabac"]["n"]
    assert pair["i16"]["err"] == pair["i16_cabac"]["err"], (
        "CABAC distortion diverged from CAVLC — shared analysis broken"
    )
    assert pair["i16"]["mx"] == pair["i16_cabac"]["mx"]
    cab_ratio = pair["i16_cabac"]["rate"] / max(pair["i16"]["rate"], 1)
    assert cab_ratio <= 1.25, f"CABAC/CAVLC rate ratio {cab_ratio}"
    q["mp4_cabac_rate_vs_cavlc"] = round(float(cab_ratio), 4)

    # Inter tier (r11): on a deterministic moving sequence (a rolled
    # 64x64 base frame — doc frames are unrelated text chunks, where
    # temporal prediction rightly buys nothing), the P-GOP container
    # must beat all-intra decisively AND decode back within the same
    # distortion bound.  Driver-side pure-Python: one tiny encode pair.
    import numpy as _np

    from real_time_trip_processing_project_spark.operators import (
        h264 as _H,
    )

    _base = _np.add.outer(
        _np.arange(64, dtype=_np.int64) * 5,
        _np.arange(64, dtype=_np.int64) * 3,
    ) % 251
    _gop_frames = _np.stack(
        [
            _np.roll(_np.roll(_base, 2 * k, 0), 4 * k, 1).astype(_np.uint8)
            for k in range(8)
        ]
    )
    _gop = _H.encode_mp4_h264(_gop_frames, codec="i16p", qp=12)
    _alli = _H.encode_mp4_h264(_gop_frames, codec="i16", qp=12)
    gop_ratio = len(_gop) / len(_alli)
    assert gop_ratio <= 0.7, f"GOP/all-I rate ratio {gop_ratio}"
    _, _dec = _H.decode_mp4_h264(_gop)
    assert len(_dec) == 8
    _gop_err = max(
        int(_np.abs(f.astype(_np.int64) - _gop_frames[i].astype(_np.int64)).max())
        for i, f in _dec
    )
    assert _gop_err <= 8, f"GOP decode max px err {_gop_err}"
    q["mp4_gop_rate_vs_alli"] = round(gop_ratio, 4)
    q["mp4_gop_max_abs_px_err"] = _gop_err

    # B tier (r12, h264_b.py): two gates on the same driver-side
    # deterministic content.
    # (a) The B GOP (IDR P B P B … + ctts reordering) must beat
    #     all-intra as decisively as the P GOP on the moving sequence
    #     and decode back IN DISPLAY ORDER within the same distortion
    #     bound.  (B vs P GOP rate is near-parity by design here:
    #     B_Skip/B_Direct are documented seams, so the ladder trades
    #     the skip savings for reorder coverage — the honest win claim
    #     is gate (b).)
    _bgop = _H.encode_mp4_h264(_gop_frames, codec="i16pb", qp=12)
    bgop_ratio = len(_bgop) / len(_alli)
    assert bgop_ratio <= 0.7, f"B-GOP/all-I rate ratio {bgop_ratio}"
    _, _bdec = _H.decode_mp4_h264(_bgop)
    assert [i for i, _f in _bdec] == list(range(8)), (
        "B GOP did not decode back in display order"
    )
    _bgop_err = max(
        int(_np.abs(f.astype(_np.int64) - _gop_frames[i].astype(_np.int64)).max())
        for i, f in _bdec
    )
    assert _bgop_err <= 8, f"B GOP decode max px err {_bgop_err}"
    q["mp4_b_gop_rate_vs_alli"] = round(bgop_ratio, 4)
    q["mp4_b_gop_max_abs_px_err"] = _bgop_err
    # (b) the statistical point of bi-prediction: averaging two noisy
    #     references halves reference-noise variance, so the SAME frame
    #     coded as B (past+future refs) must be smaller than coded as P
    #     (past ref only) — fixed-seed noisy-static triple, the
    #     measured ratio ≈0.97 (five dev seeds 0.972–0.986)
    from real_time_trip_processing_project_spark.operators import (
        h264_b as _HB,
        h264_inter as _HP,
        h264_intra as _HI,
    )

    _rng = _np.random.default_rng(7)
    _yy, _xx = _np.mgrid[0:48, 0:64]
    _clean = (_np.sin(_yy / 6.0) + _np.cos(_xx / 7.0)) * 60 + 128
    _f0, _f1, _f2 = (
        _np.clip(_clean + _rng.normal(0, 6, _clean.shape), 0, 255).astype(
            _np.uint8
        )
        for _ in range(3)
    )
    _n0, _r0y, _r0c = _HI.encode_idr_frame_i16(
        _f0, qp=12, return_recon=True, return_chroma=True
    )
    _np2, _r2y, _r2c = _HP.encode_p_frame(_f2, _r0y, _r0c, qp=12)[:3]
    _nal_p, _, _ = _HP.encode_p_frame(_f1, _r0y, _r0c, qp=12)
    _nal_b, _, _ = _HB.encode_b_frame(_f1, _r0y, _r0c, _r2y, _r2c, qp=12)
    b_vs_p = len(_nal_b) / len(_nal_p)
    assert b_vs_p < 1.0, f"bi-prediction lost to P on noisy refs: {b_vs_p}"
    q["mp4_b_vs_p_same_frame_rate"] = round(b_vs_p, 4)
    # B_Skip collapse (r12, spatial direct 8.4.1.2.2): a B frame
    # between two reconstructions of the SAME source must code as
    # (near-)pure skip runs — measures 84 B for 12 MBs (was 726 B
    # before skip/direct shipped); gate well above the measurement
    _nps, _rsy, _rsc, _pmv = _HP.encode_p_frame(
        _f0, _r0y, _r0c, qp=12, return_mvs=True
    )
    _nskip, _, _ = _HB.encode_b_frame(
        _f0, _r0y, _r0c, _rsy, _rsc, qp=12, col_mvs=_pmv
    )
    assert len(_nskip) < 160, (
        f"B_Skip failed to collapse static content: {len(_nskip)} B"
    )
    q["mp4_b_skip_static_bytes"] = len(_nskip)
    # Explicit weighted bi-prediction (r12): a flash B frame (1.3x the
    # brightness of both references) must code at a fraction of the
    # default-bipred rate once estimate_weights corrects the
    # references.  On THIS content (bright sinusoid + noise, partial
    # clipping pulls the LS fit to scale+offset (73, 15)) it measures
    # 0.558; the unclipped test fixture measures 0.42 — gate 0.7.
    _flash = _np.clip(_f0.astype(_np.float64) * 1.3, 0, 255).astype(
        _np.uint8
    )
    _wts = _HB.estimate_weights(_flash, _r0y, _rsy)
    _plain_b, _, _ = _HB.encode_b_frame(
        _flash, _r0y, _r0c, _rsy, _rsc, qp=12, col_mvs=_pmv
    )
    _wgt_b, _, _ = _HB.encode_b_frame(
        _flash, _r0y, _r0c, _rsy, _rsc, qp=12, col_mvs=_pmv,
        weights=_wts,
    )
    w_ratio = len(_wgt_b) / len(_plain_b)
    assert w_ratio < 0.7, f"weighted B lost its flash win: {w_ratio}"
    q["mp4_b_weighted_flash_rate"] = round(w_ratio, 4)
    # CABAC B twin (r12): shared analysis ⇒ the arithmetic B GOP must
    # decode to pixels IDENTICAL to the CAVLC B GOP, at a rate ratio
    # bounded like the intra CABAC gate
    _bgop_c = _H.encode_mp4_h264(_gop_frames, codec="i16pb_cabac", qp=12)
    _, _bdec_c = _H.decode_mp4_h264(_bgop_c)
    assert [i for i, _f in _bdec_c] == [i for i, _f in _bdec]
    for (_i1, _fa2), (_i2, _fb2) in zip(_bdec_c, _bdec):
        assert _np.array_equal(_fa2, _fb2), (
            "CABAC B GOP pixels diverged from CAVLC B GOP"
        )
    bcab_ratio = len(_bgop_c) / len(_bgop)
    assert bcab_ratio <= 1.25, f"CABAC/CAVLC B GOP rate ratio {bcab_ratio}"
    q["mp4_b_cabac_rate_vs_cavlc"] = round(bcab_ratio, 4)
    # (c) multi-reference P (r12, extra_refs): on flash content where
    #     frame k matches frame k-2 (never k-1), the 2-deep te(v)
    #     ref_idx list must buy what no single reference can — gate at
    #     0.6x the 1-ref rate (measures ≈0.3: the matched scene codes
    #     as near-skip on refIdx 1)
    _fa = (_clean + 40 * _np.sin(_xx / 3.0)).clip(0, 255).astype(_np.uint8)
    _fb = _np.roll(_fa, 24, axis=1)
    _na, _ray, _rac = _HI.encode_idr_frame_i16(
        _fa, qp=12, return_recon=True, return_chroma=True
    )
    _nb, _rby, _rbc = _HP.encode_p_frame(_fb, _ray, _rac, qp=12)
    _one, _, _ = _HP.encode_p_frame(_fa, _rby, _rbc, qp=12)
    _two, _, _ = _HP.encode_p_frame(
        _fa, _rby, _rbc, qp=12, extra_refs=[(_ray, _rac)]
    )
    p2_vs_p1 = len(_two) / len(_one)
    assert p2_vs_p1 < 0.6, f"2-ref P lost its flash-content win: {p2_vs_p1}"
    q["mp4_p2_vs_p1_flash_rate"] = round(p2_vs_p1, 4)

    # Datasketches HLL mergeable-sketch floor: the merged-union estimate
    # (the "ALL" row of the registered query) vs the exact global
    # distinct count
    hll = {
        r["o_orderstatus"]: r["n_custs_est"]
        for r in REGISTRY["hll_sketch_mergeable"].fn(spark, SF_DIR).collect()
    }
    exact_all = (
        load_fixture(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    rel = abs(hll["ALL"] - exact_all) / max(exact_all, 1)
    assert rel <= 0.05, f"hll merged estimate rel err {rel} > 0.05"
    q["hll_sketch_merged_rel_err"] = round(float(rel), 5)
    return q


def _stream_throughput(spark, sustained_waves: int = 150) -> dict | None:
    """Replay the reference's 9,998 trip events through the full streaming
    pipeline (file sources → stateful correlator → partitioned store) and
    report end-to-end events/sec.

    The reference's own single-node path is bounded below by its 300 s
    producer sleep plus per-record Kinesis/Lambda/DynamoDB round-trips
    (send_to_kinesis.py:75, trip_processor.py:54-78) for the same 9,998
    events — this number is the engine's direct comparison point.
    """
    import shutil
    import tempfile

    ref = "/root/reference/data"
    if not os.path.isdir(ref):
        return None
    from real_time_trip_processing_project_spark.sources import producer
    from real_time_trip_processing_project_spark.streaming import jobs

    # scratch (source files, state checkpoint, parquet store) on tmpfs
    # when available: a production state store lives on cluster-local
    # NVMe; this box's /tmp is a virtio disk whose per-commit fsyncs
    # would otherwise bill ~10% of the replay to the wrong hardware.
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="bench-stream-", dir=shm)
    try:
        dirs = {n: os.path.join(root, n) for n in ("start", "end", "store", "orphans", "ckpt")}
        n_start, n_end = producer.produce_trip_streams(
            f"{ref}/trip_start.csv", f"{ref}/trip_end.csv",
            dirs["start"], dirs["end"], n_files=4,
        )
        # stateful streaming has no AQE: the shuffle-partition count is
        # baked into the checkpoint as the state-store partition count.
        # Size it to the replay volume (10k events) — every state
        # partition costs a per-micro-batch commit regardless of data.
        # Min-of-REPS like the batch queries: the first replay also pays
        # one-off codegen + checkpoint-format setup.
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_ndmb = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled"
        )
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # an availableNow drain doesn't need the trailing no-data batch
        # (it exists for event-time timer liveness; the drain has none)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        dt = None
        try:
            for rep in range(REPS):
                store = os.path.join(root, f"store-{rep}")
                orph = os.path.join(root, f"orphans-{rep}")
                ckpt = os.path.join(root, f"ckpt-{rep}")
                t0 = time.perf_counter()
                # key-group state: the throughput configuration (per-trip
                # keying pays ~0.8 ms of invocation overhead per trip per
                # batch; see correlator.py key-group design note).  16
                # groups, not 64: the group function's fixed pandas cost
                # (~4 ms/group/batch after the r6 vectorization) dominates
                # this replay's per-group work, and 16 still spreads over
                # the 8 state partitions.
                jobs.run_pipeline_to_completion(
                    spark, dirs["start"], dirs["end"], store, orph, ckpt,
                    key_groups=16,
                )
                rep_dt = time.perf_counter() - t0
                dt = rep_dt if dt is None else min(dt, rep_dt)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndmb
            )
        n = n_start + n_end
        # steady-state throughput: ONE long-lived query over 5 disjoint
        # waves of the same event set, one wave per micro-batch
        # (maxFilesPerTrigger) — per-batch engine overhead read from the
        # query's own progress metrics, with batch 0 (plan + codegen +
        # state-store open, i.e. the cold start every long-running
        # stream pays once) excluded.  This is the number a production
        # stream sustains; pipeline_sec above is cold start + drain.
        import json as _json

        wdirs = {m: os.path.join(root, "waves-" + m) for m in ("start", "end")}
        # 9 waves, two waves per micro-batch (maxFilesPerTrigger=8 over
        # 4 files/wave/source) ⇒ batch 0 (cold) + 4 measured ~20k-event
        # batches.  Batch size is the standard streaming throughput
        # knob: per-batch machinery (state commit, sink commit, python
        # round-trip setup) is ~0.5 s regardless of rows, so a backlog
        # drain at 2x batch size nearly doubles events/sec; the
        # marginal per-event cost measured here is ~25 us.  Completed
        # trips evict after 2 batches (the redelivery window the
        # throughput configuration accepts — see EVICT_COMPLETED_AFTER).
        nw_s, nw_e = producer.produce_trip_waves(
            f"{ref}/trip_start.csv", f"{ref}/trip_end.csv",
            wdirs["start"], wdirs["end"], waves=9, n_files=4,
        )
        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            pq = jobs.start_trip_pipeline(
                spark,
                wdirs["start"], wdirs["end"],
                os.path.join(root, "waves-store"),
                os.path.join(root, "waves-orphans"),
                os.path.join(root, "waves-ckpt"),
                key_groups=16, available_now=True,
                max_files_per_trigger=8, evict_completed_after=2,
                # r9 knee sweep (tools/stream_knee.py, SCALE.md): HDFS vs
                # RocksDB medians are indistinguishable at this state size
                # (17.1k vs 17.1k ev/s over 12 paired runs), so the
                # default provider stands; RocksDB remains the documented
                # larger-than-memory escalation, one arg away.
            )
            pq.await_termination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        progs = [_json.loads(str(x)) for x in pq.main.recentProgress]
        tail = [x for x in progs[1:] if x.get("numInputRows")]
        tail_rows = sum(x["numInputRows"] for x in tail)
        tail_ms = sum(x["durationMs"]["triggerExecution"] for x in tail)
        steady = round(1000.0 * tail_rows / tail_ms, 1) if tail_ms else None

        # cost split: (a) source+decode alone — the file-source scan and
        # JSON parse with no stateful operator; (b) the state machine
        # alone — the full event set replayed as ONE in-memory batch
        # through the same correlator (no per-micro-batch source/commit
        # latency).  pipeline ≈ source latency + state machine + sink.
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            from real_time_trip_processing_project_spark.streaming import (
                correlator as C,
            )

            t0 = time.perf_counter()
            tagged, _quar = jobs.tagged_union_stream(
                spark, dirs["start"], dirs["end"]
            )
            (
                tagged.writeStream.format("noop")
                .option(
                    "checkpointLocation", os.path.join(root, "ckpt-src")
                )
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            source_sec = time.perf_counter() - t0

            static_tagged = jobs.tagged_union_batch(
                spark, dirs["start"], dirs["end"]
            )
            t0 = time.perf_counter()
            C.correlate_batch(static_tagged).write.mode("overwrite").format(
                "noop"
            ).save()
            state_sec = time.perf_counter() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

        # Sustained long-lived replay (r14 verdict item 5): a
        # scaled-down invocation of the 10 M-event scale probe
        # (streaming/scale.py; ~1.5 M events over ~15 micro-batches)
        # so sustained throughput AND the bounded-state assertion are
        # regression-gated per round, not one-off.  Waves default to
        # 150 (env SPARK_GRAFT_SUSTAINED_WAVES overrides; 0 disables).
        sustained = None
        if sustained_waves > 0:
            from real_time_trip_processing_project_spark.streaming import (
                scale as _scale,
            )

            sroot = os.path.join(root, "sustained")
            prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                sustained, _ = _scale.sustained_replay(
                    spark, sroot, sustained_waves, max_files=10
                )
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            # Throughput floor (r17, verdict item 6): boundedness alone
            # let a real rate regression hide (46.5 k r16 vs 59.5 k r15
            # passed silently).  35 k ev/s sits below every observed
            # quiet-box run (46.5–59.5 k) with loaded-box margin; only
            # the CANONICAL full gate (150+ waves) is floored — smoke
            # runs at 8 cpus / 24 waves legitimately measure ~38 k.
            #
            # A violation is RETESTED once (external host-tenant spikes
            # throttle the replay 2×+ — measured 22.5 k on this box with
            # zero local load) and then REPORTED as a regression flag,
            # never raised: the original assert form killed the whole
            # bench before either JSON line printed, so one load spike
            # during the driver's run would have cost the round its
            # entire headline metric, which is strictly worse than a
            # visible flag (optimization r17).
            if sustained_waves >= 150:
                floor_evs = float(
                    os.environ.get("SPARK_GRAFT_SUSTAINED_FLOOR", "35000")
                )
                rate = sustained["sustained_ev_per_sec"]
                if rate < floor_evs:
                    # fresh subdir: reusing sroot resumes the drained
                    # checkpoint (zero new batches → a None rate)
                    sustained2, _ = _scale.sustained_replay(
                        spark,
                        os.path.join(root, "sustained_retry"),
                        sustained_waves,
                        max_files=10,
                    )
                    rate2 = sustained2["sustained_ev_per_sec"]
                    if rate2 is not None and rate2 > rate:
                        sustained = sustained2
                        rate = rate2
                sustained["sustained_floor_ev_per_sec"] = floor_evs
                if rate < floor_evs:
                    sustained["sustained_floor_violation"] = {
                        "rate": rate,
                        "floor": floor_evs,
                    }
        extra = (
            {
                "sustained_events": sustained["events"],
                "sustained_batches": sustained["batches"],
                "sustained_events_per_sec": sustained[
                    "sustained_ev_per_sec"
                ],
                "sustained_state_mb_max": sustained["state_mb_max"],
                "sustained_state_bounded": sustained["state_bounded"],
                **{
                    k: sustained[k]
                    for k in (
                        "sustained_floor_ev_per_sec",
                        "sustained_floor_violation",
                    )
                    if k in sustained
                },
            }
            if sustained
            else {}
        )
        return {
            "events": n,
            "key_groups": 16,
            **extra,
            "pipeline_sec": round(dt, 3),
            "events_per_sec": round(n / dt, 1),
            "source_only_sec": round(source_sec, 3),
            "source_events_per_sec": round(n / source_sec, 1),
            "correlator_batch_sec": round(state_sec, 3),
            "correlator_events_per_sec": round(n / state_sec, 1),
            "steady_state_batch_events": (
                round(tail_rows / len(tail)) if tail else 0
            ),
            "steady_state_batches": len(tail),
            "steady_state_events": tail_rows,
            "steady_state_events_per_sec": steady,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
