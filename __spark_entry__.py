"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``real_time_trip_processing_project_spark``; the
query catalogue is the plans registry (one entry per SURVEY.md §2
operator, EXTENSION-tier included).
"""

from __future__ import annotations

import glob
import json
import os
import re
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

#: Queries whose implementing module changed since their last driver check —
#: verified near the front of the window.  Maintained per round, names only
#: advisory (unknown names warn, never break the package).
_RECHECK_FIRST = [
    # r11: the ten r10 pins all greened in CORRECTNESS_r10 and are
    # cleared (r10-verdict item 1).  Pin policy going forward (r10
    # verdict item 4): pins rank BELOW the overdue tier (see
    # _order_names) and should be drawn from queries whose implementing
    # module changed since their last check — preferably ones already
    # in the stale cohort so pins don't compete with rotation.
    # r11 changed modules:
    # - plans/training.py DSIR calibration (de-vacuated resample filter)
    "curation_dsir_pipeline",
    # - h264_intra.py/h264_cavlc.py hardening + the true-position PCM
    #   rate bound (ADVICE r10) sit under both lossy MP4 stats queries
    "multimodal_mp4_i16_stats",
    "multimodal_mp4_intra_stats",
]

# r12 ladder plan: the 49-query r8 cohort crosses the overdue line at
# r12 and fills 49 of the 50 slots.  multimodal_mp4_gop_index (the
# FULL-oracle stss/container-invariant query over the r11 P-frame
# tier) is ALREADY registered as r11's one deliberate window overflow
# — as the FIRST-registered never-checked query it takes r12's free
# slot, so register nothing new for r12 and draw any pins from inside
# the r8 cohort.  r13's 3 free slots (47-query r9 cohort) are filled by
# the queued never-checked CABAC container indexes
# (multimodal_mp4_cabac_index, multimodal_mp4_cabac_gop_index,
# registered r11 behind the GOP index in queue order) + 1 spare.  The
# r11 CABAC + inter tiers are meanwhile covered by
# tests/test_h264_cabac.py, tests/test_h264_inter.py and bench quality
# floors (mp4_cabac_rate_vs_cavlc, mp4_gop_rate_vs_alli).

#: A query whose last green check is older than this many rounds is
#: "overdue" and outranks never-checked newcomers in the window — without
#: this, every query-adding round re-starves the stale tail.
_MAX_STALENESS = 3


def _last_check(results_dir: str) -> tuple[dict[str, int], set[str]]:
    """Per query: the most recent round it appeared in a CORRECTNESS file,
    and the set of queries whose MOST RECENT check was a failure."""
    last: dict[str, int] = {}
    failed: set[str] = set()
    for path in glob.glob(os.path.join(results_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if rnd < last.get(name, -1):
                continue
            last[name] = rnd
            err = row.get("err")
            ok = (err is None and row.get("hash_match") is True) or (
                err == "no_oracle" and (row.get("spark_rows") or 0) >= 0
            )
            if ok:
                failed.discard(name)
            else:
                failed.add(name)
    return last, failed


def _order_names(
    names: list[str],
    last: dict[str, int],
    failed: set[str],
    recheck: dict[str, int],
) -> list[str]:
    """Pure ordering core (unit-tested for the max-staleness bound):
    failures first, then queries overdue by more than _MAX_STALENESS
    rounds (stalest first), then changed-module rechecks, then
    never-checked, then stalest-check-first — so a fixed-size
    verification window of W slots re-checks every one of N queries at
    least once every ⌈N/W⌉ rounds, a red row always leads the very next
    window, and neither a burst of newly-registered queries nor a long
    pin list can starve an already-stale tail (r10 verdict item 1: pins
    used to outrank the overdue tier, and 10 pins + a 45-query stale
    cohort overflowed the 50-slot window — the overdue tier now ranks
    ABOVE rechecks, so staleness is bounded no matter how many pins a
    round carries).  Ladder projection (r10 verdict item 4): r11 drains
    the 45-query r7 cohort; at r12 the 49-query r8 cohort crosses the
    overdue line and fills the window first — with cohort sizes ≤ W the
    ladder sustains ⌈N/W⌉-round freshness indefinitely."""
    now = max(last.values(), default=-1) + 1  # the round being ordered for

    def key(item: tuple[int, str]) -> tuple:
        idx, n = item
        if n in failed:
            return (0, idx)
        if n in last and now - last[n] > _MAX_STALENESS:
            return (1, last[n], idx)
        if n in recheck:
            return (2, recheck[n])
        if n not in last:
            return (3, idx)
        return (4, last[n], idx)

    return [n for _, n in sorted(enumerate(names), key=key)]


def _ordered(registry: dict) -> dict:
    """Order the catalogue so the verifier's fixed-size check window keeps
    every query's most-recent-green fresh (see :func:`_order_names`).
    Purely an ordering concern of this driver-facing shim — the library
    registry keeps natural registration order."""
    last, failed = _last_check(os.path.dirname(os.path.abspath(__file__)))
    unknown = [n for n in _RECHECK_FIRST if n not in registry]
    if unknown:
        warnings.warn(f"_RECHECK_FIRST names not registered: {unknown}")
    recheck = {n: i for i, n in enumerate(_RECHECK_FIRST)}
    return {
        n: registry[n]
        for n in _order_names(list(registry), last, failed, recheck)
    }


def _registry():
    from real_time_trip_processing_project_spark.plans import REGISTRY

    return _ordered(REGISTRY)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The trip-style daily KPI pipeline: start ⋈ end correlate + per-day
    five-KPI aggregate in a single pass (SURVEY.md §7 minimum slice).
    """
    return _registry()["trip_daily_kpis"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qdef.fn for name, qdef in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL-expressible
    ops (driver records a weaker rows-only check for those)."""
    return {
        name: qdef.oracle
        for name, qdef in _registry().items()
        if qdef.oracle is not None
    }
