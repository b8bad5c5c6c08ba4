"""Temporal join semantics + plan shape (operators/temporal.py).

Oracle parity at sf0.01 is covered by test_queries_oracle; here we pin
the edge semantics on a hand-built timeline (equal-timestamp ties,
strict vs inclusive, no-match NULLs, window boundaries) and assert the
plans stay shuffle-bounded (no nested-loop join anywhere)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.operators import temporal as TJ
from real_time_trip_processing_project_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),  # tie with right r2
            (2, "u", _ts("2024-01-01 11:00:00")),  # after r2
            (3, "u", _ts("2024-01-01 08:00:00")),  # before everything
            (4, "v", _ts("2024-01-01 12:00:00")),  # key with no right rows
        ],
        "click_id long, user_id string, click_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts("2024-01-01 09:00:00"), 1.0),
            (20, "u", _ts("2024-01-01 10:00:00"), 2.0),  # equal-ts tie
            (21, "u", _ts("2024-01-01 10:00:00"), 3.0),  # same-ts dup: max id wins
        ],
        "purchase_id long, user_id string, p_ts timestamp, val double",
    )
    return left, right


def test_asof_inclusive_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.click_id: r.purchase_id
        for r in TJ.asof_join(
            left, right, ["user_id"], "click_ts", "p_ts",
            ["purchase_id", "val"], out_prefix="",
        ).collect()
    }
    # equal ts counts; among equal-ts rights the max payload wins
    assert out == {1: 21, 2: 21, 3: None, 4: None}


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r.click_id: r.purchase_id
        for r in TJ.asof_join(
            left, right, ["user_id"], "click_ts", "p_ts",
            ["purchase_id", "val"], out_prefix="", inclusive=False,
        ).collect()
    }
    assert out == {1: 10, 2: 21, 3: None, 4: None}


def test_range_join_boundaries(spark):
    probe = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))],
        "purchase_id long, user_id string, p_ts timestamp",
    )
    build = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:00:00")),  # exactly -1h: included
            ("u", _ts("2024-01-01 08:59:59")),  # just outside
            ("u", _ts("2024-01-01 09:59:59")),  # inside
            ("u", _ts("2024-01-01 10:00:00")),  # probe instant: excluded
            ("w", _ts("2024-01-01 09:30:00")),  # other key
        ],
        "user_id string, e_ts timestamp",
    )
    rows = TJ.range_join_binned(
        probe, build, ["user_id"], "p_ts", "e_ts", 3600
    ).collect()
    got = sorted(r.e_ts.strftime("%H:%M:%S") for r in rows)
    assert got == ["09:00:00", "09:59:59"]


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_plan_has_no_join(spark):
    """The union+window formulation must compile join-free: one window
    over one hash exchange, no BroadcastNestedLoop anywhere."""
    plan = _plan(spark, "asof_join_events")
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_plan_is_equi_join(spark):
    """The binned range join must plan as a shuffle/broadcast equi-join
    with the range predicate as a residual — never a nested loop."""
    plan = _plan(spark, "range_join_errors_before_purchase")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_fuzz_vs_pandas_merge_asof(spark):
    """Seeded random event sets: the union+window as-of join must agree
    with pandas ``merge_asof`` (the de-facto sequential reference for
    backward as-of semantics) for BOTH inclusive and strict modes.
    Right-side timestamps are unique per key so tie-resolution
    conventions (which differ between the two) never enter."""
    import random

    import pandas as pd

    rng = random.Random(7)
    base = dt.datetime(2024, 5, 25, 0, 0, 0)
    lefts, rights = [], []
    rid = 0
    for user in range(12):
        r_ts = rng.sample(range(0, 5000), rng.randint(0, 12))
        for t in r_ts:
            rid += 1
            rights.append(
                (user, base + dt.timedelta(seconds=t), rid, float(rid))
            )
        for _ in range(rng.randint(0, 15)):
            t = rng.randrange(0, 5000)
            # force exact-tie left timestamps sometimes
            if r_ts and rng.random() < 0.3:
                t = rng.choice(r_ts)
            lefts.append((user, base + dt.timedelta(seconds=t)))
    left = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(lefts)],
        "click_id long, user_id long, click_ts timestamp",
    )
    right = spark.createDataFrame(
        rights, "user_id long, p_ts timestamp, purchase_id long, pv double"
    )
    lpdf = pd.DataFrame(
        [(i, u, t) for i, (u, t) in enumerate(lefts)],
        columns=["click_id", "user_id", "click_ts"],
    ).sort_values(["click_ts", "click_id"])
    rpdf = pd.DataFrame(
        rights, columns=["user_id", "p_ts", "purchase_id", "pv"]
    ).sort_values("p_ts")
    for inclusive in (True, False):
        got = {
            (r.click_id, r.purchase_id)
            for r in TJ.asof_join(
                left,
                right,
                keys=["user_id"],
                left_ts="click_ts",
                right_ts="p_ts",
                right_value_cols=["purchase_id", "pv"],
                out_prefix="",
                inclusive=inclusive,
            ).collect()
        }
        want_df = pd.merge_asof(
            lpdf,
            rpdf,
            left_on="click_ts",
            right_on="p_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=inclusive,
        )
        want = {
            (int(r.click_id),
             None if pd.isna(r.purchase_id) else int(r.purchase_id))
            for r in want_df.itertuples()
        }
        assert got == want, f"inclusive={inclusive}"
