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
