"""r15 advisor-guard pins (ADVICE.md r14, three low items).

1. events_trend_slopes: degenerate groups (single event / one hour
   bucket) must yield the 0.0 sentinel identically in BOTH engines —
   previously Spark's double 0/0 → NULL vs DuckDB's IEEE inf/NaN was a
   latent cross-engine mismatch.
2. triangle_count_clustered: a caller-supplied components table missing
   a node must FAIL LOUDLY instead of silently dropping edges (the
   inner-join undercount).
3. script_profile_counts / pair_count_partials: non-ASCII docs must
   match the character-semantics expression twins (UTF-32 code-point
   fallback) instead of silently counting UTF-8 continuation bytes.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark import testing
from real_time_trip_processing_project_spark.plans import REGISTRY


def _fixture_dir_with_events(tmp_path, spark, rows):
    """A driver-shaped fixture dir: custom events table, every other
    table symlinked from the smoke fixtures (so the oracle connection's
    ten views all bind)."""
    d = tmp_path / "sf-degenerate"
    d.mkdir()
    for name in testing.FIXTURE_NAMES:
        if name == "events":
            continue
        os.symlink(
            f"/root/testdata/sf0.001/{name}.parquet",
            d / f"{name}.parquet",
        )
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).toPandas().to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_events_trend_slopes_degenerate_groups_match_oracle(
    spark, tmp_path
):
    """Single-event and single-hour-bucket groups hit the zero
    denominator; both engines must emit the decimal-exact 0.0 sentinel
    (and agree on the healthy group's slope)."""
    t0 = dt.datetime(2024, 1, 1, 0, 30)

    def ev(i, hours, typ, val):
        return (i, t0 + dt.timedelta(hours=hours), 1, typ, val, "{}")

    rows = [
        # degenerate: one single event
        ev(0, 0, "solo", 12.5),
        # degenerate: three events, all inside hour bucket 2
        ev(1, 2.0, "onehour", 1.0),
        ev(2, 2.2, "onehour", 2.0),
        ev(3, 2.4, "onehour", 3.0),
        # healthy: slope 1000 milli-ticks/hour exactly
        ev(4, 0, "healthy", 1.0),
        ev(5, 1, "healthy", 2.0),
        ev(6, 2, "healthy", 3.0),
    ]
    sf_dir = _fixture_dir_with_events(tmp_path, spark, rows)
    qdef = REGISTRY["events_trend_slopes"]
    df = qdef.fn(spark, sf_dir)
    res = testing.compare_query(
        "events_trend_slopes", df, qdef.oracle, testing.duckdb_conn(sf_dir)
    )
    assert res.ok, res.detail
    got = {r["event_type"]: r["slope_milli_per_hour"] for r in df.collect()}
    assert got["solo"] == 0.0 and got["onehour"] == 0.0
    assert got["healthy"] == pytest.approx(1000.0)


def test_triangle_clustered_incomplete_components_raises(spark):
    from real_time_trip_processing_project_spark.operators import graph as GR

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5)], "id_a LONG, id_b LONG"
    )
    # components table missing node 2, the routing (least-id) endpoint
    # of edge (2,3) — exactly the edge the old inner join silently
    # dropped.  (A node missing only on the GREATER side still routes
    # via its partner's label, so it is not a drop case.)
    partial = spark.createDataFrame(
        [(1, 1), (3, 1), (4, 4), (5, 4)],
        "doc_id LONG, canonical_id LONG",
    )
    with pytest.raises(ValueError, match="absent from the supplied"):
        GR.triangle_count_clustered(pairs, components=partial).collect()


def test_triangle_clustered_supplied_components_match_self_computed(spark):
    from real_time_trip_processing_project_spark.operators import graph as GR
    from real_time_trip_processing_project_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3)],
        "id_a LONG, id_b LONG",
    )
    comp = connected_components(pairs)
    sup = {
        r["id"]: r["n_triangles"]
        for r in GR.triangle_count_clustered(
            pairs, components=comp
        ).collect()
    }
    auto = {
        r["id"]: r["n_triangles"]
        for r in GR.triangle_count_clustered(pairs).collect()
    }
    assert sup == auto == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


_NON_ASCII_DOCS = [
    (1, "héllo wörld 42"),
    (2, "déjà vu — naïve café"),
    (3, "中文 text with 中文 blocks 99"),
    (4, "plain ascii stays on the byte path 7"),
    (5, "emoji \U0001f600 pair \U0001f600x"),  # astral, non-BMP
]


def test_script_profile_counts_non_ascii_matches_expression(spark):
    """The UTF-32 fallback must equal the JVM regexp expression twin on
    BMP non-ASCII text (the twin operates on characters natively)."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    # BMP-only rows: astral chars count 1 code point here vs 2 UTF-16
    # units in the JVM — documented semantics difference, excluded.
    docs = spark.createDataFrame(
        [r for r in _NON_ASCII_DOCS if r[0] != 5],
        "doc_id LONG, text STRING",
    )

    def n(pat):
        return F.length(F.regexp_replace(F.col("text"), pat, "")).cast(
            "long"
        )

    expr = {
        r["doc_id"]: (r["a"], r["d"], r["s"], r["o"], r["t"])
        for r in docs.select(
            "doc_id",
            n(r"[^a-zA-Z]").alias("a"),
            n(r"[^0-9]").alias("d"),
            n(r"[^ ]").alias("s"),
            n(r"[a-zA-Z0-9 ]").alias("o"),
            F.length("text").cast("long").alias("t"),
        ).collect()
    }
    kern = {
        r["id"]: (r["n_alpha"], r["n_digit"], r["n_space"], r["n_other"],
                  r["n_chars_total"])
        for r in CU.script_profile_counts(docs).collect()
    }
    assert kern == expr and kern


def test_script_profile_counts_astral_code_points(spark):
    """Astral chars: code-point semantics (each emoji = 1 'other')."""
    from real_time_trip_processing_project_spark.operators import (
        curation as CU,
    )

    docs = spark.createDataFrame(
        [(5, "a \U0001f600b")], "doc_id LONG, text STRING"
    )
    got = CU.script_profile_counts(docs).collect()[0]
    assert (
        got["n_alpha"], got["n_digit"], got["n_space"],
        got["n_other"], got["n_chars_total"],
    ) == (2, 0, 1, 1, 4)


def test_pair_count_partials_non_ascii_matches_expression(spark):
    """The UTF-32 fallback must equal the substr character-bigram
    expression twin on BMP non-ASCII text."""
    from real_time_trip_processing_project_spark.operators import (
        tokenizer as TK,
    )

    docs = spark.createDataFrame(
        [r for r in _NON_ASCII_DOCS if r[0] != 5],
        "doc_id LONG, text STRING",
    )
    words = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    expr = {
        r["pair"]: r["n"]
        for r in words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kern = {
        r["pair"]: r["n"]
        for r in TK.pair_count_partials(docs)
        .groupBy("pair")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert kern == expr and kern
    # sanity: the fallback actually produced multi-byte pairs
    assert any(ord(c) > 127 for p in kern for c in p)


def test_resample_ffill_null_value_hours_match_oracle(spark, tmp_path):
    """r17 pin (ADVICE r16, medium): an ACTIVE hour whose value sum is
    NULL (all events that hour carry NULL value) must inherit the
    previous non-null fill — the oracle's last_value IGNORE NULLS —
    for itself AND its silent-hour span, not open a NULL span.  Also
    pins the leading-NULL case (no prior non-null → NULL, both
    engines) so the ignorenulls carry is bounded correctly."""
    t0 = dt.datetime(2024, 3, 1, 0, 15)

    def ev(i, uid, hours, val):
        return (i, t0 + dt.timedelta(hours=hours), uid, "t", val, "{}")

    rows = [
        # user 1: active h0 (v=5.0), active h2 all-NULL, silent h3,
        # active h4 (v=7.25) — h2 and h3 must ffill 500 cents.
        ev(0, 1, 0, 5.0),
        ev(1, 1, 2, None),
        ev(2, 1, 2.5, None),
        ev(3, 1, 4, 7.25),
        # user 2: LEADING all-NULL hour then a value — h0 stays NULL
        # in both engines (nothing to carry), h1 is 300 cents.
        ev(4, 2, 0, None),
        ev(5, 2, 1, 3.0),
    ]
    sf_dir = _fixture_dir_with_events(tmp_path, spark, rows)
    qdef = REGISTRY["events_resample_1h_ffill"]
    df = qdef.fn(spark, sf_dir)
    res = testing.compare_query(
        "events_resample_1h_ffill",
        df,
        qdef.oracle,
        testing.duckdb_conn(sf_dir),
    )
    assert res.ok, res.detail
    got = {
        (r["user_id"], r["hour"].hour): (r["n_events"], r["v_ffill_cents"])
        for r in df.collect()
    }
    assert got[(1, 0)] == (1, 500)
    assert got[(1, 2)] == (2, 500)  # active, all-NULL → carried fill
    assert got[(1, 3)] == (0, 500)  # its silent span carries it too
    assert got[(1, 4)] == (1, 725)
    assert got[(2, 0)] == (1, None)  # leading NULL: nothing to carry
    assert got[(2, 1)] == (1, 300)


class TestBenchContentionInstrumentation:
    """r17: bench.py grew a quiet-start gate and a CPU-steal tape so a
    regression flag carries its own contention evidence (same-code runs
    flagged 5 disjoint query sets across 3 runs purely on external
    load-spike timing).  Pure-unit pins — no Spark session."""

    def test_read_cpu_shape(self):
        import bench

        r = bench._read_cpu()
        # on this (Linux) box the reader must return (steal, total)
        # with steal <= total and total monotonically increasing
        assert r is not None
        steal, total = r
        assert 0 <= steal <= total
        r2 = bench._read_cpu()
        assert r2[1] >= total

    def test_steal_tape_stats_empty_and_since(self):
        import bench

        tape = bench._StealTape(interval=9999)  # never samples
        assert tape.stats() == {"max": None, "mean": None}
        tape.samples.extend([1.0, 9.0, 2.0])
        assert tape.stats() == {"max": 9.0, "mean": 4.0}
        # retest-phase slice: stats(since=k) must ignore earlier samples
        assert tape.stats(since=1) == {"max": 9.0, "mean": 5.5}
        assert tape.stats(since=3) == {"max": None, "mean": None}

    def test_quiet_wait_immediate_when_quiet(self):
        import bench

        # threshold above any plausible load → returns without sleeping
        out = bench._quiet_wait(max_wait=0.0, threshold=1e9)
        assert out["quiet_wait_sec"] == 0.0
        assert out["start_load"] is None or out["start_load"] >= 0.0

    def test_sustained_floor_reports_instead_of_raising(self):
        """Optimization r17: the 35 k ev/s sustained floor must surface
        as a regression-list FLAG, not an assert — the assert form
        killed the whole bench (no JSON lines at all) when an external
        host-tenant spike throttled the replay to 22.5 k on a box with
        zero local load."""
        import bench

        # no streaming / no violation → no flag
        assert bench._floor_flag(None) is None
        assert bench._floor_flag({"sustained_events": 1}) is None
        flag = bench._floor_flag(
            {"sustained_floor_violation": {"rate": 22531.0, "floor": 35000.0}}
        )
        assert flag["query"] == "streaming_sustained_floor"
        assert flag["raw_now"] == 22531.0
        assert flag["threshold"] == 35000.0
        assert flag["retest_ratio"] == 0.64
        # and the gate itself must no longer contain a bare assert on
        # the floor (grep-level pin: the crash class cannot come back)
        import inspect

        src = inspect.getsource(bench._stream_throughput)
        assert "assert rate >= floor_evs" not in src
