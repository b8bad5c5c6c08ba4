"""Temporal joins (EXTENSION tier): as-of join and binned range join.

The reference's streaming correlator is a point-in-time keyed lookup
(trip_processor.py:59-78: "the state of trip_id when the end event
arrives").  Its batch generalization over time-series is the as-of join
— "for each left row, the most recent right row at or before it" — and
its windowed cousin is the range join.  Spark has neither natively, and
the naive inequality-join formulation of either is a per-key
near-cross-product that Catalyst can only plan as a broadcast
nested-loop join — quadratic work that falls over long before 100 TB.

Both operators here are shuffle-bounded:

- :func:`asof_join` — tagged union + running ``last(ignorenulls)``
  window.  ONE shuffle on the key, zero row explosion, linear in
  |L| + |R| per key.  This is the sort-merge as-of algorithm expressed
  declaratively (the window sort IS the merge).
- :func:`range_join_binned` — time-bucketed equi-join.  Each probe row
  duplicates into 2 hour-buckets, turning an O(|L|·|R|) nested loop
  into a hash/sort-merge equi-join on (key, bucket) with a residual
  range filter.  Bucket width = window width ⇒ exactly 2 candidate
  buckets per probe regardless of data volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    out_prefix: str = "asof_",
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: attach to every left row the latest right row
    with the same key and ``right_ts <= left_ts`` (``<`` when
    ``inclusive=False``).

    Plan shape: union the two sides tagged, sort each key's timeline once
    inside a window, and carry the last non-null right payload forward —
    no join operator at all, so there is nothing to explode or
    broadcast.  Ties inside the right side resolve to the largest payload
    struct (deterministic: order by the struct itself).

    Output: all ``left`` columns + one ``{out_prefix}{c}`` column per
    right value column (NULL when no right row precedes).
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct names")
    payload = F.struct(*[F.col(c) for c in right_value_cols])
    # inclusive: right sorts before left at equal ts (payload visible);
    # strict: left first, so an equal-ts right row is outside the frame.
    l_side, r_side = (1, 0) if inclusive else (0, 1)
    r = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(r_side).alias("_side"),
        payload.alias("_rv"),
    )
    l = left.select(
        *left.columns, F.col(left_ts).alias("_t"), F.lit(l_side).alias("_side")
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side", "_rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == l_side)
        .select(
            *left.columns,
            *[
                F.col(f"_asof.{c}").alias(f"{out_prefix}{c}")
                for c in right_value_cols
            ],
        )
    )


def range_join_binned(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    probe_ts: str,
    build_ts: str,
    window_sec: int,
) -> DataFrame:
    """Pairs (probe, build) with equal keys and ``build_ts`` in the
    half-open window ``[probe_ts - window_sec, probe_ts)``.

    Probe rows explode into their own and the preceding time bucket
    (bucket width = window width, so a window can only straddle those
    two); build rows keep one bucket.  The join is then a plain equi-join
    on (keys…, bucket) — shuffle-partitioned, AQE-eligible, never a
    nested loop — and the exact window predicate runs as a residual
    filter on the candidates.

    Non-key column names of the two inputs must be disjoint
    (``probe_ts`` / ``build_ts`` included).
    """
    if probe_ts == build_ts:
        raise ValueError("probe_ts and build_ts must be distinct names")
    # unix_timestamp truncates to whole seconds — containment is
    # unaffected: bucket boundaries are integer seconds, so the truncated
    # value lands in the same bucket as the exact one.
    p_bin = F.floor(F.unix_timestamp(F.col(probe_ts)) / window_sec)
    probe_b = probe.withColumn(
        "_bin", F.explode(F.array(p_bin - 1, p_bin))
    )
    build_b = build.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(build_ts)) / window_sec)
    )
    return (
        probe_b.join(build_b, [*keys, "_bin"])
        .filter(
            (
                F.col(build_ts)
                >= F.col(probe_ts) - F.expr(f"INTERVAL {window_sec} SECONDS")
            )
            & (F.col(build_ts) < F.col(probe_ts))
        )
        .drop("_bin")
    )
