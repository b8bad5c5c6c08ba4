"""Sinks: the keyed trips store (S5) and the daily KPI document (S9).

The reference's keyed store is DynamoDB with full-item upserts
(``put_item`` — trip_processor.py:54,78).  Vanilla Spark parquet has no
MERGE, so the engine uses the idiomatic append + dedup-on-read design:

- every emitted state transition is APPENDED to parquet partitioned by
  ``date`` (the DynamoDB partition key — README.md:44) with a
  monotonically increasing ``updated_at`` version;
- readers reconstruct current state with ``row_number() over
  (partition by trip_id order by updated_at desc)`` — S5's documented
  Spark mapping — so re-delivered micro-batches are harmless
  (at-least-once append + last-writer-wins read = effective upsert);
- a compaction pass can periodically rewrite partitions to one row per
  trip (same dedup query + overwrite), bounding read amplification.

At 100 TB: appends are partition-local (no shuffle), the dedup window
shuffles only the partitions a query actually reads after `date`
pruning, and compaction is embarrassingly parallel per date partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark import schemas

ORPHAN_STATUS = "Orphaned"

#: Fault-injection seam for crash-consistency tests: when set, called at
#: named points inside the foreachBatch sink body with ``(point,
#: batch_id)``; raising aborts the micro-batch mid-write exactly as a
#: driver/executor failure would (offsets WAL'd but the batch never
#: commits, so Structured Streaming re-runs it on restart).  ``None`` in
#: production — one predicate per batch, no other cost.
_CRASH_HOOK = None


def _crash_point(point: str, batch_id: int) -> None:
    if _CRASH_HOOK is not None:
        _CRASH_HOOK(point, batch_id)


def append_trip_batch(batch_df: DataFrame, batch_id: int, store_dir: str,
                      orphan_dir: str | None = None,
                      expect_orphans: bool = True) -> None:
    """foreachBatch body: version-stamp and append one micro-batch.

    ``updated_at`` encodes (batch_id, status rank) so dedup-on-read is
    deterministic under re-delivery: a retried batch rewrites identical
    rows and last-writer-wins picks the same winner.  Within a batch the
    only per-trip ordering that matters is Started → Completed, which the
    status rank encodes without relying on row order.

    ``expect_orphans=False`` (set by the pipeline when the correlator
    runs in buffer mode, which never emits ``Orphaned`` rows) collapses
    the batch to ONE action — no persist, no emptiness probe — shaving
    a cache materialization plus a probe job from every micro-batch.
    ``orphan_dir`` is still created empty so its path exists either way.
    """
    import os

    stamped = batch_df.withColumn(
        "updated_at",
        F.timestamp_micros(
            F.lit(int(batch_id)) * F.lit(10)
            + F.when(F.col("status") == "Completed", 1).otherwise(0)
        ),
    )
    if orphan_dir is not None:
        # the sink's external contract: the orphan path exists after the
        # first batch even when nothing was ever orphaned (a consumer
        # still needs an explicit schema to read an empty dir — see
        # start_trip_pipeline's docstring)
        os.makedirs(orphan_dir, exist_ok=True)
    if orphan_dir is None or not expect_orphans:
        stamped.filter(F.col("status") != ORPHAN_STATUS).write.mode(
            "append"
        ).partitionBy("date").parquet(store_dir)
        _crash_point("after_store_write", batch_id)
        return
    # two sinks = two actions on the same micro-batch plan; without a
    # persist the second action RE-EXECUTES the upstream stateful
    # operator (the correlator ran 2x per batch — measured as ~half the
    # pipeline's wall time before this cache)
    stamped = stamped.persist()
    try:
        orphans = stamped.filter(F.col("status") == ORPHAN_STATUS)
        trips = stamped.filter(F.col("status") != ORPHAN_STATUS)
        trips.write.mode("append").partitionBy("date").parquet(store_dir)
        _crash_point("between_dual_writes", batch_id)
        # orphan ends have no pickup date — quarantined unpartitioned
        # (reference logs-and-drops these; trip_processor.py:60-62).
        # The emptiness probe on the persisted frame is one limit-1 job,
        # far cheaper than the parquet commit protocol an empty write
        # still pays.
        if not orphans.isEmpty():
            orphans.drop("date").write.mode("append").parquet(orphan_dir)
    finally:
        stamped.unpersist()


def current_trips(spark: SparkSession, store_dir: str) -> DataFrame:
    """Dedup-on-read: latest version per trip (the S5 upsert view).

    'Completed' outranks 'Started' at equal version only as a tiebreak —
    versions are strictly increasing within a batch, so the rank order is
    effectively (updated_at desc).
    """
    raw = spark.read.schema(schemas.TRIPS).parquet(store_dir)
    w = Window.partitionBy("trip_id").orderBy(
        F.col("updated_at").desc(),
        F.when(F.col("status") == "Completed", 1).otherwise(0).desc(),
    )
    return (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact_trips(
    spark: SparkSession,
    store_dir: str,
    out_dir: str,
    date: str | None = None,
) -> None:
    """Rewrite the store to one current row per trip (periodic maintenance,
    bounding the append store's read amplification).

    With ``date`` set, only that partition is rewritten (dynamic partition
    overwrite — untouched dates in ``out_dir`` are preserved), which is the
    post-KPI maintenance shape: each day's partition is compacted exactly
    once, right after its daily aggregate is final.  Embarrassingly
    parallel per date partition at 100 TB.
    """
    cur = current_trips(spark, store_dir)
    if date is not None:
        cur = cur.filter(F.col("date") == date)
    (
        cur.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(out_dir)
    )


def write_kpi_document(kpi_row_df: DataFrame, out_root: str) -> str | None:
    """S9: one JSON object per day at ``{out}/{YYYY-MM}/{YYYY-MM-DD}.json``
    (daily_kpi_aggregation.py:137-148 layout).

    The KPI row is one row per day — a driver-side dump gives the exact
    single-file naming the reference uses; at scale this is a metadata
    write, not a data write.
    """
    import json
    import os

    rows = kpi_row_df.collect()
    if not rows:
        return None  # F3 empty-day guard (daily_kpi_aggregation.py:178-181)
    path = None
    for row in rows:
        d = row["date"]
        ym = d[:7]
        os.makedirs(os.path.join(out_root, ym), exist_ok=True)
        path = os.path.join(out_root, ym, f"{d}.json")
        with open(path, "w") as fh:
            json.dump(row.asDict(recursive=True), fh, indent=2)
    return path


def merge_upsert_trips(
    spark: SparkSession,
    store_dir: str,
    updates: DataFrame,
    out_dir: str,
) -> None:
    """Batch MERGE emulation over the partitioned parquet store: rows in
    ``updates`` (TRIPS schema) win over stored rows with the same
    ``trip_id``; only the date partitions the updates touch are
    rewritten (dynamic partition overwrite into ``out_dir``).  The
    result is a COMPLETE snapshot whatever ``out_dir`` started as:
    untouched date partitions are hard-linked in from the store
    (metadata-only; see :func:`_link_untouched_partitions`), so a fresh
    ``out_dir`` works and an existing snapshot copy is left as-is.

    This is the physical-upsert sibling of the logical append+
    dedup-on-read design: vanilla Spark parquet has no MERGE INTO, so
    the idiom is (1) partition-prune the target to affected dates, (2)
    anti-join out the superseded rows, (3) union the updates, (4)
    dynamic-overwrite only those partitions.  Work scales with touched
    partitions, never with store size.

    Precondition (the fine print every partition-pruned MERGE carries):
    a key's partition value must be immutable — here ``date`` derives
    from ``pickup_datetime``, fixed at trip start.  If an update could
    MOVE a trip to a different date, the superseded row in the old
    partition would sit outside the pruned target and survive; such a
    migration needs the old date included in the rewrite set."""
    dates = [r["date"] for r in updates.select("date").distinct().collect()]
    target = spark.read.schema(schemas.TRIPS).parquet(store_dir).filter(
        F.col("date").isin(dates)
    )
    kept = target.join(
        updates.select("trip_id").distinct(), "trip_id", "left_anti"
    )
    merged = kept.unionByName(updates)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(out_dir)
    )
    _link_untouched_partitions(store_dir, out_dir, {str(d) for d in dates})


def _link_untouched_partitions(
    store_dir: str, out_dir: str, touched: set[str]
) -> None:
    """Complete the merge snapshot: date partitions the MERGE did not
    rewrite are hard-linked from the store into ``out_dir`` (falling
    back to copy across filesystems).  Without this, a fresh ``out_dir``
    would silently contain ONLY the touched dates — dynamic partition
    overwrite preserves untouched partitions only if they already exist
    at the destination.  Linking is metadata-only per file — the local-
    filesystem analogue of a table format reusing unchanged data files
    in a new snapshot manifest (no data bytes move), so the merge still
    scales with touched partitions, not store size."""
    import os
    import shutil

    for entry in os.listdir(store_dir):
        if not entry.startswith("date="):
            continue
        if entry[len("date="):] in touched:
            continue
        src = os.path.join(store_dir, entry)
        dst = os.path.join(out_dir, entry)
        if not os.path.isdir(src):
            continue
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            s, d = os.path.join(src, fn), os.path.join(dst, fn)
            if os.path.isfile(s) and not os.path.exists(d):
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)
