"""Batch sources (SURVEY.md §2.1 S1, S7, S8).

The reference reads CSVs with pandas inference (send_to_kinesis.py:26,34)
and pulls its keyed store to the driver via paginated boto3 queries
(daily_kpi_aggregation.py:45-82).  The engine replaces both with
distributed scans using explicit schemas:

- CSV scan with a pinned ``StructType`` — no inference pass, stable types.
- Parquet scan of the trips store partitioned by ``date`` — Catalyst
  partition pruning + predicate pushdown replace DynamoDB's
  ``KeyConditionExpression`` / ``FilterExpression`` (S7), and the data
  never round-trips through the driver (fixes the collect-then-parallelize
  scalability cliff at daily_kpi_aggregation.py:58-90).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from real_time_trip_processing_project_spark import schemas

#: CSV timestamp format used by the reference data ("YYYY-MM-DD HH:MM:SS").
TS_FMT = "yyyy-MM-dd HH:mm:ss"


def read_trip_start_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: trip-start CSV with explicit schema (no inference)."""
    return spark.read.csv(
        path, header=True, schema=schemas.TRIP_START, timestampFormat=TS_FMT
    )


def read_trip_end_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: trip-end CSV with explicit schema (no inference)."""
    return spark.read.csv(
        path, header=True, schema=schemas.TRIP_END, timestampFormat=TS_FMT
    )


def read_trips_store(spark: SparkSession, path: str) -> DataFrame:
    """S7: scan of the keyed trips store (parquet partitioned by date).

    Filters on ``date`` prune partitions; filters on ``status`` push down
    to parquet row groups — the Catalyst-native equivalent of the
    reference's KeyConditionExpression + FilterExpression
    (daily_kpi_aggregation.py:45-55).
    """
    return spark.read.schema(schemas.TRIPS).parquet(path)


def load_fixture(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver fixture table with its pinned schema.

    An explicit ``.schema(...)`` keeps column pruning/pushdown intact and
    guards against footer-type drift across scale factors.  ``events.ts``
    has drifted between fixture generations (TIMESTAMP(NANOS) vs
    TIMESTAMP(MICROS)), so its unit is read from the parquet footer —
    one metadata fetch, no data scan — and nanos fixtures are read as
    long nanos then truncated to a microsecond TimestampType (same
    truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP).
    Spark cannot read TIMESTAMP(NANOS) columns natively, hence the
    raw-long detour on that branch.
    """
    if table == "events":
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        path = f"{sf_dir}/{table}.parquet"
        unit = pq.read_schema(path).field("ts").type.unit
        if unit != "ns":
            return spark.read.schema(schemas.EVENTS).parquet(path)
        raw = spark.read.schema(schemas.EVENTS_RAW).parquet(path)
        # integer `div` — float division would lose precision on ~1e18 ns
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    schema = schemas.FIXTURE_TABLES[table]
    return spark.read.schema(schema).parquet(f"{sf_dir}/{table}.parquet")


def _parquet_row_groups(df: DataFrame, cap: int) -> int | None:
    """Total parquet row groups beneath ``df``, or ``None`` when unknowable
    cheaply (non-parquet source, no scan, more files than ``cap`` — at
    which point the source is parallel enough that the answer no longer
    matters).  Footer-metadata reads only; no data scan, no Spark job."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > cap:
        return None
    import pyarrow.parquet as pq

    total = 0
    for uri in files:
        if not uri.endswith(".parquet"):
            return None
        if uri.startswith("file:"):
            # inputFiles() returns percent-encoded URIs (spaces, unicode);
            # pq.read_metadata wants the raw filesystem path — unquote or
            # such paths raise and silently skip the spread (ADVICE r15)
            from urllib.parse import unquote, urlparse

            path = unquote(urlparse(uri).path)
        else:
            path = uri
        try:
            total += pq.read_metadata(path).num_row_groups
        except Exception:
            return None
    return total


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a DataFrame whose source cannot feed at
    least half the cores — otherwise CPU-heavy per-row work (shingling,
    codecs, interpreted scoring) serializes onto one or two tasks.  At
    real scale the source has ≫ cores row groups and this is a no-op
    (the repartition of raw rows would be a pure tax there).

    TWO observables gate the spread, because each lies alone:

    - ``rdd.getNumPartitions()`` — the byte-range SPLIT count.  A
      mid-size single-file source yields ≥ cores/2 splits, but parquet
      reads are ROW-GROUP atomic: a file whose row count is below the
      writer's row-group size (pyarrow default 1 Mi rows) is ONE row
      group, so every split but one reads 0 rows and the whole scan
      lands on a single task (r15 sf30 probe: `sim_cosine_topk`'s
      pinned-expr scoring ran 39 minutes on task 15-of-32 while 31
      tasks read 904 footer bytes each).
    - parquet footer ``num_row_groups`` — the true upper bound on scan
      parallelism, read driver-side from the file metadata (no job).
      Checked only when the split count alone would skip the spread.

    ``SPARK_GRAFT_NO_SPREAD=1`` turns it into an unconditional no-op —
    the paired-A/B switch tools/ab_spread.py uses to attribute a query's
    delta to THIS repartition vs box load (r9: sim_ann_lsh +30% raw was
    flagged the round this path landed)."""
    # explicit value check: "0"/"false" must mean spread STAYS ON — a
    # truthiness test would silently flip the A/B arm for the operator
    # who exports NO_SPREAD=0 to force spreading
    if os.environ.get("SPARK_GRAFT_NO_SPREAD", "").lower() in (
        "1", "true", "yes",
    ):
        return df
    cores = df.sparkSession.sparkContext.defaultParallelism
    floor = max(2, cores // 2)
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(cores)
    groups = _parquet_row_groups(df, cap=max(cores, 64))
    if groups is not None and groups < floor:
        return df.repartition(cores)
    return df


def load_table(spark: SparkSession, path: str, schema, fmt: str = "parquet"):
    """Typed batch read of any supported format (parquet/orc/json/csv).

    Always schema-first: an explicit schema keeps column pruning and
    filter pushdown intact (parquet/ORC), skips the double-scan schema
    inference pass (JSON/CSV), and pins types across scale factors —
    the same discipline `load_fixture` applies to the driver tables.
    """
    return spark.read.schema(schema).format(fmt).load(path)


def write_table(
    df, path: str, fmt: str = "parquet", mode: str = "overwrite",
    partition_by: str | None = None,
) -> None:
    """Batch write in any supported format; partitioned when asked.

    Format guidance at 100 TB: parquet/ORC for analytics (columnar,
    predicate pushdown, compression); JSON-lines only at the edges
    (wire interchange — it costs ~5-10× scan time and loses pushdown)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.save(path)
