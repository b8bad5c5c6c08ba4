"""SparkSession factory with scale-oriented defaults.

The reference delegates all engine-level execution to Glue's Spark with
default configs; here we pin the settings that matter for a 100 TB
deployment and for deterministic local testing:

- AQE on (runtime coalescing, skew-join splitting, broadcast demotion).
- UTC session timezone (the reference mixes naive local datetimes; spec
  schedules daily at 00:00 UTC — README.md:109).  Also required for
  value-identical comparison against DuckDB's UTC-naive timestamps.
- Arrow enabled for the few Pandas-UDF operators (similarity, multimodal).
- Shuffle partitions sized to the local core count; on a real cluster AQE
  coalesces from a higher initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Heap for the single local-mode JVM (driver + all executor threads).
#: Spark's default is 1g — discovered the hard way when a 16× corpus
#: scaling run OOM'd building a broadcast relation: in local mode every
#: operator's working memory comes out of this one heap, so leaving the
#: default means 32 executor threads share 1 GiB.  Sized well below the
#: box (override via SPARK_GRAFT_DRIVER_MEM); only effective for the
#: process that CREATES the JVM, which is every fresh bench/test run.
DEFAULT_DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")


def get_spark(
    app_name: str = "trip-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", DEFAULT_DRIVER_MEM)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet writer defaults for the trips store
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # fixture generations have shipped `events.ts` as TIMESTAMP(NANOS),
        # which Spark cannot read natively — surface it as a long (nanos);
        # readers.load_fixture sniffs the footer and converts when needed
        # (harmless for micros-typed generations)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep driver logs quiet in tests
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
