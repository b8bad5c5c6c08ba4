"""Bucketed co-located joins: the storage-layout answer to repeated
big-big joins (SURVEY.md §4 scale notes).

A 100 TB fact-fact join (e.g., the trip start⋈end correlate done in
batch) shuffles both sides every run.  Writing both tables bucketed by
the join key makes the join **shuffle-free forever after**: each bucket
pair is read co-located and merged directly — Catalyst recognizes the
matching bucket specs and drops both Exchanges.

This module wraps the two halves:

- :func:`write_bucketed` — `bucketBy(n, key).sortBy(key)` managed-table
  write (bucketing metadata lives in the catalog, so it must be a table,
  not a bare path).
- :func:`read_table` — plain catalog read; joins between tables bucketed
  the same way plan with zero exchanges (asserted in
  tests/test_bucketed_join.py).

Bucket-count guidance at scale: choose n so each bucket file lands in
the 128 MB–1 GB range after compression; both sides must use the SAME n
(or integer multiples, with `spark.sql.bucketing.coalesceBucketsInJoin`)
for the co-location to hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    mode: str = "overwrite",
    path: str | None = None,
    align: bool = True,
) -> None:
    """Persist ``df`` as a table bucketed+sorted by ``key``.

    ``path`` makes it an external table (data at ``path``, metadata in
    the catalog) — managed otherwise.  ``align`` pre-repartitions by the
    bucket key so each write task owns whole buckets: without it the
    layout is (tasks × non-empty buckets) files — the small-files
    problem that dominates list/open cost at warehouse scale."""
    if align:
        df = df.repartition(n_buckets, key)
    writer = df.write.mode(mode).bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read of a bucketed table (bucket spec flows into planning)."""
    return spark.table(table)
