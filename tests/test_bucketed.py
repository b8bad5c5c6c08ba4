"""Bucketed-table layout beyond the co-located join (which
test_bucketed_join.py proves): bucket-key aggregation without a
shuffle, bucket pruning under key-equality filters, external-path
tables, and write-side file alignment."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.operators.bucketing import (
    read_table,
    write_bucketed,
)
from real_time_trip_processing_project_spark.sources.readers import load_fixture

SF = "/root/testdata/sf0.001"


def _plan(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def orders_ext(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed_ext")
    orders = load_fixture(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(
        orders, "orders_ext_b", "o_custkey", 8, path=str(base / "orders")
    )
    yield str(base / "orders")
    spark.sql("DROP TABLE IF EXISTS orders_ext_b")


def test_external_table_data_lands_at_path(spark, orders_ext):
    files = [f for f in os.listdir(orders_ext) if f.endswith(".parquet")]
    assert files, "external bucketed table must write under the given path"


def test_aligned_write_is_one_file_per_bucket(spark, orders_ext):
    """repartition(n, key) before bucketBy ⇒ exactly one file per
    non-empty bucket, not tasks × buckets."""
    files = [f for f in os.listdir(orders_ext) if f.endswith(".parquet")]
    assert len(files) <= 8, files


def test_bucketed_agg_has_no_exchange(spark, orders_ext):
    """Grouping by the bucket key consumes the storage distribution —
    the aggregate plans without any Exchange."""
    agg = read_table(spark, "orders_ext_b").groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
    assert "Exchange" not in _plan(agg)
    # and matches the plain-parquet aggregate
    plain = (
        load_fixture(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
    )
    assert sorted(agg.collect()) == sorted(plain.collect())


def test_bucket_pruning_on_key_filter(spark, orders_ext):
    """Equality on the bucket key scans 1/n buckets.  autoBucketedScan
    disables the bucketed layout for plans that don't consume the
    distribution (a bare filter) — force it on to observe pruning."""
    ob = read_table(spark, "orders_ext_b")
    some_key = ob.select("o_custkey").first()[0]
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = _plan(ob.filter(F.col("o_custkey") == some_key), "formatted")
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
