"""Batch format matrix: parquet / ORC / JSON-lines / CSV round-trip with
explicit schemas, plus pushdown reaching the columnar scans."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_trip_processing_project_spark.sources.readers import (
    load_fixture,
    load_table,
    write_table,
)

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def orders_slice(spark):
    return (
        load_fixture(spark, SF, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(500)
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_preserves_rows_and_types(spark, tmp_path, orders_slice, fmt):
    path = str(tmp_path / fmt)
    df = orders_slice
    if fmt == "csv":
        write_table(df, path, fmt="csv", mode="overwrite")
        back = spark.read.schema(SCHEMA).format("csv").load(path)
    else:
        write_table(df, path, fmt=fmt)
        back = load_table(spark, path, SCHEMA, fmt)
    assert back.schema == SCHEMA
    assert sorted(back.collect()) == sorted(df.collect())


def test_orc_scan_gets_pushdown(spark, tmp_path, orders_slice):
    path = str(tmp_path / "orc_pd")
    write_table(orders_slice, path, fmt="orc")
    back = load_table(spark, path, SCHEMA, "orc").filter(
        F.col("o_orderstatus") == "F"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "EqualTo(o_orderstatus,F)" in plan.replace(" ", "")


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A store whose later files carry an extra column must read as the
    UNION schema under mergeSchema, with nulls for the old files — the
    additive-evolution contract an append store needs to survive
    producer upgrades without rewrites."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id"), F.lit("v1").alias("tag")
    ).write.parquet(path + "/gen=1")
    spark.range(3, 6).select(
        F.col("id"),
        F.lit("v2").alias("tag"),
        F.lit(1.5).alias("score"),  # new column in generation 2
    ).write.parquet(path + "/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "tag", "score", "gen"}
    rows = {r["id"]: (r["tag"], r["score"]) for r in df.collect()}
    assert rows[0] == ("v1", None) and rows[5] == ("v2", 1.5)
    assert len(rows) == 6
