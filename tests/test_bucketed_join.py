"""Bucketed co-located join: both sides bucketed by the join key must
join with ZERO shuffle exchanges (the storage-layout optimization for
repeated fact-fact joins at scale)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.operators import bucketing
from real_time_trip_processing_project_spark.sources.readers import load_fixture

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # (warehouse dir is a static conf — managed tables land in the default
    # spark-warehouse and are dropped in the finally block)
    orders = load_fixture(spark, SF, "orders")
    lineitem = load_fixture(spark, SF, "lineitem")
    bucketing.write_bucketed(orders, "orders_b", "o_orderkey", 8)
    bucketing.write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8)
    try:
        o = bucketing.read_table(spark, "orders_b")
        li = bucketing.read_table(spark, "lineitem_b")
        # disable broadcast so the test exercises the bucketed SMJ path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_linenumber", "l_extendedprice"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        # and it still computes the right thing
        n = joined.count()
        want = (
            load_fixture(spark, SF, "lineitem")
            .join(orders, orders.o_orderkey == F.col("l_orderkey"))
            .count()
        )
        assert n == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
