"""Explicit schemas for every table the engine touches.

The reference is entirely schema-inferred (pandas CSV inference at
send_to_kinesis.py:26,34; schemaless DynamoDB items; dict-inferred Spark
schema at daily_kpi_aggregation.py:90).  At 100 TB inference is both a
correctness hazard (type flapping across files) and a performance hazard
(an extra pass over the data), so the engine pins every schema as DDL.

Money/metric columns are ``double`` (the DuckDB-oracle-friendly choice;
``DecimalType(12,2)`` is the lossless alternative — see SURVEY.md §1).
Nullable numeric columns in trip_end (rate_code, passenger_count,
payment_type, trip_type — 531/4999 null in the reference data) are typed
as nullable and kept as SQL NULLs rather than NaN (the reference silently
drops those records via a Decimal(NaN) failure — SURVEY.md §3.2 note c).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Trip domain (reference data model — FIXTURES.md §A)
# ---------------------------------------------------------------------------

#: Schema of trip-start events (reference data/trip_start.csv header;
#: fields projected by trip_processor.py:43-50).
TRIP_START = T.StructType(
    [
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("pickup_location_id", T.IntegerType(), True),
        T.StructField("dropoff_location_id", T.IntegerType(), True),
        T.StructField("vendor_id", T.IntegerType(), True),
        T.StructField("pickup_datetime", T.TimestampType(), True),
        T.StructField("estimated_dropoff_datetime", T.TimestampType(), True),
        T.StructField("estimated_fare_amount", T.DoubleType(), True),
    ]
)

#: Schema of trip-end events (reference data/trip_end.csv header;
#: fields merged by trip_processor.py:65-74).
TRIP_END = T.StructType(
    [
        T.StructField("dropoff_datetime", T.TimestampType(), True),
        T.StructField("rate_code", T.DoubleType(), True),
        T.StructField("passenger_count", T.DoubleType(), True),
        T.StructField("trip_distance", T.DoubleType(), True),
        T.StructField("fare_amount", T.DoubleType(), True),
        T.StructField("tip_amount", T.DoubleType(), True),
        T.StructField("payment_type", T.DoubleType(), True),
        T.StructField("trip_type", T.DoubleType(), True),
        T.StructField("trip_id", T.StringType(), False),
    ]
)

#: The correlated trips store (engine equivalent of DynamoDB ``TripData``,
#: PK=(date, trip_id) — reference README.md:44-45,77-78).  All start fields
#: + all end fields + the state-machine columns.
TRIPS = T.StructType(
    [f for f in TRIP_START.fields]
    + [f for f in TRIP_END.fields if f.name != "trip_id"]
    + [
        T.StructField("date", T.DateType(), True),  # to_date(pickup_datetime)
        T.StructField("status", T.StringType(), False),  # Started | Completed
        T.StructField("updated_at", T.TimestampType(), False),  # upsert dedup key
    ]
)

#: Daily KPI document (reference daily_kpi_aggregation.py:120-125).
DAILY_KPIS = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField(
            "metrics",
            T.StructType(
                [
                    T.StructField("trip_date", T.StringType(), False),
                    T.StructField("total_fare", T.DoubleType(), True),
                    T.StructField("count_trips", T.LongType(), False),
                    T.StructField("average_fare", T.DoubleType(), True),
                    T.StructField("max_fare", T.DoubleType(), True),
                    T.StructField("min_fare", T.DoubleType(), True),
                ]
            ),
            False,
        ),
        T.StructField("timestamp", T.StringType(), False),
    ]
)

#: Raw stream-event envelope: the JSON-serialized trip event plus the
#: routing metadata the Lambda consumer sees (stream name from
#: eventSourceARN — trip_processor.py:39).
STREAM_EVENT = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),  # trip_start | trip_end
        T.StructField("payload", T.StringType(), False),  # JSON event body
        T.StructField("ingest_ts", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver fixture tables (/root/testdata — FIXTURES.md §B)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

# NOTE: `ts` is stored as parquet TIMESTAMP(NANOS); Spark reads it as a
# long (see session.py nanosAsLong) and `load_fixture` converts it to
# TimestampType (microsecond truncation — matches DuckDB's ns→us cast).
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

FIXTURE_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
