"""TPC-H query shapes, batch 2 (EXTENSION tier; SURVEY.md §2.6).

The reference's analytics surface is one KPI aggregation
(daily_kpi_aggregation.py); the engine's declared north star is a
complete relational query surface, so the catalogue carries the TPC-H
shapes as the canonical workload mix.  Batch 1 (Q1/Q5/Q6/Q10/Q14/Q18)
lives in plans/extended.py; this module adds the shapes that exercise
plan patterns batch 1 does not: EXISTS/NOT-EXISTS decorrelation (Q4,
Q21), disjunctive predicate pushdown (Q19), left-join histogram
aggregation (Q13), scalar-subquery max (Q15), self-agg theta filter
(Q17), bidirectional nation pairing (Q7), and a conditional-share ppm
ratio (Q8).

Fixture adaptations (the driver's TPC-H-ish tables lack some columns —
no partsupp table, no l_shipmode/l_commitdate/l_receiptdate, no
c_phone/o_comment): each query keeps its canonical PLAN SHAPE but
rewrites the predicate onto available columns; the adaptation is noted
per query.  Q2/Q9/Q11/Q16/Q20 need partsupp, which the fixture lacks —
batch 3 (r9, end of this module) closes them with a DERIVED partsupp
computed by identical integer arithmetic in both engines, completing
TPC-H 22/22.

Exactness disciplines as everywhere in the catalogue: money flows as
exact integer cents (plans/core.py:_cents), ratios as integer ppm, and
every integer aggregate on the oracle side is CAST back to BIGINT
(DuckDB HUGEINT widening — see plans/catalog.py conventions).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.plans.catalog import register
from real_time_trip_processing_project_spark.plans.core import _cents, _cents_sql
from real_time_trip_processing_project_spark.sources.readers import load_fixture

#: Discounted revenue in exact cents, floored — the Q10 discipline:
#: cents × integer basis points with floor division, bit-exact in both
#: engines (l_discount is 2-decimal).
_REV_SQL = (
    f"(({_cents_sql('l_extendedprice')}"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))) // 100)"
)


def _rev_cents():
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_bp = F.round(F.col("l_discount") * 100).cast("long")
    return F.floor(price_c * (100 - disc_bp) / 100).cast("long")


@register(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    tags=["EXT", "J2", "A6"],
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): per-priority count of
    one quarter's orders that have at least one qualifying line — the
    canonical EXISTS-decorrelation query.  (Adaptation: the fixture has
    no l_commitdate/l_receiptdate, so "late line" becomes "returned
    line", l_returnflag = 'R' — the EXISTS shape is unchanged.)

    Plan at scale: the subquery decorrelates to a LEFT SEMI join on
    orderkey; the date window prunes orders at the scan, the flag
    filter prunes lineitem before the semi probe, and the final
    aggregate is a 5-row map-side partial."""
    orders = load_fixture(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    flagged = load_fixture(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            flagged,
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents
        FROM supplier
        JOIN lineitem  ON s_suppkey = l_suppkey
        JOIN orders    ON o_orderkey = l_orderkey
        JOIN customer  ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    tags=["EXT", "J3", "A6"],
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between one
    nation PAIR in either direction, by shipment year — the
    dual-aliased dimension pattern (nation joined twice under different
    roles) with a disjunctive cross-role predicate.

    Plan at scale: both nation aliases broadcast; the disjunction over
    (supp_nation, cust_nation) cannot be pushed below the joins but
    collapses to a tiny in-filter after the broadcasts; the two-year
    ship window prunes lineitem at the scan."""
    supplier = load_fixture(spark, sf_dir, "supplier")
    customer = load_fixture(spark, sf_dir, "customer")
    orders = load_fixture(spark, sf_dir, "orders")
    lineitem = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    n1 = load_fixture(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_fixture(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
        WITH all_sales AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {_REV_SQL} AS rev,
                   s_nationkey
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST((1000000 * CAST(sum(CASE WHEN s_nationkey = 3
                                             THEN rev ELSE 0 END) AS BIGINT))
                    // CAST(sum(rev) AS BIGINT) AS BIGINT)
                   AS mkt_share_ppm,
               CAST(sum(rev) AS BIGINT) AS total_revenue_cents
        FROM all_sales
        GROUP BY o_year
    """,
    tags=["EXT", "J3", "A6"],
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one supplier-nation's
    share of a region's revenue in one part category, per order year —
    the conditional-share pattern (CASE inside sum over the same
    rows).  Share is integer ppm of exact cents — the funnel_conversion
    discipline; no derived-ratio doubles.  (Adaptation: p_type has 6
    coarse values here, and the supplier nation is keyed by
    s_nationkey = 3 since fixture nation names are synthetic.)

    Plan at scale: the deepest join tree in the catalogue alongside Q5
    — region/nation/part broadcast, orders⋈lineitem is the one big
    shuffle, both date and type filters push to their scans.  At
    corpus scale the ppm numerator (1e6 × cents) stays < 2^63 for any
    realistic yearly revenue; beyond that the moments move to
    DECIMAL(38,0) (the corpus_zipf_fit pattern)."""
    part = load_fixture(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    supplier = load_fixture(spark, sf_dir, "supplier")
    customer = load_fixture(spark, sf_dir, "customer")
    nation = load_fixture(spark, sf_dir, "nation")
    region = load_fixture(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    orders = load_fixture(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    lineitem = load_fixture(spark, sf_dir, "lineitem")
    sales = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_cents().alias("rev"),
            "s_nationkey",
        )
    )
    agg = sales.groupBy("o_year").agg(
        F.sum(F.when(F.col("s_nationkey") == 3, F.col("rev")).otherwise(0)).alias(
            "nat"
        ),
        F.sum("rev").alias("tot"),
    )
    return agg.select(
        "o_year",
        F.expr("(1000000 * nat) div tot").alias("mkt_share_ppm"),
        F.col("tot").alias("total_revenue_cents"),
    )


@register(
    "tpch_q12_late_lines",
    oracle="""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS low_line_count
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY l_linestatus
    """,
    tags=["EXT", "J1", "A6"],
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority split): per-category
    counts of one year's LATE lines, split by order priority with
    paired CASE sums — the conditional-count pivot.  (Adaptation: no
    l_shipmode/l_receiptdate in the fixture; category = l_linestatus
    and "late" = shipped > 60 days after the order date — which makes
    the join carry a non-equi residual predicate comparing columns of
    BOTH sides, a shape none of the other TPC-H entries has.)

    Plan at scale: equi join on orderkey with the cross-table date
    residual evaluated post-join; the ship-year filter prunes lineitem
    at the scan; the aggregate is a 2-row map-side partial."""
    orders = load_fixture(spark, sf_dir, "orders")
    lineitem = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey,
                   CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    tags=["EXT", "J1", "A6"],
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): histogram of
    per-customer order counts INCLUDING zero — the left-outer-join +
    two-level aggregation pattern, the only shape where customers with
    no orders must survive to the count.  (Adaptation: the o_comment
    NOT-LIKE filter becomes a priority exclusion — still a join-side
    predicate on the OUTER side's nullable relation, which is the part
    that matters: it must filter the join, not the customers.)

    Plan at scale: count(o_orderkey) counts non-NULL only, so empty
    customers land in bucket 0; first aggregate shuffles on custkey
    (same key as the join — one exchange serves both), second is a
    histogram-sized partial."""
    customer = load_fixture(spark, sf_dir, "customer")
    orders = load_fixture(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum({_REV_SQL}) AS BIGINT) AS total_revenue_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_cents
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue_cents = (SELECT max(total_revenue_cents)
                                     FROM revenue)
    """,
    tags=["EXT", "A6", "J1"],
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    quarterly revenue — the scalar-subquery-on-an-aggregate pattern
    (the revenue view is built once and probed against its own max).

    Spark form (r17): the per-supplier aggregate is persisted
    DISK_ONLY and consumed twice — once by a scalar max aggregate
    (two-stage, never single-partition) that attaches back as a 1-row
    broadcast equality join, once as the probe side.  The previous
    shape sent the WHOLE aggregate through a ``Window.partitionBy()``
    single-partition exchange — bounded by |suppliers|, which is fine
    until |suppliers| itself is billions (100 TB TPC-H); the persist
    keeps lineitem scanned once.  Ties all surface, matching the
    SQL = max semantics.  Exact cents make cross-engine max equality
    well-defined (no double wobble at the top)."""
    lineitem = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    supplier = load_fixture(spark, sf_dir, "supplier")
    revenue = (
        lineitem.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_cents()).alias("total_revenue_cents"))
        .persist(StorageLevel.DISK_ONLY)
    )
    mx = revenue.agg(F.max("total_revenue_cents").alias("mx"))
    top = revenue.join(
        F.broadcast(mx), F.col("total_revenue_cents") == F.col("mx")
    )
    return top.join(
        supplier, F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "total_revenue_cents")


@register(
    "tpch_q17_small_quantity",
    oracle=f"""
        WITH pl AS (
            SELECT l_partkey,
                   CAST(round(l_quantity * 100) AS BIGINT) AS q_c,
                   {_cents_sql('l_extendedprice')} AS price_c
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#3'
        ),
        stats AS (
            SELECT l_partkey,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(q_c) AS BIGINT) AS s
            FROM pl GROUP BY l_partkey
        )
        SELECT CAST(sum(price_c) AS BIGINT) AS total_cents,
               count(*) AS n_lines
        FROM pl JOIN stats USING (l_partkey)
        WHERE 5 * n * q_c < s
    """,
    tags=["EXT", "A6", "J1"],
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lines whose quantity is below 20% of their part's average — the
    self-aggregate theta-filter pattern (the fact joins an aggregate of
    itself and compares against it).

    Exactness: ``q < 0.2·avg`` is algebraically ``5·n·q < Σq`` — pure
    integer arithmetic on centi-quantity units, so the boundary cannot
    wobble between engines (the DuckDB double ``avg`` would).  Plan at
    scale: the brand filter prunes part to a broadcastable dim, the
    per-part stats aggregate shuffles on partkey (same key as the
    probe join — the exchange is reused), and at 60k parts the stats
    side broadcasts."""
    part = load_fixture(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    lineitem = load_fixture(spark, sf_dir, "lineitem")
    pl = lineitem.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("q_c"),
        _cents("l_extendedprice").alias("price_c"),
    )
    stats = pl.groupBy("l_partkey").agg(
        F.count("*").alias("n"), F.sum("q_c").alias("s")
    )
    return (
        pl.join(stats, "l_partkey")
        .filter(F.lit(5) * F.col("n") * F.col("q_c") < F.col("s"))
        .agg(
            F.sum("price_c").alias("total_cents"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
        SELECT CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=["EXT", "J1", "F1"],
)
def tpch_q19_disjunctive_predicates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    one global aggregate under an OR of three (brand, size, quantity)
    conjunctions spanning BOTH join sides — the classic test of
    disjunction handling: Catalyst must derive the single-side
    implications (p_brand IN (b1,b2,b3), l_quantity in the union
    range) and push them below the join even though the full predicate
    can only be evaluated above it.  (Adaptation: no
    l_shipmode/l_shipinstruct conjuncts — the cross-side OR structure
    is the point and is preserved.)"""
    part = load_fixture(spark, sf_dir, "part")
    lineitem = load_fixture(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        lineitem.join(
            F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
        )
        .filter(cond)
        .agg(
            F.sum(_rev_cents()).alias("revenue_cents"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders     ON o_orderkey = l1.l_orderkey
        JOIN nation     ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """,
    tags=["EXT", "J2", "A6"],
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    in one nation that were the SOLE faulty supplier on a
    multi-supplier finalized order — the EXISTS + NOT-EXISTS
    correlated-pair pattern, the hardest decorrelation in the TPC-H
    deck.  (Adaptation: "late" — receiptdate > commitdate — becomes
    l_returnflag = 'R'; both subqueries keep their correlated
    orderkey-equality + suppkey-inequality structure.)

    Spark form: LEFT SEMI join for the EXISTS, LEFT ANTI for the NOT
    EXISTS, both on orderkey with the suppkey inequality as a residual
    — exactly how Catalyst decorrelates the SQL form.  Plan at scale:
    lineitem appears three times but each probe side is filtered
    before its join; nation broadcasts; the semi/anti probes shuffle
    on orderkey so all three line relations co-partition."""
    nation = load_fixture(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supplier = load_fixture(spark, sf_dir, "supplier")
    orders = load_fixture(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    lineitem = load_fixture(spark, sf_dir, "lineitem")
    l1 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("s_key")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_okey"), F.col("l_suppkey").alias("l2_skey")
    )
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_okey"), F.col("l_suppkey").alias("l3_skey")
    )
    sole = (
        l1.join(
            l2,
            (F.col("o_key") == F.col("l2_okey"))
            & (F.col("s_key") != F.col("l2_skey")),
            "left_semi",
        ).join(
            l3,
            (F.col("o_key") == F.col("l3_okey"))
            & (F.col("s_key") != F.col("l3_skey")),
            "left_anti",
        )
    )
    return (
        sole.join(orders, F.col("o_key") == F.col("o_orderkey"))
        .join(supplier, F.col("s_key") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
        WITH pos AS (
            SELECT c_custkey, c_nationkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
            FROM customer
            WHERE c_acctbal > 0.0
              AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        ),
        avgv AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(bal_c) AS BIGINT) AS s
            FROM pos
        )
        SELECT c_nationkey,
               count(*) AS numcust,
               CAST(sum(bal_c) AS BIGINT) AS totacctbal_cents
        FROM pos, avgv
        WHERE bal_c * n > s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    tags=["EXT", "J2", "A6"],
)
def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): wealthy-but-inactive
    customers per country — a scalar average threshold plus an
    anti-join against the order history.  (Adaptation: no c_phone, so
    "country code in a 7-set" becomes c_nationkey in a 7-set.)

    Exactness: ``bal > avg(bal)`` is ``bal_c · n > Σbal_c`` in integer
    cents — no double average crosses the engines.  Plan at scale: the
    scalar (n, Σ) aggregate broadcasts as a 1-row cross join (Spark
    plans the scalar subquery the same way); the NOT EXISTS is a LEFT
    ANTI shuffle on custkey against a custkey-projected orders scan."""
    pos = (
        load_fixture(spark, sf_dir, "customer")
        .filter(
            (F.col("c_acctbal") > 0.0)
            & F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
        )
    )
    avgv = pos.agg(
        F.count("*").alias("n"), F.sum("bal_c").alias("s")
    )
    orders = load_fixture(spark, sf_dir, "orders").select("o_custkey")
    return (
        pos.crossJoin(F.broadcast(avgv))
        .filter(F.col("bal_c") * F.col("n") > F.col("s"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_c").alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 3 (r9): the five partsupp queries — TPC-H 22/22.
#
# The fixture ships no partsupp table, so these five shapes were "out of
# scope" through r8.  dbgen itself derives partsupp deterministically
# from the part/supplier key spaces (4 suppliers per part via modular
# arithmetic); the same move works here: a derived partsupp computed by
# IDENTICAL integer arithmetic in both engines, so every query keeps a
# full hash oracle.  0-based adaptation of dbgen's formula, with
# availqty/supplycost as deterministic integer functions of the keys:
#
#   S  = count(supplier)                     (scalar, 1-row broadcast)
#   ps_suppkey(p, i)      = (p·(S div 4 + 1) + i) mod S,  i ∈ 0..3
#   ps_availqty(p, i)     = (7p + 11i) mod 9999 + 1
#   ps_supplycost_cents   = (419p + 73·ps_suppkey) mod 80001 + 10000
#
# The i-term is ADDITIVE, so the four suppkeys of a part are consecutive
# mod S — distinct for any S ≥ 4, upholding the (ps_partkey, ps_suppkey)
# primary key dbgen guarantees (a stride-form i·step can collide at small
# S, e.g. S=10 step=5 pairs i=0/2 and i=1/3, which would double-count
# lineitem matches in Q9 and emit duplicate rows in Q2); the
# multiplicative p-term scatters parts across the supplier space.
#
# Supplycost flows as exact integer cents like every money column in
# the catalogue.  Plan shape: partsupp is |part|×4 rows — dim-sized, so
# it broadcasts wherever a dim would; at 100 TB (where real partsupp is
# fact-sized) the same queries run with the derivation replaced by a
# parquet scan and AQE picking shuffle joins — the query bodies below
# never assume the derivation.
# ---------------------------------------------------------------------------

#: DuckDB CTEs for the derived partsupp — prefix for the five oracles.
_PARTSUPP_SQL = """
        scnt AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
        partsupp0 AS (
            SELECT p_partkey AS ps_partkey,
                   CAST((p_partkey * (s // 4 + 1) + t.i) % s
                        AS BIGINT) AS ps_suppkey,
                   CAST((p_partkey * 7 + t.i * 11) % 9999 + 1
                        AS BIGINT) AS ps_availqty
            FROM part, scnt, range(4) t(i)
        ),
        partsupp AS (
            SELECT ps_partkey, ps_suppkey, ps_availqty,
                   CAST((ps_partkey * 419 + ps_suppkey * 73) % 80001 + 10000
                        AS BIGINT) AS ps_supplycost_cents
            FROM partsupp0
        )"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (see module comment): 4 rows per part, exact
    integer columns, bit-identical to the oracle CTE.  The supplier
    count attaches as a 1-ROW broadcast cross join — the catalogue's
    standard no-driver-collect scalar attachment (the Q22 / corpus-
    scalar class; the BNLJ build side is one row at any scale)."""
    part = load_fixture(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("ps_partkey")
    )
    s_cnt = load_fixture(spark, sf_dir, "supplier").agg(
        F.count("*").cast("long").alias("s_total")
    )
    rows = (
        part.crossJoin(F.broadcast(s_cnt))
        .select(
            "ps_partkey",
            "s_total",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i0"),
        )
        .withColumn("i", F.col("i0").cast("long"))
    )
    sk = (
        F.col("ps_partkey") * (F.expr("s_total div 4") + F.lit(1))
        + F.col("i")
    ) % F.col("s_total")
    return rows.select(
        "ps_partkey",
        sk.cast("long").alias("ps_suppkey"),
        ((F.col("ps_partkey") * 7 + F.col("i") * 11) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        ((F.col("ps_partkey") * 419 + sk * 73) % 80001 + 10000)
        .cast("long")
        .alias("ps_supplycost_cents"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH {_PARTSUPP_SQL},
        eps AS (
            SELECT ps_partkey, ps_supplycost_cents, s_name, s_acctbal, n_name
            FROM partsupp
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        ),
        mn AS (
            SELECT ps_partkey,
                   CAST(min(ps_supplycost_cents) AS BIGINT) AS min_cost
            FROM eps GROUP BY ps_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               ps_supplycost_cents
        FROM eps
        JOIN mn USING (ps_partkey)
        JOIN part ON p_partkey = ps_partkey
        WHERE p_size IN (5, 15, 25, 45)
          AND ps_supplycost_cents = min_cost
    """,
    tags=["EXT", "J3", "A6"],
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the region-local supplier(s) offering it at minimum cost — the
    correlated-scalar-min pattern, written decorrelated (per-part min
    aggregate joined back on the part key, the only plan CBO or a human
    would pick).  (Adaptations: no p_mfgr → p_brand in the output; the
    type/size predicate becomes a size IN-list over fixture values.)

    Exactness: min over exact integer cents — cross-engine tie
    semantics are value-equality, and ALL tied suppliers surface (no
    LIMIT: a limit without a total order is nondeterministic across
    engines).  Plan at scale: region/nation/supplier broadcast into the
    partsupp scan, the min-aggregate shuffles on ps_partkey and its
    exchange is reused by the probe join (same key); with a real
    fact-sized partsupp both sides sort-merge on ps_partkey — one
    shuffle each, no re-partition."""
    supplier = load_fixture(spark, sf_dir, "supplier")
    nation = load_fixture(spark, sf_dir, "nation")
    region = load_fixture(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_fixture(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 45)
    )
    eps = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(
            supplier.join(
                F.broadcast(nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )),
                F.col("s_nationkey") == F.col("n_nationkey"),
            )
        ), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal",
                "n_name")
    )
    mn = eps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost")
    )
    return (
        eps.join(mn, "ps_partkey")
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                "ps_supplycost_cents")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
        WITH {_PARTSUPP_SQL}
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum({_REV_SQL}
                        - ps_supplycost_cents
                          * CAST(round(l_quantity) AS BIGINT))
                    AS BIGINT) AS profit_cents
        FROM lineitem
        JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
    tags=["EXT", "J3", "A6"],
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit by supplier nation
    and order year over parts matching a name pattern — the widest join
    tree in the suite (lineitem ⋈ partsupp ⋈ part ⋈ supplier ⋈ nation ⋈
    orders) with a non-sargable LIKE that still prunes via the part
    dim.  (Adaptation: '%green%' → '%red%' over fixture part names.)

    Exactness: profit = revenue cents − supplycost cents × integral
    quantity, all int64.  Plan at scale: part(filtered), partsupp,
    supplier, nation broadcast; lineitem ⋈ orders is the single big
    shuffle on orderkey.  With a real fact-sized partsupp the
    (partkey, suppkey) probe becomes the second big shuffle and AQE
    picks sort-merge — the query body is join-order-neutral, which is
    exactly what the CBO reorder test pins stats can exploit."""
    part = load_fixture(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supplier = load_fixture(spark, sf_dir, "supplier")
    nation = load_fixture(spark, sf_dir, "nation")
    orders = load_fixture(spark, sf_dir, "orders")
    lineitem = load_fixture(spark, sf_dir, "lineitem")
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(_partsupp(spark, sf_dir)),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(
                _rev_cents()
                - F.col("ps_supplycost_cents")
                * F.round(F.col("l_quantity")).cast("long")
            ).alias("profit_cents")
        )
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH {_PARTSUPP_SQL},
        nps AS (
            SELECT ps_partkey,
                   ps_supplycost_cents * ps_availqty AS v
            FROM partsupp
            JOIN supplier ON s_suppkey = ps_suppkey
            WHERE s_nationkey = 7
        )
        SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
        FROM nps
        GROUP BY ps_partkey
        HAVING 1000 * CAST(sum(v) AS BIGINT)
               > (SELECT CAST(sum(v) AS BIGINT) FROM nps)
    """,
    tags=["EXT", "J1", "A6", "A7"],
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose stock value at one
    nation's suppliers exceeds a fraction of that nation's total — a
    grouped aggregate HAVING-compared against a global scalar over the
    SAME relation.  (Adaptation: nation key 7; fraction 1/1000.)

    Exactness: ``1000·Σ_part > Σ_total`` in int64 — no double fraction.
    Spark form (r17): the per-part aggregate is persisted DISK_ONLY;
    the global total is a scalar aggregate over it (two-stage partial
    merge, never single-partition) attached back as the catalogue's
    standard 1-row broadcast cross join (the Q22 / corpus-scalar
    class).  The previous shape rode a ``Window.partitionBy()``
    single-partition exchange of the whole per-part relation —
    bounded by |parts|, which stops being small at 100 TB TPC-H.  The
    nation-filtered partsupp is still scanned and aggregated ONCE;
    the oracle's scalar subquery re-reads the CTE, same values."""
    supplier = load_fixture(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 7
    )
    nps = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(supplier), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = (
        nps.groupBy("ps_partkey")
        .agg(F.sum("v").alias("value_cents"))
        .persist(StorageLevel.DISK_ONLY)
    )
    tot = per_part.agg(F.sum("value_cents").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.lit(1000) * F.col("value_cents") > F.col("total"))
        .select("ps_partkey", "value_cents")
    )


@register(
    "tpch_q16_parts_supplier_relationship",
    oracle=f"""
        WITH {_PARTSUPP_SQL}
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 15, 22, 28, 35, 49)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=["EXT", "J2", "A6"],
)
def tpch_q16_parts_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) bucket, excluding a brand/type slice
    and a supplier denylist — the NOT-IN-subquery pattern, which must
    plan as a LEFT ANTI join, never a per-row subquery.  (Adaptations:
    the complaints comment-scan becomes the negative-balance suppliers;
    brand/type/size literals map onto fixture values.)

    Plan at scale: part(filtered) broadcasts into the partsupp scan;
    the denylist is dim-sized → broadcast anti-join (zero extra
    shuffles); count(DISTINCT) shuffles on the grouping key with the
    distinct expand — the one aggregate in the suite that genuinely
    needs the two-phase distinct plan."""
    part = load_fixture(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 15, 22, 28, 35, 49)
    )
    bad = load_fixture(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            F.broadcast(bad),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_promotion",
    oracle=f"""
        WITH {_PARTSUPP_SQL},
        shipped AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(round(l_quantity)) AS BIGINT) AS sq
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (
              SELECT ps_suppkey
              FROM partsupp
              JOIN shipped ON l_partkey = ps_partkey
                          AND l_suppkey = ps_suppkey
              WHERE ps_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_name LIKE 'red%')
                AND 2 * ps_availqty > sq)
    """,
    tags=["EXT", "J2", "A6"],
)
def tpch_q20_potential_promotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    region holding excess stock (availqty > ½ of what they shipped in a
    year) of parts in a name class — the nested double-semi-join
    pattern: IN(parts) inside IN(partsupp⋈shipped) probed by the
    supplier scan.  (Adaptations: nation → region EUROPE; 'forest%' →
    'red%'.)

    Exactness: the half threshold is ``2·availqty > Σqty`` in int64.
    Plan at scale: the year-filtered lineitem aggregate is the one big
    shuffle (keyed (partkey, suppkey)); the part name-class semi-join
    broadcasts; the outer membership is a LEFT SEMI to the supplier
    dim.  Both IN subqueries decorrelate to semi-joins — no per-row
    execution anywhere."""
    lineitem = load_fixture(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round("l_quantity")).cast("long").alias("sq")
    )
    red_parts = load_fixture(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    excess = (
        _partsupp(spark, sf_dir)
        .join(
            F.broadcast(red_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.lit(2) * F.col("ps_availqty") > F.col("sq"))
        .select("ps_suppkey")
    )
    nation = load_fixture(spark, sf_dir, "nation")
    region = load_fixture(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    return (
        load_fixture(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(excess),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
