"""Star-schema breadth queries (SURVEY.md §7.3 M7a).

Beyond reference parity: standard scan/filter/join/agg/rank shapes over
the driver's TPC-H-ish tables, exercising every relational surface at
the scale the engine targets. Join strategy is explicit: dimension
tables (region/nation/customer/supplier/part — small even at 100 TB
fact scale) are broadcast; only fact-side aggregations shuffle.

All money arithmetic goes through integer cents (order-independent,
bit-exact vs the oracle — see operators.windows.cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from flink_wsr_project_spark.operators.topn import global_topn, topn_per_group
from flink_wsr_project_spark.plans.registry import register
from flink_wsr_project_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# Q1-style pricing summary
# ---------------------------------------------------------------------------

_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) / 100.0 AS sum_charge,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / count(*) / 100.0 AS avg_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / count(*) / 100.0 AS avg_price,
       sum(CAST(round(l_discount * 10000) AS BIGINT)) / count(*) / 10000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_PRICING_ORACLE, tags=("tpch", "A1"))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: 2-key groupBy, 8 aggregates,
    predicate pushed to the parquet scan (only 7 of 11 columns read)."""
    li = load_table(spark, "lineitem", sf_dir)

    def c(expr, scale=100):
        return F.round(expr * scale).cast("long")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(c(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
            (F.sum(c(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(c(disc_price)) / 100.0).alias("sum_disc_price"),
            (F.sum(c(charge)) / 100.0).alias("sum_charge"),
            (F.sum(c(F.col("l_quantity"))) / F.count("*") / 100.0).alias("avg_qty"),
            (F.sum(c(F.col("l_extendedprice"))) / F.count("*") / 100.0).alias("avg_price"),
            (F.sum(c(F.col("l_discount"), 10000)) / F.count("*") / 10000.0).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority (3-way join + top-10)
# ---------------------------------------------------------------------------

_SHIPPING_PRIORITY_ORACLE = """
SELECT order_id, revenue, order_date, rank FROM (
  SELECT order_id, revenue, order_date,
         row_number() OVER (ORDER BY revenue DESC, order_id) AS rank
  FROM (
    SELECT l_orderkey AS order_id,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
  )
) WHERE rank <= 10
"""


@register("shipping_priority_topn", oracle=_SHIPPING_PRIORITY_ORACLE, tags=("tpch", "R1", "J1"))
def shipping_priority_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: customer⋈orders⋈lineitem, revenue per order,
    global top-10. customer is broadcast; orders⋈lineitem shuffles on
    orderkey once and the aggregation reuses that partitioning. The
    top-10 is TakeOrderedAndProject (distributed partial heaps), never
    a single-partition window over every qualifying order."""
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > "1998-01-01")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("l_orderkey").alias("order_id"), F.col("o_orderdate"))
        .agg((F.sum(rev) / 100.0).alias("revenue"))
        .select(
            "order_id", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
        )
    )
    return global_topn(agg, "revenue", 10, tiebreakers=["order_id"]).select(
        "order_id", "revenue", "order_date", "rank"
    )


# ---------------------------------------------------------------------------
# Q5-style local-supplier volume (6-way join)
# ---------------------------------------------------------------------------

_NATION_VOLUME_ORACLE = """
SELECT n_name AS nation,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("nation_volume", oracle=_NATION_VOLUME_ORACLE, tags=("tpch", "J1", "A1"))
def nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: revenue by supplier nation within one
    region. Every dimension side is broadcast; the plan has exactly one
    shuffle (the final groupBy on n_name), which is what survives a
    100× fact scale-up."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(rev) / 100.0).alias("revenue"), F.count("*").alias("n_items"))
        .select("nation", "revenue", "n_items")
    )


# ---------------------------------------------------------------------------
# Top-N per group over a join (rank breadth: per-nation top customers)
# ---------------------------------------------------------------------------

_TOP_CUSTOMERS_ORACLE = """
SELECT nation, customer_id, total_spend, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY nation
                               ORDER BY total_spend DESC, customer_id) AS rank
  FROM (
    SELECT n_name AS nation, c_custkey AS customer_id,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
  )
) WHERE rank <= 3
"""


@register("top_customers_per_nation", oracle=_TOP_CUSTOMERS_ORACLE, tags=("tpch", "R1"))
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by total order value per nation — the reference's
    per-window top-N shape (R1) applied to a categorical partition."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    agg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_custkey").alias("customer_id"))
        .agg((F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_spend"))
    )
    return topn_per_group(
        agg, ["nation"], "total_spend", 3, tiebreakers=["customer_id"]
    ).select("nation", "customer_id", "total_spend", "rank")


# ---------------------------------------------------------------------------
# Semi/anti join breadth (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------

_ORDERS_NO_LINES_ORACLE = """
SELECT o_orderkey AS order_id, o_orderstatus AS status
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


@register("orders_without_lineitems", oracle=_ORDERS_NO_LINES_ORACLE, tags=("tpch", "J2"))
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti join — the set-difference side channel
    shape (reference's unmatched-pays, J2) as a standalone operator."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .select(F.col("o_orderkey").alias("order_id"), F.col("o_orderstatus").alias("status"))
    )


# ---------------------------------------------------------------------------
# Rollup / set operations (SURVEY §2.9 Q7: absent in the reference,
# native in Spark — included for engine completeness)
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
"""


@register("orders_rollup", oracle=_ROLLUP_ORACLE, tags=("tpch", "rollup"))
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, year): hierarchical subtotals + grand total in
    one pass (Expand + single shuffle)."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    j = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("yr"), "o_totalprice")
    )
    out = j.rollup("n_name", "yr").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_price"),
    )
    return out.select(
        F.coalesce("n_name", F.lit("ALL")).alias("nation"),
        F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("order_year"),
        "n_orders",
        "total_price",
    )


_SETOPS_ORACLE = """
SELECT user_id, 'purchaser_never_error' AS segment FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT user_id, 'clicker_and_viewer' AS segment FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
)
"""


@register("user_segments_setops", oracle=_SETOPS_ORACLE, tags=("setops",))
def user_segments_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL over user cohorts."""
    events = load_table(spark, "events", sf_dir)

    def ids(et: str) -> DataFrame:
        return events.filter(F.col("event_type") == et).select("user_id").distinct()

    never_err = ids("purchase").exceptAll(ids("error")).distinct()
    both = ids("click").intersect(ids("view"))
    return never_err.withColumn("segment", F.lit("purchaser_never_error")).unionAll(
        both.withColumn("segment", F.lit("clicker_and_viewer"))
    )


# ---------------------------------------------------------------------------
# CUBE: all subtotal combinations in one pass
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("orders_cube", oracle=_CUBE_ORACLE, tags=("tpch", "cube"))
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (status, priority): all 4 grouping combinations via one
    Expand + single shuffle (vs 4 separate scans)."""
    orders = load_table(spark, "orders", sf_dir)
    out = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("total_price"),
    )
    return out.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "n_orders",
        "total_price",
    )


# ---------------------------------------------------------------------------
# Q14-style promo revenue (conditional aggregation over a broadcast join)
# ---------------------------------------------------------------------------

_PROMO_ORACLE = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       100.0 * sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                        ELSE 0 END)
             / sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS promo_pct,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate)
"""


@register("promo_revenue", oracle=_PROMO_ORACLE, tags=("tpch", "join"))
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share per ship-year. part is broadcast, so the
    fact table never shuffles for the join — the only exchange is the
    final tiny per-year aggregation."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return (
        j.groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).alias("promo_pct"),
            (F.sum(rev) / 100.0).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q4-style order priority check (EXISTS → left-semi join)
# ---------------------------------------------------------------------------

_PRIORITY_CHECK_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


@register("order_priority_check", oracle=_PRIORITY_CHECK_ORACLE, tags=("tpch", "semi-join"))
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (no fact-row duplication, dedup-free);
    the date filter prunes orders before the shuffle."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    lineitem = load_table(spark, "lineitem", sf_dir)
    sj = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sj.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
# Q22-style: above-average-balance customers with no orders
# (scalar subquery + anti join)
# ---------------------------------------------------------------------------

_IDLE_RICH_ORACLE = """
WITH avg_bal AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) / count(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, count(*) AS n_customers,
       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
FROM customer c, avg_bal
WHERE CAST(round(c_acctbal * 100) AS BIGINT) > ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


@register("idle_rich_customers", oracle=_IDLE_RICH_ORACLE, tags=("tpch", "anti-join"))
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no orders since 2000.
    Scalar subquery (global avg balance, broadcast as a 1-row cross
    join) + NOT EXISTS as a left-anti join; both anti-join inputs are
    pre-pruned (balance filter / date filter) before the shuffle."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(bal_cents) / F.count("*")).alias("ab"))
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(bal_cents > F.col("ab"))
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        (F.sum(bal_cents) / 100.0).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Q13-style: distribution of orders per customer (left join + histogram)
# ---------------------------------------------------------------------------

_ORDER_HISTOGRAM_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, count(*) AS n_customers FROM per_cust GROUP BY n_orders
"""


@register("customer_order_histogram", oracle=_ORDER_HISTOGRAM_ORACLE, tags=("tpch", "histogram"))
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-customer histogram (Q13 shape). The fact side is
    pre-aggregated to one row per custkey BEFORE the outer join, so the
    join input is |customers|, not |orders|; zero-order customers come
    from the left join's null side."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust_orders = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    per_cust = customer.join(
        per_cust_orders, customer.c_custkey == per_cust_orders.o_custkey, "left"
    ).select(F.coalesce("cnt", F.lit(0)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# Q6-style forecast revenue (pure scan-side filter + aggregate)
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue", oracle=_Q6_ORACLE, tags=("tpch",))
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: every predicate reaches the parquet scan (date range,
    discount band, quantity cap), then a single global aggregate — the
    canonical scan-bound query; zero joins, one tiny shuffle."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        (F.sum(F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")) / 100.0).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q10-style returned-item revenue (fact-fact join + dims + top-N)
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
WITH rev AS (
  SELECT o.o_custkey,
         sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS rc
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
)
SELECT c_custkey, c_name, n_name, rc / 100.0 AS revenue, rank FROM (
  SELECT c.c_custkey, c.c_name, n.n_name, r.rc,
         row_number() OVER (ORDER BY r.rc DESC, c.c_custkey) AS rank
  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
             JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE rank <= 20
"""


@register("returned_item_revenue", oracle=_Q10_ORACLE, tags=("tpch", "join"))
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: lost-revenue ranking for customers who returned
    items. lineitem is pre-filtered (returnflag pushed to the scan) and
    pre-aggregated per custkey BEFORE the dimension joins; customer and
    nation broadcast."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rc = F.sum(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    ).alias("rc")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(rc)
    )
    j = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    ranked = global_topn(
        j.select("c_custkey", "c_name", "n_name", "rc"),
        "rc", 20, tiebreakers=["c_custkey"],
    )
    return ranked.select(
        "c_custkey", "c_name", "n_name", (F.col("rc") / 100.0).alias("revenue"), "rank"
    )


# ---------------------------------------------------------------------------
# Q7-style bilateral trade volume (supplier nation <-> customer nation)
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, sum(cents) / 100.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


@register("bilateral_trade_volume", oracle=_Q7_ORACLE, tags=("tpch", "join"))
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two nations per year, in
    both directions. Both nation filters are applied INSIDE the
    broadcast dimension sides (supplier+nation, customer+nation), so
    lineitem and orders are each cut to ~2/25 of rows before the one
    fact-fact shuffle join on orderkey."""
    nations = ("NATION_1", "NATION_2")
    nat = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin(*nations))
    sup = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, "orders", sf_dir).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    li = load_table(spark, "lineitem", sf_dir).join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(cents) / 100.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8-style market share (one nation's share of a region's import revenue)
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) AS BIGINT)
         AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       sum(CASE WHEN supp_nation = 'NATION_5' THEN cents ELSE 0 END) / CAST(sum(cents) AS DOUBLE)
         AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
         n2.n_name AS supp_nation
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN region ON n1.n_regionkey = r_regionkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
GROUP BY o_year
"""


@register("market_share", oracle=_Q8_ORACLE, tags=("tpch", "join"))
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of revenue sold into ASIA per
    order-year. Numerator and denominator accumulate as integer cents
    in ONE aggregate pass (conditional sum, no second scan); the share
    is a single long/long IEEE division — bit-exact cross-engine."""
    nat_c = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    cust = (
        load_table(spark, "customer", sf_dir)
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sup = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(load_table(spark, "nation", sf_dir)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, "orders", sf_dir).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    li = load_table(spark, "lineitem", sf_dir).join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", cents).otherwise(F.lit(0))
    ).alias("nation_cents")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(nation_cents, F.sum(cents).alias("total_cents"))
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            (F.col("nation_cents") / F.col("total_cents").cast("double")).alias("mkt_share"),
        )
    )


# ---------------------------------------------------------------------------
# Q12-flavored late-shipment split by order priority
# ---------------------------------------------------------------------------

_LATE_SHIP_ORACLE = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""


@register("late_shipment_priority", oracle=_LATE_SHIP_ORACLE, tags=("tpch", "join"))
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the schema has no shipmode/commitdate,
    so lateness = shipped >= 90 days after order date): urgent-vs-other
    line counts per ship year. A genuine fact-fact join — orders is NOT
    broadcast-able at 100 TB — so both sides shuffle once on orderkey
    (sort-merge; bucketing both tables on orderkey would remove it) and
    orders is pruned to 3 columns before the exchange."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q18-style large-volume customers
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey AS order_id,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS total_price,
       sum_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
) big JOIN orders ON big.l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
"""


@register("large_volume_customers", oracle=_Q18_ORACLE, tags=("tpch", "semi-join"))
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300, with
    their customer. The HAVING-filtered aggregate is tiny (<1% of
    orders) so it broadcasts INTO orders — the orders scan never
    shuffles; customer broadcasts as usual."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            F.col("o_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            (F.round(F.col("o_totalprice") * 100).cast("long") / 100.0).alias("total_price"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (non-hierarchical — neither cube nor rollup)
# ---------------------------------------------------------------------------

_GROUPING_SETS_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


@register("orders_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("tpch", "grouping-sets"))
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent one-dimension rollups
    (by status, by priority) in ONE scan + ONE shuffle via Expand,
    where the naive form is two scans unioned. Identical SQL runs on
    both engines."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Q16-flavored supplier variety (distinct agg over a broadcast join)
# ---------------------------------------------------------------------------

_SUPPLIER_VARIETY_ORACLE = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt,
       count(*) AS line_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25
GROUP BY p_brand, p_size
"""


@register("supplier_variety", oracle=_SUPPLIER_VARIETY_ORACLE, tags=("tpch", "distinct"))
def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 flavor (no partsupp table in the testdata, so supplier
    variety comes from lineitem): distinct suppliers per (brand, size).
    part broadcasts with its filter applied inside the build side; the
    distinct-agg expands to the standard two-phase plan — shuffle on
    (brand, size, suppkey) then (brand, size) — no per-group Set
    buffering anywhere."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_size") <= 25)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Q9-style product-type profit (multi-way join, derived cost)
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT nation, o_year, sum(profit_cents) / 100.0 AS profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           - CAST(round(p_retailprice * l_quantity * 10) AS BIGINT) AS profit_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%red%'
)
GROUP BY nation, o_year
"""


@register("product_profit", oracle=_Q9_ORACLE, tags=("tpch", "join"))
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table, so unit cost is derived as
    10% of p_retailprice): profit per supplier-nation per order-year
    for parts matching a name pattern. part (with the LIKE filter
    inside the build side) and supplier+nation broadcast into
    lineitem, cutting the fact before its one shuffle join with
    orders on orderkey; the final (nation, year) aggregate is tiny.
    Profit is a difference of two independently-rounded cent values —
    order-independent, bit-exact cross-engine.

    Reference scope note: joins/agg breadth beyond the reference per
    SURVEY.md §7.3 M7."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%"))
    nat = load_table(spark, "nation", sf_dir)
    sup = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir)
    profit_cents = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        - F.round(F.col("p_retailprice") * F.col("l_quantity") * 10).cast("long")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(profit_cents) / 100.0).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q2-style min-cost supplier (min-per-group + join-back rank)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT p_partkey, p_name, s_name, best_cents / 100.0 AS best_price
FROM (
  SELECT p_partkey, p_name, s_name, best_cents,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY best_cents, s_suppkey) AS rn
  FROM (
    SELECT l_partkey, l_suppkey,
           min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS best_cents
    FROM lineitem GROUP BY l_partkey, l_suppkey
  ) cat
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20 AND r_name = 'EUROPE'
) WHERE rn = 1
"""


@register("min_price_supplier", oracle=_Q2_ORACLE, tags=("tpch", "rank", "R1"))
def min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: the supplier catalog is derived
    from observed lineitem unit prices): for each STANDARD mid-size
    part, the EUROPE supplier with the lowest observed unit price.
    Q2's correlated MIN subquery is re-expressed as min-per-group +
    rank-1 join-back: one shuffle for the (part, supplier) catalog
    aggregate, broadcast dimension joins, one rank partition on
    p_partkey. Unit price is IEEE double division rounded to cents —
    identical on both engines; s_suppkey breaks ties."""
    cat = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
            ).alias("best_cents")
        )
    )
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    reg = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    nat = load_table(spark, "nation", sf_dir).join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    ranked = topn_per_group(
        cat.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")),
        ["p_partkey"],
        "best_cents",
        1,
        tiebreakers=["s_suppkey"],
        descending=False,
    )
    return ranked.select(
        "p_partkey", "p_name", "s_name", (F.col("best_cents") / 100.0).alias("best_price")
    )


# ---------------------------------------------------------------------------
# Q11-style important parts (group value vs global-total scalar subquery)
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH pv AS (
  SELECT l_partkey AS part_id,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  GROUP BY l_partkey
)
SELECT part_id, value_cents / 100.0 AS part_value
FROM pv WHERE value_cents * (SELECT count(*) FROM pv) > 2 * (SELECT sum(value_cents) FROM pv)
"""


@register("important_parts", oracle=_Q11_ORACLE, tags=("tpch", "scalar-subquery"))
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp: inventory value is observed
    lineitem value supplied from a nation group): parts whose value
    exceeds 2x the MEAN part value — scale-invariant, so the result
    stays non-empty at every SF (a fixed fraction-of-total threshold
    goes empty as |parts| grows). The global (count, total) is a 1-row
    broadcast (scalar-subquery shape), never a second fact pass; the
    compare is pure integer cross-multiplication (value*n > 2*total),
    so no float epsilon can disagree cross-engine."""
    nat = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    sup = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    pv = (
        load_table(spark, "lineitem", sf_dir)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("part_id"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("value_cents"))
    )
    total = pv.agg(
        F.sum("value_cents").alias("total_cents"), F.count("*").alias("n_parts")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select("part_id", (F.col("value_cents") / 100.0).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q15-style top supplier (max-revenue scalar subquery)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS supp_id,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
FROM rev JOIN supplier ON supp_id = s_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
"""


@register("top_revenue_supplier", oracle=_Q15_ORACLE, tags=("tpch", "scalar-subquery"))
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in a quarter. The view
    becomes a per-supplier cent aggregate (one shuffle over the
    date-pruned scan); the MAX is a 1-row broadcast joined back with
    integer equality (exact ties surface all winners, as in the spec —
    no float compare)."""
    rev = (
        load_table(spark, "lineitem", sf_dir)
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supp_id"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("rev_cents")
        )
    )
    best = rev.agg(F.max("rev_cents").alias("max_cents"))
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(best), F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(sup), F.col("supp_id") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_cents") / 100.0).alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q17-style small-quantity revenue (per-part average via window)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 7.0 / 100.0 AS avg_yearly,
       count(*) AS n_lines
FROM (
  SELECT l_extendedprice,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
         sum(CAST(round(l_quantity * 100) AS BIGINT))
           OVER (PARTITION BY l_partkey) AS sum_qc,
         count(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
)
WHERE qty_cents * 5 * cnt < sum_qc
"""


@register("small_qty_revenue", oracle=_Q17_ORACLE, tags=("tpch", "window"))
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lineitems whose quantity is below 20%
    of the part's average. Q17's correlated AVG subquery becomes a
    window sum/count over l_partkey: the brand filter broadcasts into
    lineitem first (~4% survives), then ONE shuffle on partkey serves
    the window, and `qty*5*cnt < sum` keeps the 0.2×avg compare in
    exact integer math. No second fact scan, no join-back."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, "lineitem", sf_dir).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    w = W.partitionBy("l_partkey")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    small = (
        li.withColumn("qty_cents", qty_cents)
        .withColumn("sum_qc", F.sum("qty_cents").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .filter(F.col("qty_cents") * 5 * F.col("cnt") < F.col("sum_qc"))
    )
    return small.agg(
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 7.0 / 100.0).alias(
            "avg_yearly"
        ),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q19-style disjunctive-predicate revenue (OR-of-ANDs join filter)
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("brand_size_revenue", oracle=_Q19_ORACLE, tags=("tpch", "disjunctive"))
def brand_size_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue matching an OR of three (brand, size,
    quantity) conjunction groups. The part-only implication of the
    disjunction (brand IN ... AND size <= 15) is applied INSIDE the
    broadcast build side, and the lineitem-only implication
    (quantity in [1, 30]) prunes the fact scan — both derived by
    hand because a disjunction straddling two tables defeats automatic
    pushdown; the exact OR evaluates post-join on the survivors."""
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34") & (F.col("p_size") <= 15)
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg((F.sum(cents) / 100.0).alias("revenue"), F.count("*").alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Q21-style waiting suppliers (sole-late-supplier per multi-supplier order)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, numwait, rank FROM (
  SELECT s_name, numwait,
         row_number() OVER (ORDER BY numwait DESC, s_name) AS rank
  FROM (
    SELECT s_name, count(*) AS numwait FROM (
      SELECT max(CASE WHEN late THEN l_suppkey END) AS bad_supp
      FROM (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 365 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
      )
      GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) > 1
         AND count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1
    ) JOIN supplier ON bad_supp = s_suppkey
    GROUP BY s_name
  )
) WHERE rank <= 10
"""


@register("waiting_suppliers", oracle=_Q21_ORACLE, tags=("tpch", "R1"))
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receiptdate column: "late" is shipped >365
    days after the order date): top-10 suppliers who were the SOLE
    late supplier on finalized multi-supplier orders. Q21's
    EXISTS/NOT-EXISTS double self-join is re-expressed as one
    per-order aggregate — distinct suppliers, distinct late suppliers,
    and (when exactly one) that supplier's id — so the fact is scanned
    ONCE and shuffled once on orderkey, instead of three lineitem
    scans. s_name breaks ranking ties."""
    orders = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late_supp", F.when(late, F.col("l_suppkey")))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("late_supp").alias("n_late"),
            F.max("late_supp").alias("bad_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    counts = (
        per_order.join(F.broadcast(sup), F.col("bad_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
    return global_topn(counts, "numwait", 10, tiebreakers=["s_name"]).select(
        "s_name", "numwait", "rank"
    )


# ---------------------------------------------------------------------------
# Q20-style concentrated suppliers (share-of-part threshold via window)
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, count(*) AS n_parts
FROM (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, qty_c, sum(qty_c) OVER (PARTITION BY l_partkey) AS total_c
    FROM (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
  ) WHERE qty_c * 10 > total_c * 3
)
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


@register("concentrated_suppliers", oracle=_Q20_ORACLE, tags=("tpch", "window"))
def concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availqty: "excess" is shipping
    >30% of a part's annual volume): per supplier, how many red parts
    they dominated in 1997. The nested available-quantity subquery
    becomes per-(part, supplier) sums + a window total over part —
    the (part, supplier) shuffle is reused by the window (same key
    prefix), and the share test `qty*10 > total*3` is integer-exact."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%"))
    shipped = (
        load_table(spark, "lineitem", sf_dir)
        .filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"))
    )
    dominant = shipped.withColumn(
        "total_c", F.sum("qty_c").over(W.partitionBy("l_partkey"))
    ).filter(F.col("qty_c") * 10 > F.col("total_c") * 3)
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        dominant.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("n_parts"))
    )
