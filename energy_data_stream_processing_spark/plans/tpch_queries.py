"""Analytical join/aggregation queries over the TPC-H-ish driver tables.

The reference's only join shape is a semi-join cohort filter (SURVEY.md Q19);
these queries demonstrate the engine's general join/agg capability — and the
physical strategies that matter at 100 TB: broadcast of small dimensions,
co-partitioned sort-merge for fact-fact joins, partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.adapter import load_table
from .catalog import register


def _fr(expr: str, scale: int = 2) -> str:
    f = float(10**scale)
    return f"floor(({expr}) * {f} + 0.5) / {f}"


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    headline=True,
    doc="TPC-H Q1-shaped pricing summary: scan-heavy partial aggregation; "
    "decimal-exact sums. Filter + projection push down to the parquet scan.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "top_customer_revenue",
    oracle="""
SELECT c.c_mktsegment,
  count(DISTINCT o.o_custkey) AS buying_customers,
  cast(sum(cast(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    headline=True,
    doc="Fact-to-dimension join: customer is broadcast (tiny dim), so the "
    "orders fact never shuffles for the join — the only shuffle is the final "
    "small groupBy on segment.",
)
def q_top_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct(F.col("o_custkey")).alias("buying_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "segment_revenue"
            ),
        )
    )


@register(
    "shipping_priority",
    oracle="""
SELECT l.l_orderkey,
  cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    headline=True,
    doc="TPC-H Q3-shaped: selective dim filter broadcast into a fact-fact "
    "join, then top-k (orderBy+limit → TakeOrderedAndProject, no full sort).",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    # Broadcast only the filtered customer dim; the orders↔lineitem leg stays
    # a shuffled join on orderkey (AQE may still broadcast it when the
    # filtered orders side turns out small at runtime).
    filtered_orders = o.where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")).join(
        F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
        o.o_custkey == c.c_custkey,
    )
    return (
        li.join(filtered_orders, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4-shaped EXISTS cohort: left-semi join on orderkey with a "
    "correlated range predicate — the semi side never duplicates rows, so "
    "the count is join-shape-proof. Scale: both sides shuffle on orderkey; "
    "the filter on orders pushes to its scan first.",
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cohort = o.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")).join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return cohort.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "parts_never_ordered",
    oracle="""
SELECT p_brand, count(*) AS n_parts
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
GROUP BY p_brand
""",
    doc="Anti-join (NOT EXISTS): parts never ordered at max quantity, by brand. "
    "Scale: part is the small side but anti-join semantics pin the "
    "preserved side; lineitem projects only (l_partkey, l_quantity) and the "
    "quantity filter pushes to its scan before the shuffle.",
)
def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    recent = li.where(F.col("l_quantity") >= 49)
    return (
        p.join(recent, p.p_partkey == recent.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "customer_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, count(*) AS n_customers
FROM per_cust
GROUP BY n_orders
""",
    doc="TPC-H Q13-shaped: LEFT OUTER join preserving order-less customers, "
    "then a two-level aggregation (per-customer count -> histogram). "
    "Scale: first agg reuses the join's partitioning on c_custkey; the "
    "histogram agg is tiny.",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "revenue_rollup",
    oracle="""
SELECT n.n_name AS nation, c.c_mktsegment AS segment,
  cast(sum(cast(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
""",
    headline=True,
    doc="GROUP BY ROLLUP over nation x segment (beyond-reference grouping "
    "sets). Both dims broadcast; the rollup Expand feeds one partial-agg "
    "shuffle keyed by the grouping-set id.",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"),
                F.col("o_totalprice"))
        .rollup("nation", "segment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "top_customer_revenue_salted",
    oracle="""
SELECT c.c_mktsegment,
  count(DISTINCT o.o_custkey) AS buying_customers,
  cast(sum(cast(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Same logical query as top_customer_revenue but through the "
    "salted-join skew mitigation (operators/skew.py) — the oracle gate "
    "proves the salted plan is result-identical to the plain join.",
)
def q_top_customer_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = salted_join(orders, customer, on=[("o_custkey", "c_custkey")], salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count_distinct(F.col("o_custkey")).alias("buying_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "segment_revenue"
        ),
    )


@register(
    "value_percentiles_by_type",
    oracle="""
SELECT event_type,
  count(*) AS n,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  quantile_cont(value, 0.99) AS p99
FROM events GROUP BY event_type
""",
    headline=True,
    doc="Exact interpolated percentiles per event type (Spark `percentile`"
    " == DuckDB `quantile_cont`, bit-identical). Scale note: exact "
    "percentiles sort per group; at 100 TB swap to approx_percentile "
    "(t-digest) — same call site, documented accuracy trade.",
)
def q_value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5D)").alias("p50"),
        F.expr("percentile(value, 0.9D)").alias("p90"),
        F.expr("percentile(value, 0.99D)").alias("p99"),
    )


@register(
    "hourly_event_pivot",
    oracle="""
SELECT date_trunc('hour', ts) AS hour,
  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY 1
""",
    headline=True,
    doc="Pivot: hourly event counts, one column per event type (explicit "
    "value list -> deterministic schema, single-pass grouped aggregation — "
    "no second job to discover pivot values).",
)
def q_hourly_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )
