"""Analytical join/aggregation queries over the TPC-H-ish driver tables.

The reference's only join shape is a semi-join cohort filter (SURVEY.md Q19);
these queries demonstrate the engine's general join/agg capability — and the
physical strategies that matter at 100 TB: size-gated broadcast of
dimensions (explicit hints ONLY on cardinality-BOUNDED frames — nation,
region, 1-row scalars; customer/supplier/part and their subsets scale
with SF, so their joins are left to the planner's size estimate + AQE,
which broadcasts them while they fit and degrades to shuffle joins at
the SF where a broadcast would OOM),
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
    doc="Fact-to-dimension join: customer auto-broadcasts via size stats (no hint — customer scales with SF; AQE shuffles it at extreme scale), so the "
    "orders fact never shuffles for the join — the only shuffle is the final "
    "small groupBy on segment.",
)
def q_top_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
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
    doc="TPC-H Q3-shaped: selective dim filter size-gated-broadcast into a fact-fact "
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
        c.where(F.col("c_mktsegment") == "BUILDING"),
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
    "sets). Nation broadcasts by hint, customer by size estimate; the rollup Expand feeds one partial-agg "
    "shuffle keyed by the grouping-set id.",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
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


@register(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
  cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    headline=True,
    doc="TPC-H Q5-shaped six-table join: region->nation restricts suppliers, "
    "the customer-nation == supplier-nation predicate rides the lineitem join. "
    "Scale: region/nation broadcast by hint (bounded); supplier/customer "
    "by size estimate (they scale with SF — AQE shuffles them past the "
    "broadcast threshold); orders<->lineitem is the "
    "one shuffled fact-fact join on orderkey; date filter pushes to the "
    "orders scan so the shuffle carries one year only.",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    asia_nations = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey
    )
    o_year = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(o_year, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(asia_nations), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@register(
    "volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  year(l.l_shipdate) AS l_year,
  cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
    doc="TPC-H Q7-shaped cross-border trade volume: the same nation dim joins "
    "twice under different roles (supplier side / customer side), with an "
    "inequality predicate between the two join results. Scale: both nation "
    "broadcasts are trivially small; the fact-fact orderkey join dominates "
    "and the two-year shipdate filter pushes to the lineitem scan.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(n2),
            (c.c_nationkey == F.col("n2.n_nationkey"))
            & (F.col("n1.n_nationkey") != F.col("n2.n_nationkey")),
        )
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("volume"))
    )


@register(
    "market_share",
    oracle="""
SELECT year(o.o_orderdate) AS o_year,
  cast(sum(CASE WHEN r2.r_name = 'ASIA'
        THEN cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))
        ELSE cast(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS asia_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
WHERE r1.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
GROUP BY year(o.o_orderdate)
""",
    doc="TPC-H Q8-shaped market share: nine-table join, nation/region joined "
    "twice (customer role filters, supplier role labels), CASE-sum ratio. "
    "The ratio divides two decimal-exact sums cast to double, so both "
    "engines divide identical operands (IEEE-deterministic). Scale: both "
    "fact sides shrink BEFORE the orderkey shuffle — lineitem by the "
    "broadcast part filter (~6x) with its supplier labels attached, orders "
    "by the broadcast Europe-customer cohort — so the one fact-fact "
    "exchange carries only qualifying rows (measured 2.7x cold at sf0.1 "
    "vs joining the raw facts first).",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").alias("mn1")
    n2 = load_table(spark, sf_dir, "nation").alias("mn2")
    r1 = load_table(spark, sf_dir, "region").alias("mr1")
    r2 = load_table(spark, sf_dir, "region").alias("mr2")
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))
    asia_vol = F.when(F.col("mr2.r_name") == "ASIA", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    # Reduce each fact independently before the orderkey shuffle: lineitem
    # keeps only STANDARD parts and picks up its supplier-region label;
    # orders keeps only Europe customers.
    li_std = (
        li.join(p.where(F.col("p_type") == "STANDARD"), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("mn2.n_nationkey"))
        .join(F.broadcast(r2), F.col("mn2.n_regionkey") == F.col("mr2.r_regionkey"))
        .select("l_orderkey", asia_vol.alias("asia_vol"), vol.alias("vol"))
    )
    europe_custs = (
        c.join(F.broadcast(n1), c.c_nationkey == F.col("mn1.n_nationkey"))
        .join(
            F.broadcast(r1.where(F.col("r_name") == "EUROPE")),
            F.col("mn1.n_regionkey") == F.col("mr1.r_regionkey"),
        )
        .select("c_custkey")
    )
    o_eur = o.join(europe_custs, o.o_custkey == F.col("c_custkey"), "left_semi")
    return (
        li_std.join(o_eur, li_std.l_orderkey == o_eur.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum("asia_vol").cast("double") / F.sum("vol").cast("double")).alias("asia_share")
        )
    )


@register(
    "returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
  cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  cast(c.c_acctbal AS DOUBLE) AS c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10-shaped returned-item report: top 20 customers by lost "
    "revenue in a quarter. Scale: returnflag + date filters push to both "
    "fact scans before the orderkey shuffle; the grouped result is "
    "customer-sized, and top-k is TakeOrderedAndProject (no global sort).",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "nation", "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "promo_revenue",
    oracle="""
SELECT 100.0 * cast(sum(CASE WHEN p.p_type = 'PROMO'
        THEN cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))
        ELSE cast(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    doc="TPC-H Q14-shaped promotion effect: single-row global CASE-sum ratio "
    "over a month of shipments. Scale: part auto-broadcasts while it fits "
    "(no hint — part scales with SF); the month filter "
    "pushes to the lineitem scan; global agg is a two-stage partial/final "
    "with a 1-row exchange.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))
    promo_vol = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "promo_pct"
            )
        )
    )


@register(
    "top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15-shaped top supplier: grouped revenue view consumed twice — "
    "once for the scalar max, once for the equality filter. The engine "
    "computes the per-supplier aggregate, broadcasts its 1-row max back "
    "against itself (exact-decimal doubles make the equality reliable), and "
    "broadcasts the supplier dim. Scale: revenue view is supplier-sized; "
    "no fact rescan thanks to DataFrame reuse.",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.max_revenue)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "small_quantity_revenue",
    oracle="""
SELECT cast(cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < 0.2 * (
    SELECT cast(sum(cast(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
    doc="TPC-H Q17-shaped small-quantity revenue: correlated per-part average "
    "subquery, rewritten as a grouped aggregate joined back to the fact. "
    "The threshold is sum(decimal)/count cast through double so both engines "
    "compare identical IEEE values. Scale: the per-part avg table is "
    "part-sized -> broadcast; lineitem is scanned twice (self-aggregate + "
    "probe) — at 100 TB cache or pre-bucket lineitem by partkey.",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(p.where(F.col("p_brand") == "Brand#1"), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "large_volume_customers",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
  cast(o.o_totalprice AS DOUBLE) AS o_totalprice,
  cast(sum(cast(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(cast(l_quantity AS DECIMAL(18,2))) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    doc="TPC-H Q18-shaped large-volume customers: HAVING-filtered grouped "
    "subquery used as a semi-join cohort on the fact, then re-aggregated "
    "with customer context. Scale: the cohort is tiny after HAVING -> "
    "broadcast semi-join; lineitem shuffles once on orderkey and the "
    "per-orderkey partial agg reuses that partitioning.",
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big_orders.withColumnRenamed("l_orderkey", "big_okey"),
                li.l_orderkey == F.col("big_okey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "wealthy_inactive_customers",
    oracle="""
WITH avg_bal AS (
  SELECT cast(sum(cast(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n.n_name AS nation, count(*) AS numcust,
  cast(sum(cast(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (SELECT v FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name
""",
    doc="TPC-H Q22-shaped wealthy-lapsed report: global scalar average "
    "(decimal-exact, broadcast as a 1-row cross join), anti-join against "
    "recent orders (no order since 2000), grouped by nation. Scale: orders "
    "projects only o_custkey after the date filter pushes to its scan; the "
    "scalar avg is a 1-row exchange, not a driver collect.",
)
def q_wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("avg_v")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_v"))
        .join(
            o.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
                "o_custkey"
            ),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@register(
    "forecast_revenue_change",
    oracle="""
SELECT
  cast(sum(cast(l_extendedprice AS DECIMAL(18,2)) * cast(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    headline=True,
    doc="TPC-H Q6-shaped forecast-revenue change: the canonical "
    "scan-dominated filter+aggregate. Every predicate (shipdate range, "
    "discount band, quantity cap) and the two-column projection push down to "
    "the parquet scan — `.explain` shows PushedFilters plus a 4-column "
    "ReadSchema — so at 100 TB this reads only row groups whose min/max "
    "stats overlap 1994, the cheapest possible plan: no shuffle at all "
    "before the single-row final aggregate. Decimal-exact product sum.",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "price_bucket_histogram",
    oracle="""
SELECT cast(cast(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000000 AS price_bucket,
  count(*) AS n_lines,
  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_revenue,
  cast(count(*) AS DOUBLE) / (SELECT count(*) FROM lineitem) AS share
FROM lineitem
GROUP BY 1
""",
    doc="Fixed-width histogram of line prices (10k-wide buckets) with each "
    "bucket's share of total rows. Bucketing is integer arithmetic on cents "
    "(exact in both engines — no float-division boundary ambiguity); the "
    "denominator is a broadcast scalar subquery, so the plan is one scan + "
    "one partial-agg shuffle on ~40 bucket keys plus a single-row broadcast. "
    "Scale: bucket cardinality is fixed regardless of input size, so the "
    "shuffle stays tiny at 100 TB; the double scan collapses to one with a "
    "window total, but the scalar-subquery form keeps the scan parallel and "
    "is cheaper than a global window.",
)
def q_price_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    total = li.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    return (
        li.groupBy(F.floor(cents / 1000000).alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("bucket_revenue"),
        )
        .join(F.broadcast(total))
        .select(
            "price_bucket",
            "n_lines",
            "bucket_revenue",
            (F.col("n_lines").cast("double") / F.col("_total")).alias("share"),
        )
    )


@register(
    "strict_service_orders",
    oracle="""
SELECT o.o_orderpriority,
  count(*) AS n_orders,
  cast(sum(cast(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
GROUP BY o.o_orderpriority
""",
    doc="Combined EXISTS + NOT EXISTS cohort: orders that had a returned "
    "line but never a deep-discounted one, profiled by priority — the "
    "semi-join and anti-join composed in one plan (extends Q19's lone "
    "semi-join and parts_never_ordered's lone anti-join). Both subquery "
    "scans push their filter down before the join, so each side ships only "
    "the qualifying orderkeys. Scale: two shuffles on l_orderkey against the "
    "orders shuffle — all three co-partition on the same key, and AQE turns "
    "either side broadcast when the filtered keyset is small.",
)
def q_strict_service_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    discounted = li.where(F.col("l_discount") > 0.08).select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .join(discounted, o.o_orderkey == discounted.l_orderkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@register(
    "brand_quantity_revenue",
    oracle="""
SELECT
  cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2)) * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19-shaped disjunctive OR-of-ANDs predicate spanning the join "
    "(part attrs AND lineitem attrs in each disjunct; adapted to this "
    "dataset's columns — no l_shipmode/l_container here). The interesting "
    "physical property: Catalyst factors the per-side implications out of "
    "the OR — the part scan pushes `p_brand IN (12,23,4) AND p_size<=35`, "
    "the lineitem scan pushes `l_quantity BETWEEN 1 AND 30` — so both scans "
    "prune before the join even though the full predicate is disjunctive and "
    "can only be evaluated after it. part is broadcast; the fact table never "
    "shuffles. At 100 TB that residual-OR-after-broadcast plan is exactly "
    "what you want: one scan, zero exchanges before the single-row agg.",
)
def q_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "linestatus_priority_counts",
    oracle="""
SELECT l.l_linestatus,
  cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12-shaped two-way conditional count: lines shipped in 1996 "
    "classified by whether their order was high-priority (shipmode-less "
    "adaptation of the Q12 shape). Only o_orderkey+o_orderpriority project "
    "out of orders and three columns out of lineitem; the shipdate range "
    "pushes to the lineitem scan. The join shuffles both sides on orderkey "
    "— the canonical fact-fact co-partition — and the final agg has 2 "
    "groups, so partial aggregation collapses virtually all rows map-side. "
    "At 100 TB the only real cost is the orderkey exchange; bucketing both "
    "tables by orderkey (tests/test_bucketing.py pattern) removes it.",
)
def q_linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
        .join(o.select("o_orderkey", "o_orderpriority"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "sole_blame_suppliers",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    doc="TPC-H Q21-shaped sole-blame cohort: suppliers that were the ONLY "
    "supplier with a returned line on a finished multi-supplier order "
    "(l_returnflag='R' standing in for receipt>commit — this dataset has no "
    "commit/receipt dates). The oracle states it as the classic "
    "EXISTS + NOT EXISTS double self-join; the Spark plan is deliberately "
    "NOT that — three extra scans of the fact table become ONE: a single "
    "groupBy(l_orderkey) computes n_suppliers (distinct), n_blame_suppliers "
    "(distinct-if-R), the sole blamed suppkey (max-if-R, valid when the "
    "distinct count is 1) and the blamed supplier's R-line count in one "
    "shuffle; both existence tests fall out as predicates on the aggregate "
    "row. At 100 TB this replaces two additional lineitem exchanges (the "
    "self-joins) with zero — the dominant cost is one orderkey shuffle, "
    "which AQE can skew-split; supplier and the filtered orders keyset "
    "broadcast.",
)
def q_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    is_r = F.col("l_returnflag") == "R"
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.count_distinct(F.col("l_suppkey")).alias("n_suppliers"),
            F.count_distinct(F.when(is_r, F.col("l_suppkey"))).alias("n_blame_suppliers"),
            F.max(F.when(is_r, F.col("l_suppkey"))).alias("blame_suppkey"),
            F.count(F.when(is_r, 1)).alias("blame_lines"),
        )
        .where((F.col("n_suppliers") > 1) & (F.col("n_blame_suppliers") == 1))
    )
    finished = o.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        per_order.join(finished, per_order.l_orderkey == finished.o_orderkey, "left_semi")
        .groupBy("blame_suppkey")
        .agg(F.sum("blame_lines").alias("numwait"))
        .join(s, F.col("blame_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "retained_buyers_intersect",
    oracle="""
SELECT c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE c.c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
GROUP BY c.c_mktsegment
""",
    doc="INTERSECT set-op (absent from the reference surface — SURVEY §2.4 "
    "scoping note): customers who bought in BOTH 1996 and 1997, profiled by "
    "segment. Spark's intersect() plans as a distinct-aggregate + join; "
    "both year slices prune at the orders scan and the resulting keyset "
    "semi-joins customer. Scale: the intersect shuffles only distinct "
    "custkeys (already a fraction of orders), and the final probe "
    "broadcasts whichever side is smaller under AQE.",
)
def q_retained_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return o.where(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    both = year(1996).intersect(year(1997))
    return (
        c.join(both, c.c_custkey == both.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "lapsed_buyers_except",
    oracle="""
SELECT c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE c.c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
GROUP BY c.c_mktsegment
""",
    doc="EXCEPT set-op twin of retained_buyers_intersect: customers who "
    "bought in 1996 but not 1997 (churn cohort). Spark's except() plans as "
    "a distinct left-anti aggregate over the two pruned year slices.",
)
def q_lapsed_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return o.where(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select("o_custkey")

    # subtract() is EXCEPT DISTINCT (set difference); exceptAll() would be
    # bag semantics — a customer with 3 orders in '96 and 1 in '97 must NOT
    # count as lapsed.
    lapsed = year(1996).subtract(year(1997))
    return (
        c.join(lapsed, c.c_custkey == lapsed.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "copurchase_pairs",
    oracle="""
WITH dl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part1, b.l_partkey AS part2, count(*) AS n_orders
FROM dl a JOIN dl b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part1, part2
LIMIT 20
""",
    doc="Market-basket co-occurrence: top-20 part pairs appearing in the "
    "same order. The naive plan is the oracle's self-join on l_orderkey "
    "(re-shuffles the fact twice and explodes skewed orders quadratically "
    "in the join); the Spark plan instead scans lineitem ONCE — "
    "groupBy(orderkey).collect_set(partkey) (collect_set dedups in the "
    "partial aggregate), sort the per-order array, generate the i<j pairs "
    "array-side with transform/slice/flatten (narrow), and count per pair. "
    "Scale: one fact shuffle on orderkey + one pair-sized shuffle; "
    "per-order baskets are bounded (7 lines max in TPC-H), so the "
    "quadratic blowup is capped per group; final top-20 is "
    "TakeOrderedAndProject, never a global sort.",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .where(F.size("parts") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "y -> struct(x AS part1, y AS part2))))"
            )
        ).alias("pr")
    ).select("pr.part1", "pr.part2")
    return (
        pairs.groupBy("part1", "part2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part1", "part2")
        .limit(20)
    )


@register(
    "nation_product_profit",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
  cast(sum(cast(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - cast(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
  count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9-shaped product-profit report (partsupp-less adaptation — "
    "this dataset ships no partsupp, so profit is discounted revenue "
    "without the supplycost term): five-table join, part filtered by a "
    "LIKE predicate, supplier->nation labels the row, orders supplies the "
    "year axis. Scale: nation broadcasts by hint; part/supplier by size "
    "estimate — they scale with SF (the p_name filter "
    "shrinks part before the join decides), lineitem<->orders is the one "
    "shuffled fact-fact join on orderkey; the grouped result is "
    "|nations x years| rows. The selective part broadcast prunes fact rows "
    "BEFORE the orderkey shuffle — join order matters at 100 TB and "
    "Catalyst/AQE picks it from sizes.",
)
def q_nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(part.select("p_partkey"), li["l_partkey"] == F.col("p_partkey"))
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "important_parts_value_share",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
    sum(cast(l_extendedprice AS DECIMAL(18,2))
        * (1 - cast(l_discount AS DECIMAL(18,2)))) AS val
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(val) AS total, count(*) AS n_parts FROM pv)
SELECT l_partkey AS partkey,
  cast(val AS DOUBLE) AS part_value,
  cast(val AS DOUBLE) / cast(total AS DOUBLE) AS value_share
FROM pv, tot
WHERE cast(val AS DOUBLE) * n_parts > cast(total AS DOUBLE) * cast(1.5 AS DOUBLE)
""",
    doc="TPC-H Q11-shaped important-stock report (partsupp-less adaptation: "
    "per-part revenue standing in for stock value): grouped per-part "
    "decimal-exact value, a GLOBAL scalar total, and a HAVING-style "
    "filter keeping parts above a fraction of that total. The scalar "
    "total is a 1-row frame cross-joined (broadcast) back onto the "
    "grouped result — the same pattern as wealthy_inactive_customers' "
    "global average, here gating on parts above 1.5x the average share "
    "(a data-relative threshold, meaningful at every scale factor). Scale: one "
    "shuffle on partkey for the grouped sum; the total re-aggregates "
    "the partkey-sized frame, not the fact; the share filter runs "
    "map-side after the broadcast.",
)
def q_important_parts_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    pv = li.groupBy("l_partkey").agg(F.sum(price * (F.lit(1) - disc)).alias("val"))
    tot = pv.agg(F.sum("val").alias("total"), F.count(F.lit(1)).alias("n_parts"))
    return (
        pv.join(F.broadcast(tot))
        .where(
            F.col("val").cast("double") * F.col("n_parts")
            > F.col("total").cast("double") * F.lit(1.5)
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val").cast("double").alias("part_value"),
            (F.col("val").cast("double") / F.col("total").cast("double")).alias(
                "value_share"
            ),
        )
    )


@register(
    "regional_cheapest_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey,
    cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      / cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_price
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
ranked AS (
  SELECT u.l_partkey, u.unit_price, e.s_name, e.s_acctbal, e.n_name,
    row_number() OVER (PARTITION BY u.l_partkey
                       ORDER BY u.unit_price, u.l_suppkey) AS rk
  FROM unit u JOIN eu e ON u.l_suppkey = e.s_suppkey
)
SELECT p.p_partkey AS partkey, p.p_type,
  r.s_name AS supplier, r.n_name AS nation, r.unit_price, r.s_acctbal
FROM ranked r JOIN part p ON r.l_partkey = p.p_partkey
WHERE r.rk = 1 AND p.p_size <= 10
ORDER BY r.s_acctbal DESC, partkey LIMIT 100
""",
    doc="TPC-H Q2-shaped cheapest-regional-supplier lookup (partsupp-less "
    "adaptation: realized unit price sum(price)/sum(qty) from lineitem "
    "stands in for ps_supplycost): per (part, supplier) unit price, "
    "suppliers restricted to one region (supplier->nation->region dim "
    "chain, all broadcast), then the per-part argmin via row_number "
    "ordered by (unit_price, suppkey) — the deterministic rewrite of "
    "Q2's correlated MIN subquery — and a top-100 by account balance. "
    "Both engines divide identical decimal-exact sums, so unit_price "
    "doubles and the argmin choice are bit-equal. Scale: one shuffle "
    "on (partkey, suppkey) for the grouped price; the region filter "
    "shrinks the supplier side before the broadcast; the final top-100 "
    "is TakeOrderedAndProject, no global sort.",
)
def q_regional_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(price).cast("double") / F.sum(qty).cast("double")).alias("unit_price")
    )
    eu = (
        supplier.join(
            F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"]
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    rk = F.row_number().over(
        Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    )
    ranked = unit.join(eu, unit["l_suppkey"] == eu["s_suppkey"]).select(
        "l_partkey", "l_suppkey", "unit_price", "s_name", "s_acctbal", "n_name", rk.alias("rk")
    )
    return (
        ranked.where(F.col("rk") == 1)
        .join(
            part.where(F.col("p_size") <= 10).select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            "p_type",
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            "unit_price",
            "s_acctbal",
        )
        .orderBy(F.desc("s_acctbal"), "partkey")
        .limit(100)
    )


@register(
    "supplier_part_variety",
    oracle="""
WITH blacklist AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
),
rel AS (
  SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    AND l.l_suppkey NOT IN (SELECT s_suppkey FROM blacklist)
)
SELECT p_brand, p_type, p_size, count(*) AS supplier_cnt
FROM rel
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q16-shaped supplier-variety report (partsupp-less "
    "adaptation: the realized lineitem part<->supplier relationship "
    "stands in for partsupp, and a negative account balance stands in "
    "for the complaints comment — this supplier table has no comment "
    "column): distinct suppliers per (brand, type, size) over a size "
    "IN-list, excluding a NOT IN supplier blacklist. The NOT IN plans "
    "as a null-aware anti join (broadcast — the only strategy Spark has "
    "for single-column NOT IN with nulls, hence the one retained hint on "
    "a supplier-derived frame; the complaint filter keeps it small); "
    "the DISTINCT collapses the many-lines-per-relationship fact "
    "before the count. Scale: part joins by size estimate with the size filter "
    "pushed to its scan; the distinct is the one fact shuffle, keyed "
    "by the full (brand, type, size, suppkey) tuple; the final count "
    "re-aggregates the distinct frame in place (no new shuffle needed "
    "beyond the attrs key).",
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    blacklist = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.where(F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    rel = (
        li.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return rel.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


@register(
    "dominant_part_suppliers",
    oracle="""
WITH red AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
vol AS (
  SELECT l.l_partkey, l.l_suppkey,
    sum(cast(l.l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem l
  JOIN red ON l.l_partkey = red.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, sum(sq) AS part_total FROM vol GROUP BY 1
),
dominant AS (
  SELECT DISTINCT v.l_suppkey
  FROM vol v JOIN tot t ON v.l_partkey = t.l_partkey
  WHERE cast(v.sq AS DOUBLE) > cast(t.part_total AS DOUBLE) * cast(0.5 AS DOUBLE)
)
SELECT s.s_name, s.s_acctbal, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
""",
    doc="TPC-H Q20-shaped dominant-supplier cohort (partsupp-less "
    "adaptation: a supplier qualifies when it shipped MORE THAN HALF of "
    "some red part's 1996 volume — availqty>0.5*sum(qty) recast on "
    "realized volumes): per-(part, supplier) decimal quantity, per-part "
    "totals re-aggregated from that frame (never a second fact scan), "
    "the >50% share filter, then an IN semi-join into supplier->nation. "
    "Scale: the red + shipdate filters prune the fact before its one "
    "(partkey, suppkey) shuffle; the totals frame reuses the partkey "
    "prefix of that partitioning; the dominant set is tiny -> broadcast "
    "semi-join on the supplier dim.",
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red = part.where(F.col("p_name").like("red%")).select("p_partkey")
    vol = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
    )
    tot = vol.groupBy("l_partkey").agg(F.sum("sq").alias("part_total"))
    dominant = (
        vol.join(tot, "l_partkey")
        .where(
            F.col("sq").cast("double")
            > F.col("part_total").cast("double") * F.lit(0.5)
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            dominant,
            supplier["s_suppkey"] == dominant["l_suppkey"],
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


@register(
    "nation_revenue_share",
    oracle="""
WITH nat AS (
  SELECT c.c_nationkey, sum(cast(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT n.n_name AS nation, r.r_name AS region,
  cast(rev AS DOUBLE) AS revenue,
  cast(rev AS DOUBLE)
    / cast(sum(rev) OVER (PARTITION BY r.r_regionkey) AS DOUBLE) AS region_share,
  rank() OVER (PARTITION BY r.r_regionkey ORDER BY rev DESC, n.n_name) AS region_rank
FROM nat
JOIN nation n ON nat.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
    doc="Ratio-to-parent report: each nation's revenue as a share of its "
    "REGION's total via an unordered whole-partition window (the "
    "ratio_to_report shape — sum OVER (PARTITION BY region) with no "
    "ORDER BY, a frame family the rolling/cumulative windows elsewhere "
    "in the catalog don't exercise), plus an in-region rank. The share "
    "divides decimal-exact sums cast to double, and the window input is "
    "the nations-sized frame, never the fact. Scale: the fact aggregates "
    "to |nations| rows on the one c_nationkey shuffle (customer "
    "broadcasts into orders); windows over the 25-row frame are free at "
    "any scale — the pattern is aggregate-first, window-the-rollup.",
)
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    joined = nat.join(
        F.broadcast(nation), nat["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    wp = Window.partitionBy("r_regionkey")
    rk = F.rank().over(wp.orderBy(F.desc("rev"), "n_name"))
    return joined.select(
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.sum("rev").over(wp).cast("double")).alias(
            "region_share"
        ),
        rk.alias("region_rank"),
    )
