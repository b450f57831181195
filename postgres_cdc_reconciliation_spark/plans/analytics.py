"""Headline analytical queries (TPC-H-shaped) — the big-shuffle showcase.

These exercise the plans that dominate at 100 TB: wide aggregations with
map-side partial agg, fact-fact shuffle joins, broadcast dimension chains,
and post-aggregation top-k. Decimal-exact money math surfaced as DOUBLE
(registry conventions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register(
    "q_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1-shaped pricing summary: one wide partial-aggregated scan; the canonical map-side-combine plan",
)
def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("cast('1998-09-02 00:00:00' as timestamp_ntz)")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    tax = F.col("l_tax").cast("decimal(12,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_top_customers",
    """SELECT o.o_orderkey, o.o_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
GROUP BY o.o_orderkey, o.o_custkey, c.c_name
ORDER BY revenue DESC, o_orderkey
LIMIT 10""",
    doc="TPC-H Q3-shaped: broadcast dim (customer) → fact-fact shuffle join (orders⋈lineitem) → agg → top-k (TakeOrderedAndProject)",
)
def q_top_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q_regional_revenue",
    """SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('AMERICA', 'ASIA')
GROUP BY n.n_name""",
    doc="TPC-H Q5-shaped: snowflake broadcast-dim chain (region→nation→customer) into the fact shuffle join, single keyed agg",
)
def q_regional_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_VERSIONS_CTE = """
versions AS (
  SELECT CAST(o_orderkey AS BIGINT) AS vkey,
         o_orderdate + to_days(off) AS vts,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + off AS DOUBLE) AS vprice
  FROM orders, (SELECT unnest([0, 10, 20]) AS off)
)"""


@register(
    "q_asof_join",
    f"""WITH {_VERSIONS_CTE}
SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, v.vts, v.vprice
FROM lineitem l
ASOF LEFT JOIN versions v
  ON l.l_orderkey = v.vkey AND l.l_shipdate >= v.vts""",
    doc="[EXT] as-of join (point-in-time version lookup): union + forward-fill window, one keyed shuffle — oracle is DuckDB's native ASOF JOIN",
)
def q_asof_join(spark, sf_dir):
    from ..operators.temporal import asof_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders")
    offs = spark.createDataFrame([(0,), (10,), (20,)], "off int")
    versions = o.crossJoin(F.broadcast(offs)).select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("timestampadd(DAY, off, o_orderdate)").alias("vts"),
        F.expr("cast(cast(o_totalprice as decimal(12,2)) + off as double)").alias(
            "vprice"
        ),
    )
    return asof_join(li, versions, "l_orderkey", "l_shipdate", "vts").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "vts", "vprice"
    )


@register(
    "q_range_join",
    """SELECT o.o_orderstatus, COUNT(*) AS n,
              CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM orders o JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderstatus""",
    doc="[EXT] equi+range join (shipments within 90d of order): equality key drives the shuffle, range predicate post-filters",
)
def q_range_join(spark, sf_dir):
    from ..operators.temporal import range_join

    o = _t(spark, sf_dir, "orders").withColumn(
        "range_end", F.expr("timestampadd(DAY, 90, o_orderdate)")
    )
    li = _t(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    j = range_join(li, o, "o_orderkey", "l_shipdate", "o_orderdate", "range_end")
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
    )


@register(
    "q_order_priority_count",
    """SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority""",
    doc="TPC-H Q4-shaped: date-range filter + correlated EXISTS (semi join referencing outer column) + count",
)
def q_order_priority_count(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("cast('1996-01-01' as timestamp_ntz)"))
        & (F.col("o_orderdate") < F.expr("cast('1997-01-01' as timestamp_ntz)"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "q_cust_order_distribution",
    """SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY n_orders""",
    doc="TPC-H Q13-shaped: left outer join + two-level aggregation (distribution of counts)",
)
def q_cust_order_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q_promo_revenue",
    """SELECT
  CAST(100.00 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
       THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
       ELSE CAST(0 AS DECIMAL(16,4)) END)
  / SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
  AS promo_share_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey""",
    doc="TPC-H Q14-shaped: fact⋈dim join with conditional-aggregation share (broadcast part)",
)
def q_promo_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.00) * F.sum(promo) / F.sum(rev))
            .cast("double")
            .alias("promo_share_pct")
        )
    )


@register(
    "q_small_qty_revenue",
    """WITH avg_qty AS (
  SELECT l_partkey, 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity < a.threshold""",
    doc="TPC-H Q17-shaped: per-key scalar aggregate subquery (avg threshold) joined back to the fact",
)
def q_small_qty_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count("*")
            )
        ).alias("threshold")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24""",
    doc="TPC-H Q6-shaped: pure filter+agg — every predicate pushed to the parquet scan, no shuffle beyond the final combine",
)
def q_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("cast('1996-01-01' as timestamp_ntz)"))
            & (F.col("l_shipdate") < F.expr("cast('1997-01-01' as timestamp_ntz)"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(12,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q_returned_items",
    """SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
    doc="TPC-H Q10-shaped: returned-item revenue per customer, 4-way join + top-20",
)
def q_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
