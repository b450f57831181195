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
    qty = F.col("l_quantity").try_cast("decimal(12,2)")
    price = F.col("l_extendedprice").try_cast("decimal(12,2)")
    disc = F.col("l_discount").try_cast("decimal(12,2)")
    tax = F.col("l_tax").try_cast("decimal(12,2)")
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
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
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
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
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
    "q_asof_forward",
    f"""WITH {_VERSIONS_CTE},
j AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, v.vts, v.vprice
  FROM lineitem l
  ASOF LEFT JOIN versions v
    ON l.l_orderkey = v.vkey AND l.l_shipdate <= v.vts
)
SELECT l_orderkey, l_linenumber, l_shipdate,
       CASE WHEN vts IS NOT NULL
             AND date_diff('second', l_shipdate, vts) <= 864000
            THEN vts END AS vts,
       CASE WHEN vts IS NOT NULL
             AND date_diff('second', l_shipdate, vts) <= 864000
            THEN vprice END AS vprice
FROM j""",
    doc="[EXT] FORWARD as-of join with tolerance (pandas merge_asof "
    "parity, operators/temporal.py::asof_join direction='forward'): "
    "each lineitem attaches the EARLIEST version at-or-after its "
    "shipdate, nulled back out beyond a 10-day tolerance. Same union + "
    "fill-window plan iterated in descending time (one keyed shuffle, "
    "no candidate blowup); tolerance is one post-fill projection using "
    "naive-calendar seconds (timestampdiff), which matches DuckDB's "
    "date_diff and stays session-timezone-independent across DST. "
    "Oracle: DuckDB's native forward ASOF JOIN + the same CASE cut.",
)
def q_asof_forward(spark, sf_dir):
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
    return asof_join(
        li, versions, "l_orderkey", "l_shipdate", "vts",
        direction="forward", tolerance=10 * 86400,
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "vts", "vprice")


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
        F.sum(F.col("l_quantity").try_cast("decimal(12,2)")).cast("double").alias("qty"),
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
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
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
                F.sum(F.col("l_quantity").try_cast("decimal(12,2)")).cast("double")
                / F.count("*")
            )
        ).alias("threshold")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").try_cast("decimal(12,2)")).cast("double")
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
                F.col("l_extendedprice").try_cast("decimal(12,2)")
                * F.col("l_discount").try_cast("decimal(12,2)")
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
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
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


# --- round-2 widening: the remaining classic TPC-H shapes, adapted to the
# partsupp-free synthetic schema (VERDICT r1 #10). Money math stays DECIMAL
# until the final DOUBLE surface; threshold comparisons run in exact decimal
# (v*1000 > total, never double*0.001) so float summation order can't flip
# boundary rows between engines.


@register(
    "q_shipping_priority",
    """SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer c JOIN orders o ON c_custkey = o_custkey
JOIN lineitem l ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
    doc="TPC-H Q3-shaped shipping priority: segment filter → 3-way join → agg "
    "→ deterministic top-10 (full tie-break so the LIMIT set is engine-stable)",
)
def q_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("cast('1995-03-15' as timestamp_ntz)")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("cast('1995-03-15' as timestamp_ntz)")
    )
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_volume_shipping",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM supplier s JOIN lineitem l ON s_suppkey = l_suppkey
JOIN orders o ON o_orderkey = l_orderkey
JOIN customer c ON c_custkey = o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
  AND n1.n_nationkey <> n2.n_nationkey
  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY 1, 2, 3""",
    doc="TPC-H Q7-shaped volume shipping: two broadcast nation dims with an "
    "inequality filter between them, fact-fact shuffle joins, year rollup",
)
def q_volume_shipping(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.expr("cast('1995-01-01' as timestamp_ntz)"),
            F.expr("cast('1996-12-31' as timestamp_ntz)"),
        )
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    n1 = n.select(
        F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("k1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("k2"))
        .filter(F.col("k1") != F.col("k2"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q_market_share",
    """WITH vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume,
         n2.n_name AS supp_nation
  FROM part p JOIN lineitem l ON p_partkey = l_partkey
  JOIN supplier s ON s_suppkey = l_suppkey
  JOIN orders o ON o_orderkey = l_orderkey
  JOIN customer c ON c_custkey = o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO')
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year""",
    doc="TPC-H Q8-shaped market share: snowflake join through region on the "
    "customer side, supplier-nation share per year — exact decimal sums, one "
    "double division at the surface",
)
def q_market_share(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    n2 = n.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
    )
    base = (
        F.broadcast(p)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(r), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    "q_large_orders",
    """SELECT c_name, c_custkey, o.o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer c JOIN orders o ON c_custkey = o_custkey
JOIN lineitem l ON o.o_orderkey = l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
GROUP BY c_name, c_custkey, o.o_orderkey, o_orderdate, o_totalprice""",
    doc="TPC-H Q18-shaped large-volume orders: IN over a grouped HAVING "
    "(semi join against an aggregate), then re-aggregation over the kept keys",
)
def q_large_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").try_cast("decimal(12,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").try_cast("decimal(12,2)").alias("_tp"),
        )
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("_tp").cast("double").alias("o_totalprice"), "total_qty",
        )
    )


@register(
    "q_sales_opportunity",
    """WITH avg_bal AS (SELECT AVG(CAST(c_acctbal AS DECIMAL(12,2))) AS a
                        FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE CAST(c_acctbal AS DECIMAL(12,2)) > a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-06-01')
GROUP BY c_nationkey""",
    doc="TPC-H Q22-shaped sales opportunity: scalar global-average subquery "
    "(broadcast scalar join) + NOT EXISTS anti join on a filtered fact",
)
def q_sales_opportunity(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").try_cast("decimal(12,2)")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg(bal).alias("a"))
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("cast('2001-06-01' as timestamp_ntz)")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(bal > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q_min_cost_supplier",
    """WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit
  FROM lineitem GROUP BY 1, 2),
best AS (SELECT l_partkey, MIN(unit) AS best_unit FROM cost GROUP BY 1)
SELECT p_partkey, s_name, n_name, CAST(c.unit AS DOUBLE) AS unit
FROM cost c JOIN best b ON c.l_partkey = b.l_partkey AND c.unit = b.best_unit
JOIN part p ON p_partkey = c.l_partkey
JOIN supplier s ON s_suppkey = c.l_suppkey
JOIN nation n ON s_nationkey = n_nationkey
JOIN region r ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_size = 15""",
    doc="TPC-H Q2-shaped min-cost supplier (partsupp-free: unit price from "
    "observed sales): per-part min over a grouped aggregate joined back — "
    "the correlated-MIN-subquery shape without a correlated rescan",
)
def q_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # r15 opt (guide §3.2): p_size=15 keeps ~2% of parts and the final
    # join on p_partkey is inner, so the per-(part,supplier) aggregate
    # only ever needs lineitem rows of those parts — semi-join them out
    # BEFORE the big groupBy exchange instead of discarding 98% of the
    # aggregate's output after it. Value-identical: `best_unit` is keyed
    # by l_partkey, so restricting to a subset of partkeys cannot change
    # any surviving part's min.
    li = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    # r15 opt (guide §2.4): the per-part min as a window instead of a
    # second aggregate branch joined back — one exchange and one join
    # fewer; `best` had exactly one row per part, so join+filter ==
    # window+filter, and MIN is order-independent (identical doubles).
    cost = cost.withColumn(
        "best_unit", F.min("unit").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit") == F.col("best_unit"))
    return (
        cost.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "s_name", "n_name", F.col("unit").cast("double").alias("unit"))
    )


@register(
    "q_part_value_share",
    """WITH top_nation AS (
  SELECT s_nationkey FROM supplier GROUP BY 1
  ORDER BY count(*) DESC, s_nationkey LIMIT 1),
val AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS v
  FROM lineitem l JOIN supplier s ON l_suppkey = s_suppkey
  WHERE s_nationkey = (SELECT s_nationkey FROM top_nation)
  GROUP BY 1)
SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
FROM val WHERE v * 1000 > (SELECT SUM(v) FROM val)""",
    doc="TPC-H Q11-shaped important stock: per-part value vs a scalar global "
    "total — the HAVING-over-global-aggregate shape; compare in exact "
    "decimal (v*1000 > total), never double*fraction",
)
def q_part_value_share(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    top_nation = (
        s.groupBy("s_nationkey")
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), "s_nationkey")
        .limit(1)
        .select("s_nationkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    val = (
        li.join(
            F.broadcast(s.join(F.broadcast(top_nation), "s_nationkey", "left_semi")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").try_cast("decimal(14,2)")).alias("v"))
    )
    total = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 1000 > F.col("t"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


@register(
    "q_excess_suppliers",
    """SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%' GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100)""",
    doc="TPC-H Q20-shaped excess suppliers (partsupp-free: shipped volume "
    "stands in for availability): semi join against a filtered grouped HAVING",
)
def q_excess_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").try_cast("decimal(12,2)")).alias("_q"))
        .filter(F.col("_q") > 100)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "q_supplier_variety",
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'ECONOMY'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 3000)
GROUP BY p_brand, p_type, p_size""",
    doc="TPC-H Q16-shaped supplier variety (partsupp-free: lineitem supplies "
    "the supplier-part relation; low-acctbal suppliers stand in for the "
    "complaint exclusion — threshold 3000 excludes 3/10 suppliers at "
    "sf0.001, 38/100 at sf0.01, non-vacuous both). Broadcast the filtered "
    "part dim and the tiny exclusion list; count(DISTINCT) shuffles only "
    "(group, suppkey) pairs after map-side dedup.",
)
def q_supplier_variety(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 3000)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q_priority_line_count",
    """SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_linestatus""",
    doc="TPC-H Q12-shaped conditional line count (shipmode column absent in "
    "testdata; linestatus carries the group role): fact-fact shuffle join + "
    "two-way CASE conditional agg — partial agg collapses to 3 groups "
    "map-side, so the shuffle is rows-per-partition, not rows-per-event",
)
def q_priority_line_count(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("cast('1995-01-01' as timestamp_ntz)"))
        & (F.col("l_shipdate") < F.expr("cast('1996-01-01' as timestamp_ntz)"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q_top_supplier",
    """WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""",
    doc="TPC-H Q15-shaped top supplier: quarterly revenue agg reused twice "
    "(the reference's CREATE VIEW) — scalar-subquery MAX against the same "
    "agg; Spark computes the agg once per branch and AQE dedups the "
    "exchange. Equality is on exact DECIMAL revenue (ties deterministic), "
    "DOUBLE only at the output surface.",
)
def q_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("cast('1995-01-01' as timestamp_ntz)"))
        & (F.col("l_shipdate") < F.expr("cast('1995-04-01' as timestamp_ntz)"))
    )
    rev_expr = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev_expr).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top), F.col("total_rev") == F.col("_mx"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "q_disjunctive_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)""",
    doc="TPC-H Q19-shaped disjunctive predicate revenue (container/shipmode "
    "columns absent; brand+size+quantity OR-of-ANDs preserved): the "
    "optimizer test is that the common l_partkey = p_partkey conjunct "
    "stays a hash-join key while the OR-of-ANDs evaluates post-join, and "
    "part-side brand/size conjuncts still push to the parquet scan",
)
def q_disjunctive_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    arm = lambda b, s_lo, s_hi, q_lo, q_hi: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(s_lo, s_hi)
        & (q >= q_lo)
        & (q <= q_hi)
    )
    rev = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            arm("Brand#1", 1, 15, 5, 20)
            | arm("Brand#2", 10, 30, 10, 30)
            | arm("Brand#3", 20, 50, 20, 40)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@register(
    "q_return_fault_suppliers",
    """SELECT s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name""",
    doc="TPC-H Q21-shaped sole-fault suppliers (receipt/commit dates absent; "
    "l_returnflag='R' is the fault marker): the double-correlated "
    "EXISTS + NOT-EXISTS on the same fact table — Spark plans them as "
    "left-semi and left-anti shuffle joins on l_orderkey",
)
def q_return_fault_suppliers(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


@register(
    "q_product_profit",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN supplier s ON s_suppkey = l_suppkey
JOIN part p ON p_partkey = l_partkey
JOIN orders o ON o_orderkey = l_orderkey
JOIN nation n ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2""",
    doc="TPC-H Q9-shaped product profit (ps_supplycost absent; retailprice/10 "
    "is the unit-cost proxy): LIKE-filtered part dim broadcast into the "
    "4-way fact join chain, nation×year rollup in exact DECIMAL",
)
def q_product_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").try_cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").try_cast("decimal(12,2)")
    ) - F.col("p_retailprice").try_cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).try_cast("decimal(12,2)") * F.lit("0.1").cast("decimal(2,1)")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q_cohort_retention",
    """WITH f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
a AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM f GROUP BY cohort_week)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.activity_week) / 7 AS BIGINT)
         AS week_offset,
       CAST(count(*) AS BIGINT) AS active_users,
       round(CAST(count(*) AS DOUBLE) / c.cohort_size, 6) AS retention_r
FROM a JOIN f USING (user_id) JOIN c USING (cohort_week)
GROUP BY f.cohort_week, week_offset, c.cohort_size""",
    doc="[EXT] weekly cohort retention over the purchase event stream: "
    "cohort = ISO week of each user's first purchase; cell (cohort, "
    "offset) = distinct users of that cohort active offset weeks later, "
    "as count + share of cohort size. The canonical product-analytics "
    "matrix. Determinism: week keys come from date_trunc (Monday ISO in "
    "both engines, surfaced as TIMESTAMP, the registry convention), offsets are exact day-diffs/7 of "
    "week-aligned dates, retention is one double division of exact ints "
    "rounded at 6dp. Scale shape: two keyed aggs over the filtered "
    "stream + a broadcast-sized cohort table joined back; no window, "
    "no sort.",
)
def q_cohort_retention(spark, sf_dir):
    from ..fixtures import events_df

    purch = events_df(spark, sf_dir).filter(F.col("event_type") == "purchase")
    first = purch.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = purch.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    cohorts = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        active.join(first, "user_id")
        .join(F.broadcast(cohorts), "cohort_week")
        .groupBy(
            "cohort_week",
            (
                F.expr("timestampdiff(DAY, cohort_week, activity_week)") / 7
            )
            .cast("long")
            .alias("week_offset"),
            "cohort_size",
        )
        .agg(F.count("*").cast("long").alias("active_users"))
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size"), 6
            ).alias("retention_r"),
        )
    )



_COPURCHASE_SQL = """SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey % 10 = 0 AND b.l_orderkey % 10 = 0"""


def _copurchase_edges(spark, sf_dir):
    """Part co-purchase graph (parts sharing an order, 1-in-10 order
    sample), canonical undirected edge list (u < v) — shared by
    q_triangle_count and q_kcore; `_COPURCHASE_SQL` is the same
    construction for their oracles."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )


@register(
    "q_triangle_count",
    f"""WITH raw AS ({_COPURCHASE_SQL}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM raw UNION ALL SELECT v AS node FROM raw)
  GROUP BY node),
e AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND r.u < r.v)
              THEN r.u ELSE r.v END AS u,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND r.u < r.v)
              THEN r.v ELSE r.u END AS v
  FROM raw r
  JOIN deg du ON du.node = r.u
  JOIN deg dv ON dv.node = r.v)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.v = e2.u
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""",
    doc="[EXT] triangle counting on the part co-purchase graph (parts "
    "sharing an order, 1-in-10 order sample): edges oriented LOW-degree "
    "-> HIGH-degree (ties by id — a total vertex order, so every "
    "triangle has exactly one out-degree-2 apex and is counted once by "
    "the 2-path closure). Degree orientation is the hub-skew guard the "
    "id orientation lacks (VERDICT r4 #2): a vertex's forward fan-out "
    "is bounded by O(sqrt(m)) regardless of its raw degree — a "
    "high-degree hub keeps only its edges toward even-higher-degree "
    "peers, of which there can be at most ~sqrt(2m) — so the 2-path "
    "join's per-key row count (the quantity that skews a 100 TB "
    "shuffle) is capped where id order left it at max-degree. Cost: "
    "one degree agg + two keyed joins on top of the same closure. "
    "Exact BIGINT output — bit-deterministic in any engine; same "
    "orientation expressed in the oracle CTE.",
)
def q_triangle_count(spark, sf_dir):
    raw = _copurchase_edges(spark, sf_dir)
    deg = (
        raw.select(F.col("u").alias("node"))
        .unionAll(raw.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du, dv = deg.alias("du"), deg.alias("dv")
    fwd = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    e = (
        raw.join(du, F.col("u") == F.col("du.node"))
        .join(dv, F.col("v") == F.col("dv.node"))
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("v"),
        )
    )
    e = e.localCheckpoint()  # reused 4x: edge count + 3-way self-join
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    n_edges = e.agg(F.count("*").cast("long").alias("n_edges"))
    return n_edges.crossJoin(tri)


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Fixed-round synchronous k-core peeling unrolled as chained CTEs —
    the SQL reproduction of operators/graph.py::kcore_peel_rounds on the
    part co-purchase graph (same construction as q_triangle_count's
    oracle). AS MATERIALIZED on every e{i}: each is referenced by the next
    round's degree agg, edge filter AND its own count — without it the
    inlined prefix re-evaluates per reference (the q_pagerank lesson)."""
    ctes = [f"e0 AS MATERIALIZED ({_COPURCHASE_SQL})"]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p})
  GROUP BY node),
k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{p} e
  JOIN k{i} ku ON e.u = ku.node
  JOIN k{i} kv ON e.v = kv.node),
s{i} AS (
  SELECT CAST({i} AS BIGINT) AS round,
         (SELECT CAST(count(*) AS BIGINT) FROM k{i}) AS n_vertices,
         (SELECT CAST(count(*) AS BIGINT) FROM e{i}) AS n_edges)"""
        )
    union = "\nUNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, rounds + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + union


@register(
    "q_kcore",
    _kcore_oracle_sql(k=3, rounds=6),
    doc="[EXT] 3-core of the part co-purchase graph by synchronous "
    "peeling, with the per-round (survivors, edges) trace — the standard "
    "graph-cleanup pass (drop low-engagement periphery before community/"
    "centrality work). Fixed 6 rounds, not convergence-tested, so the "
    "unrolled-CTE DuckDB oracle sees the identical computation (the "
    "q_pagerank tol=0 discipline); post-fixpoint rounds are identity. "
    "Each round: one degree agg (map-side combined, shuffle O(V)) + two "
    "ANTI-joins of edges vs the REMOVED set (r15: equivalent to the "
    "survivors semi-join since every endpoint is in deg, but removed "
    "collapses to ~nothing after round 1 — AQE broadcasts it and the "
    "edge table is never shuffled in the loop), lineage truncated per "
    "round. All-BIGINT output — bit-deterministic in any engine. "
    "operators/graph.py::kcore_peel_rounds.",
)
def q_kcore(spark, sf_dir):
    from ..operators.graph import kcore_peel_rounds

    return kcore_peel_rounds(_copurchase_edges(spark, sf_dir), k=3, rounds=6)


@register(
    "q_funnel_steps",
    """WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL 24 HOUR
  GROUP BY e.user_id)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS depth
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id""",
    doc="[EXT] ordered funnel (signup -> click -> purchase, each step "
    "within 24h of the previous): per-user first-completion timestamps "
    "and reached depth — the event-sequence analysis every product/"
    "training-telemetry pipeline runs. Each step is one keyed min-agg "
    "joined back to the previous frontier (monotone chaining: step N's "
    "min-ts is the earliest valid completion GIVEN the earliest step-N-1 "
    "completion). Exact timestamp comparisons and integer depth — fully "
    "deterministic. Scale shape: three filtered keyed aggs + keyed "
    "left joins, no window, no sort; at 100 TB each stage shuffles "
    "O(users in funnel), not O(events).",
)
def q_funnel_steps(spark, sf_dir):
    from ..fixtures import events_df

    ev = events_df(spark, sf_dir)

    def first_after(prev, etype, tcol_prev, alias):
        step = (
            ev.filter(F.col("event_type") == etype)
            .join(prev.select("user_id", tcol_prev), "user_id")
            .filter(
                (F.col("ts") > F.col(tcol_prev))
                & (F.col("ts") <= F.col(tcol_prev) + F.expr("INTERVAL 24 HOURS"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(alias))
        )
        return step

    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = first_after(s1, "click", "t1", "t2")
    s3 = first_after(s2, "purchase", "t2", "t3")
    depth = (
        F.lit(1)
        + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
        + F.when(F.col("t3").isNotNull(), 1).otherwise(0)
    ).cast("long")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select("user_id", "t1", "t2", "t3", depth.alias("depth"))
    )


@register(
    "q_funnel_conversion_window",
    """WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 72 HOUR
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL 72 HOUR
  GROUP BY e.user_id)
SELECT date_trunc('day', s1.t1) AS signup_day,
       CAST(count(*) AS BIGINT) AS n_signups,
       CAST(count(s2.t2) AS BIGINT) AS n_clicked,
       CAST(count(s3.t3) AS BIGINT) AS n_converted,
       round(CAST(count(s3.t3) AS DOUBLE) / count(*), 6) AS conv_r
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
GROUP BY signup_day""",
    doc="[EXT] ordered funnel under ONE overall conversion window (VERDICT "
    "r4 #6): signup -> click -> purchase, every step inside 72h of the "
    "user's FIRST signup, rolled up to per-signup-day conversion counts "
    "and rate. Complements q_funnel_steps (per-user depth, per-step "
    "deadlines): with only ordering + a single overall deadline the "
    "constraints are monotone, so the earliest-feasible-step greedy "
    "(keyed min-agg per stage, range predicate vs the t1 frontier) is "
    "EXACT for reachability — no per-user event sort, no window "
    "function. Determinism: exact timestamp comparisons, BIGINT counts, "
    "one 6dp-rounded division. Scale shape: per stage one filtered keyed "
    "agg + keyed join, shuffling O(funnel users), never O(events); the "
    "final rollup is O(days).",
)
def q_funnel_conversion_window(spark, sf_dir):
    from ..fixtures import events_df

    ev = events_df(spark, sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr("INTERVAL 72 HOURS")
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .groupBy(F.date_trunc("day", "t1").alias("signup_day"))
        .agg(
            F.count("*").cast("long").alias("n_signups"),
            F.count("t2").cast("long").alias("n_clicked"),
            F.count("t3").cast("long").alias("n_converted"),
            F.round(
                F.count("t3").cast("double") / F.count("*"), 6
            ).alias("conv_r"),
        )
    )


@register(
    "q_retention_curve",
    """WITH f AS (
  SELECT user_id, date_trunc('day', min(ts)) AS first_day
  FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day
  FROM events),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM f)
SELECT CAST(date_diff('day', f.first_day, a.activity_day) AS BIGINT)
         AS day_offset,
       CAST(count(*) AS BIGINT) AS active_users,
       round(CAST(count(*) AS DOUBLE) / any_value(n.n_users), 6)
         AS retention_r
FROM a JOIN f USING (user_id) CROSS JOIN n
GROUP BY day_offset""",
    doc="[EXT] day-N retention curve over ALL activity (VERDICT r4 #6): "
    "each user's day offsets are measured from their OWN first-ever "
    "event day; cell N = distinct users active exactly N days after "
    "their first day, as count + share of the full user base. "
    "Complements q_cohort_retention (weekly per-cohort matrix) with the "
    "overall curve product analytics plots. Determinism: day keys from "
    "date_trunc, offsets are exact day-diffs of day-aligned timestamps, "
    "share is one double division of exact BIGINTs rounded at 6dp. "
    "Scale shape: two keyed aggs (first-day, distinct user-day) + a "
    "keyed join; the user base count rides in as a broadcast 1-row "
    "cross join; output is O(distinct offsets).",
)
def q_retention_curve(spark, sf_dir):
    from ..fixtures import events_df

    ev = events_df(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("activity_day")
    ).distinct()
    n = first.agg(F.count("*").cast("long").alias("n_users"))
    return (
        active.join(first, "user_id")
        .crossJoin(F.broadcast(n))
        .groupBy(
            F.expr("timestampdiff(DAY, first_day, activity_day)")
            .cast("long")
            .alias("day_offset")
        )
        .agg(
            F.count("*").cast("long").alias("active_users"),
            F.round(
                F.count("*").cast("double") / F.any_value("n_users"), 6
            ).alias("retention_r"),
        )
    )


# --- interval algebra & time-series search (promoted from r5 staging) -------


@register(
    "q_interval_overlap",
    """WITH l AS (
  SELECT CAST(o_custkey % 50 AS BIGINT) AS grp,
         CAST(o_orderkey AS BIGINT) AS l_id,
         o_orderdate AS l_start,
         o_orderdate + INTERVAL 1 DAY * CAST(o_orderkey % 7 AS INTEGER) AS l_end
  FROM orders WHERE o_orderkey % 5 = 0),
r AS (
  SELECT CAST(o_custkey % 50 AS BIGINT) AS grp,
         CAST(o_orderkey AS BIGINT) AS r_id,
         o_orderdate AS r_start,
         o_orderdate + INTERVAL 1 DAY * CAST(o_orderkey % 11 AS INTEGER) AS r_end
  FROM orders WHERE o_orderkey % 7 = 0)
SELECT l.grp, l_id, r_id, l_start, l_end, r_start, r_end,
       greatest(l_start, r_start) AS overlap_start,
       least(l_end, r_end) AS overlap_end
FROM l JOIN r ON l.grp = r.grp
  AND l_start <= r_end AND r_start <= l_end""",
    doc="Interval x interval overlap join via chunk binning "
    "(operators/temporal.py::interval_overlap_join). Oracle is the direct "
    "theta join — the chunked plan is exactly equivalent for ANY chunk "
    "size, so the compare never depends on chunk/timezone alignment. "
    "Scale shape: explode factor = span/chunk_seconds (guard-capped), "
    "then an equality shuffle join on (grp, chunk) instead of a "
    "per-group cartesian.",
)
def q_interval_overlap(spark, sf_dir):
    from ..operators.temporal import interval_overlap_join

    o = _t(spark, sf_dir, "orders")

    def side(mod_filter, span_mod):
        return o.filter(F.col("o_orderkey") % mod_filter == 0).select(
            (F.col("o_custkey") % 50).cast("long").alias("grp"),
            F.col("o_orderkey").cast("long").alias("iid"),
            F.col("o_orderdate").alias("start"),
            (
                F.col("o_orderdate")
                + F.make_dt_interval(
                    (F.col("o_orderkey") % span_mod).cast("int"),
                    F.lit(0), F.lit(0), F.lit(0),
                )
            ).alias("end"),
        )

    out = interval_overlap_join(
        side(5, 7), side(7, 11), on="grp",
        l_id="iid", l_start="start", l_end="end",
        r_id="iid", r_start="start", r_end="end",
        chunk_seconds=4 * 86_400,
    )
    return out.select(
        "grp", "l_id", "r_id", "l_start", "l_end", "r_start", "r_end",
        "overlap_start", "overlap_end",
    )


@register(
    "q_series_similarity",
    """WITH s AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS value
  FROM events GROUP BY 1, 2),
q AS (SELECT bucket, value AS y FROM s WHERE user_id = 7),
paired AS (
  SELECT s.user_id AS k, s.value AS x, q.y
  FROM s JOIN q USING (bucket) WHERE s.user_id <> 7),
stats AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy
  FROM paired GROUP BY k),
r AS (
  SELECT k AS user_id, n AS n_buckets,
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           AS corr_r
  FROM stats
  WHERE n >= 3
    AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0)
SELECT user_id, n_buckets, corr_r FROM r
ORDER BY corr_r DESC, user_id LIMIT 10""",
    doc="Pearson top-k time-series similarity vs user 7's daily series "
    "(operators/timeseries.py::series_similarity_topk). Sufficient "
    "statistics summed in DECIMAL (exact cross-engine), r assembled in "
    "double from the exact sums and rounded 6dp BEFORE the top-10 cut. "
    "Scale shape: one broadcast join of the query series + one keyed agg; "
    "no per-pair shuffle.",
)
def q_series_similarity(spark, sf_dir):
    from .. import fixtures as fx
    from ..operators.timeseries import series_similarity_topk

    ev = fx.events_df(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(
        F.sum(F.col("value").try_cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("value")
    )
    return series_similarity_topk(daily, query_key=7, k=10)


@register(
    "q_series_dtw",
    """WITH s AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2),
k AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
         var_pop(value) AS vp
  FROM s WHERE user_id <> 7 GROUP BY 1)
SELECT user_id, n_points,
       TRUE AS dtw_nonneg,
       TRUE AS band_monotone,
       TRUE AS dtw_within_edgepath
FROM k WHERE n_points >= 3 AND vp > 0
ORDER BY user_id""",
    doc="Banded-DTW correctness certificate "
    "(operators/timeseries.py::series_dtw_certificate): the numpy "
    "Sakoe-Chiba DP runs per key inside one Arrow-batched pandas UDF "
    "over packed series rows, and three exact "
    "invariants are emitted in-plan — nonnegativity, band monotonicity "
    "(radius 10 <= radius 2), and the DP minimum bounded by one explicit "
    "valid warping path computed as a DataFrame aggregation. The oracle "
    "reproduces the key set (>=3 points, nonzero variance) and literal "
    "TRUE flags; all float comparisons are Spark-vs-Spark (the kmeans "
    "invariant-oracle pattern).",
)
def q_series_dtw(spark, sf_dir):
    from .. import fixtures as fx
    from ..operators.timeseries import series_dtw_certificate

    ev = fx.events_df(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(
        F.sum(F.col("value").try_cast("decimal(18,6)"))
        .cast("double")
        .alias("value")
    )
    return series_dtw_certificate(daily, query_key=7)


_AUDIT_CASTS = {
    "l_quantity": "decimal(12,2)",
    "l_extendedprice": "decimal(12,2)",
    "l_discount": "decimal(12,2)",
    "l_tax": "decimal(12,2)",
}


def _cast_audit_oracle() -> str:
    sums = ",\n  ".join(
        f"SUM(CASE WHEN {c} IS NOT NULL AND TRY_CAST({c} AS DECIMAL(12,2)) IS NULL"
        f" THEN 1 ELSE 0 END) AS s{i}"
        for i, c in enumerate(_AUDIT_CASTS)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS \"column\", 'decimal(12,2)' AS target_type,"
        f" n_rows, CAST(s{i} AS BIGINT) AS silently_nulled FROM base"
        for i, c in enumerate(_AUDIT_CASTS)
    )
    return f"WITH base AS (SELECT count(*) AS n_rows,\n  {sums}\nFROM lineitem)\n{rows}"


@register(
    "q_cast_audit",
    _cast_audit_oracle(),
    doc="[EXT] try_cast silent-exclusion audit (operators/recon.py::"
    "cast_null_audit): per measure column, how many non-NULL values a "
    "try_cast to the money DECIMAL would quietly turn into NULL — the "
    "observability companion to the engine's dirty-feed cast discipline "
    "(ADVICE r7: a corrupt numeric vanishes from sums with no signal; "
    "this names the column and the count). Zero everywhere on clean "
    "testdata — the numeric-dirt sweep exercises the non-zero path. One "
    "scan, parallel aggregates, stack() unpivot.",
)
def q_cast_audit(spark, sf_dir):
    from ..operators.recon import cast_null_audit

    li = _t(spark, sf_dir, "lineitem")
    return cast_null_audit(li, dict(_AUDIT_CASTS))
