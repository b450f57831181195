"""Additional operator coverage: session windows, rollup, distinct counts,
set intersection, date/string/math scalar packs (SURVEY.md §2.4 A6, §2.7 U2,
§2.8, §2.9 T12).

Dialect-alignment conventions (see registry docstring): strings for
formatted dates, round(…, 6) on transcendental math (libm last-ulp risk),
exact integer/decimal math everywhere else.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..fixtures import events_df
from .registry import register


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register(
    "q_session_window",
    """WITH ordered AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         -- ORDER BY must match the lag window's (ts, event_id) exactly:
         -- with ts-only ordering, equal-ts rows at a session boundary could
         -- be framed before the boundary row and land in the prior session,
         -- which Spark session_window (gap-merged) can never produce
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM sessions GROUP BY user_id, session_id""",
    doc="T12 [EXT] session windows (30-min gap): Spark session_window ≡ SQL gaps-and-islands; streaming-capable with withWatermark",
)
def q_session_window(spark, sf_dir):
    e = events_df(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").try_cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total",
        )
    )


@register(
    "q_rollup",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders
       GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    doc="A6 [EXT] rollup hierarchy totals (partial-agg friendly grouping sets)",
)
def q_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").try_cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "q_count_distinct",
    """SELECT o_orderstatus,
              COUNT(DISTINCT o_custkey) AS n_customers,
              COUNT(DISTINCT o_orderpriority) AS n_priorities
       FROM orders GROUP BY o_orderstatus""",
    doc="A6 exact distinct aggregation (expand+two-phase agg in Spark; approx_count_distinct is the sketch variant, not oracle-comparable)",
)
def q_count_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
        )
    )


@register(
    "q_intersect",
    """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT COUNT(*) AS n_common
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)""",
    doc="U2 INTERSECT ALL (customers with both F and O orders)",
)
def q_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b).agg(F.count("*").alias("n_common"))


@register(
    "q_date_funcs",
    """SELECT o_orderkey,
              year(o_orderdate) AS y,
              month(o_orderdate) AS m,
              quarter(o_orderdate) AS q,
              strftime(o_orderdate, '%Y-%m') AS ym,
              o_orderdate + INTERVAL 7 DAY AS plus_week,
              date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
       FROM orders WHERE o_orderkey < 500""",
    doc="F7-F9 date/time functions: extract, format, interval add, day diff",
)
def q_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.expr("timestampadd(DAY, 7, o_orderdate)").alias("plus_week"),
        F.expr(
            "timestampdiff(DAY, cast('1995-01-01 00:00:00' as timestamp_ntz), o_orderdate)"
        ).alias("days_since_95"),
    )


@register(
    "q_string_pack",
    """SELECT p_partkey,
              upper(p_name) AS uname,
              lower(p_brand) AS lbrand,
              substr(p_name, 1, 8) AS prefix,
              lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
              strpos(p_type, 'BRUSHED') AS brushed_at,
              reverse(p_brand) AS rbrand,
              repeat('-', 3) || p_brand AS dashed,
              length(p_name) AS name_len,
              trim(' ' || p_brand || ' ') AS trimmed
       FROM part""",
    doc="F1-F4 extended string functions pack",
)
def q_string_pack(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_name", 1, 8).alias("prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.instr(F.col("p_type"), "BRUSHED").cast("long").alias("brushed_at"),
        F.reverse("p_brand").alias("rbrand"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("p_brand")).alias("dashed"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "q_math_pack",
    """SELECT s_suppkey,
              abs(s_acctbal) AS abal,
              CAST(ceil(s_acctbal) AS DOUBLE) AS cbal,
              CAST(floor(s_acctbal) AS DOUBLE) AS fbal,
              round(sqrt(abs(s_acctbal)), 6) AS sq,
              round(ln(abs(s_acctbal) + 1), 6) AS lnb,
              round(exp(s_suppkey % 5), 6) AS ex,
              CAST(pow(2, s_suppkey % 10) AS DOUBLE) AS p2,
              s_suppkey % 7 AS m7,
              CAST(sign(s_acctbal) AS DOUBLE) AS sg
       FROM supplier""",
    doc="extended math functions pack (transcendentals rounded to 6dp: libm "
    "last-ulp differences across engines). sg is cast to DOUBLE on the oracle "
    "side: DuckDB sign(DECIMAL) yields TINYINT while Spark signum yields "
    "DOUBLE, and the driver's value hash distinguishes 1 from 1.0 (the r2 "
    "hash-only mismatch — every value was verified equal per-row).",
)
def q_math_pack(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("abal"),
        F.ceil("s_acctbal").cast("double").alias("cbal"),
        F.floor("s_acctbal").cast("double").alias("fbal"),
        F.round(F.sqrt(F.abs("s_acctbal")), 6).alias("sq"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 6).alias("lnb"),
        F.round(F.exp(F.col("s_suppkey") % 5), 6).alias("ex"),
        F.pow(F.lit(2), F.col("s_suppkey") % 10).cast("double").alias("p2"),
        (F.col("s_suppkey") % 7).alias("m7"),
        F.signum("s_acctbal").alias("sg"),
    )


@register(
    "q_sql_api",
    """SELECT o_orderstatus, COUNT(*) AS cnt,
              (SELECT COUNT(*) FROM orders) AS total,
              CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM orders) AS frac
       FROM orders GROUP BY o_orderstatus""",
    doc="P9/J4 dynamic SQL via spark.sql over temp views + scalar subquery (plpgsql format()+EXECUTE analog — docs/replication_troubleshooting.md:127-139)",
)
def q_sql_api(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    table = "orders_v"  # dynamic identifier, format('%I')-style
    return spark.sql(
        f"""SELECT o_orderstatus, COUNT(*) AS cnt,
                   (SELECT COUNT(*) FROM {table}) AS total,
                   CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM {table}) AS frac
            FROM {table} GROUP BY o_orderstatus"""
    )


@register(
    "q_approx_stats",
    """SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS exact_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
FROM lineitem GROUP BY l_returnflag""",
    doc="A6 [EXT] sketch aggregates, oracle-able by construction (VERDICT "
    "r4 #3): the estimates themselves are estimator-specific, so the "
    "result carries the EXACT side (count, count-distinct — DuckDB "
    "verifies those bit-for-bit) plus in-plan within-bound booleans for "
    "the approximate side: approx_count_distinct within 3x its 5%% "
    "default rsd of the exact distinct, and percentile_approx(accuracy "
    "10000, rank error 1e-4) p50/p95 inside the exact [p45,p55] / "
    "[p94,p96] quantile brackets computed in the same plan. A sketch "
    "returning garbage flips a boolean; an engine-specific-but-sane "
    "estimate matches.",
)
def q_approx_stats(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # the DISTINCT aggregate is kept in its OWN aggregation and joined back
    # on the 4-row group key: mixing count_distinct with the sketch/
    # percentile buffers forces Catalyst's Expand (every input row
    # duplicated per aggregate path) under the heavy object-buffer
    # aggregators — measured 19.9s combined vs 2.5s split at sf0.1 (8x)
    sketches = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("exact_rows"),
        F.approx_count_distinct("l_orderkey").alias("_approx_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias(
            "_apcts"
        ),
        F.expr(
            "percentile(l_extendedprice, array(0.45, 0.55, 0.94, 0.96))"
        ).alias("_epcts"),
    )
    distincts = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").cast("long").alias("exact_orders")
    )
    return (
        sketches.join(distincts, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_rows",
            "exact_orders",
            (
                F.abs(
                    F.col("_approx_orders").cast("double")
                    - F.col("exact_orders")
                )
                <= F.lit(0.15) * F.col("exact_orders")
            ).alias("hll_ok"),
            (
                (F.element_at("_apcts", 1) >= F.element_at("_epcts", 1))
                & (F.element_at("_apcts", 1) <= F.element_at("_epcts", 2))
            ).alias("p50_ok"),
            (
                (F.element_at("_apcts", 2) >= F.element_at("_epcts", 3))
                & (F.element_at("_apcts", 2) <= F.element_at("_epcts", 4))
            ).alias("p95_ok"),
        )
    )


@register(
    "q_sketch_pack",
    """WITH per AS (
  SELECT o_orderpriority AS label,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_value,
         TRUE AS within_bound
  FROM orders GROUP BY o_orderpriority),
roll AS (
  SELECT '_rollup', CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE
  FROM orders),
tu AS (
  SELECT '_theta_union', CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
ti AS (
  SELECT '_theta_intersect', CAST(count(*) AS BIGINT), TRUE FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')),
kll AS (
  SELECT '_kll_p50_' || s, CAST(NULL AS BIGINT), TRUE
  FROM (VALUES ('1-URGENT'), ('2-HIGH')) t(s))
SELECT * FROM per UNION ALL SELECT * FROM roll UNION ALL
SELECT * FROM tu UNION ALL SELECT * FROM ti UNION ALL SELECT * FROM kll""",
    doc="A6 [EXT] mergeable DataSketches pack, oracle-able by construction "
    "(VERDICT r4 #3): per-priority HLL distinct customers + global rollup "
    "from the group sketches alone (merge, no re-scan), theta set algebra "
    "of two segments' customer sets, KLL order-total medians. Each row "
    "carries the EXACT side (distinct counts, set-algebra cardinalities — "
    "DuckDB reproduces them bit-for-bit; NULL for quantile rows) plus an "
    "in-plan within-bound boolean: HLL/rollup within 8%% of exact (lgK=12 "
    "-> 1.6%% RSE, 3 sigma < 5%%), theta union 10%% / intersection 15%%+2 "
    "absolute, KLL p50 inside the exact [p45, p55] bracket. Tight error "
    "bands stay asserted in tests/test_sketches.py.",
)
def q_sketch_pack(spark, sf_dir):
    from ..operators.sketches import (
        hll_group_distinct,
        hll_rollup,
        theta_segment_algebra,
        kll_group_quantiles,
    )

    o = _t(spark, sf_dir, "orders")
    seg_a, seg_b = "1-URGENT", "2-HIGH"
    prio = F.col("o_orderpriority")

    per_sk = hll_group_distinct(o, "o_orderpriority", "o_custkey")
    per_exact = o.groupBy(prio.alias("label")).agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_value")
    )
    per = per_exact.join(
        F.broadcast(
            per_sk.select(prio.alias("label"), "approx_distinct")
        ),
        "label",
    ).select(
        "label",
        "exact_value",
        (
            F.abs(F.col("approx_distinct").cast("double") - F.col("exact_value"))
            <= F.lit(0.08) * F.col("exact_value")
        ).alias("within_bound"),
    )

    roll = (
        hll_rollup(per_sk)
        .crossJoin(
            o.agg(F.count_distinct("o_custkey").cast("long").alias("exact_value"))
        )
        .select(
            F.lit("_rollup").alias("label"),
            "exact_value",
            (
                F.abs(
                    F.col("approx_distinct_total").cast("double")
                    - F.col("exact_value")
                )
                <= F.lit(0.08) * F.col("exact_value")
            ).alias("within_bound"),
        )
    )

    seg = o.filter(prio.isin(seg_a, seg_b))
    exact_union = seg.agg(
        F.count_distinct("o_custkey").cast("long").alias("eu")
    )
    exact_int = (
        seg.groupBy("o_custkey")
        .agg(
            F.max((prio == seg_a).cast("int")).alias("ia"),
            F.max((prio == seg_b).cast("int")).alias("ib"),
        )
        .filter((F.col("ia") == 1) & (F.col("ib") == 1))
        .agg(F.count("*").cast("long").alias("ei"))
    )
    algebra = theta_segment_algebra(
        o, "o_orderpriority", "o_custkey", seg_a, seg_b
    ).crossJoin(exact_union).crossJoin(exact_int)
    theta_u = algebra.select(
        F.lit("_theta_union").alias("label"),
        F.col("eu").alias("exact_value"),
        (
            F.abs(F.col("n_union").cast("double") - F.col("eu"))
            <= F.lit(0.10) * F.col("eu")
        ).alias("within_bound"),
    )
    theta_i = algebra.select(
        F.lit("_theta_intersect").alias("label"),
        F.col("ei").alias("exact_value"),
        (
            F.abs(F.col("n_intersect").cast("double") - F.col("ei"))
            <= F.lit(0.15) * F.col("ei") + F.lit(2.0)
        ).alias("within_bound"),
    )

    quant = kll_group_quantiles(seg, "o_orderpriority", "o_totalprice", (0.5,))
    exact_pcts = seg.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, array(0.45, 0.55))").alias("_e")
    )
    kll = quant.join(exact_pcts, "o_orderpriority").select(
        F.concat(F.lit("_kll_p50_"), prio).alias("label"),
        F.lit(None).cast("long").alias("exact_value"),
        (
            (F.col("q_50") >= F.element_at("_e", 1))
            & (F.col("q_50") <= F.element_at("_e", 2))
        ).alias("within_bound"),
    )

    return per.unionByName(roll).unionByName(theta_u).unionByName(
        theta_i
    ).unionByName(kll)


@register(
    "q_grouped_demean",
    """WITH m AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       e.value - m.mean_v AS demeaned
FROM events e JOIN m USING (user_id)""",
    doc="[EXT] grouped demean as a native unbounded-frame window agg: "
    "decimal-exact per-user mean (SUM(DECIMAL)/COUNT over an unordered "
    "partition — one keyed shuffle, NO per-partition sort, no Python/Arrow "
    "round-trip), raw IEEE subtraction (no rounding: round() half-rules "
    "differ between pandas and DuckDB). The equivalent grouped-map "
    "applyInPandas path is exercised in tests/test_pandas_surface.py — at "
    "scale the Python worker fan-out is pure overhead for arithmetic "
    "Catalyst can run in codegen.",
)
def q_grouped_demean(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    mean_v = (
        F.sum(F.col("value").try_cast("decimal(12,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return events_df(spark, sf_dir).select(
        "event_id", "user_id", (F.col("value") - mean_v).alias("demeaned")
    )


@register(
    "q_percentiles",
    """SELECT l_returnflag,
              round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
              round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
              round(median(l_extendedprice), 6) AS med
       FROM lineitem GROUP BY l_returnflag""",
    doc="A6 exact percentiles (sort-based, linear interpolation) — the exact counterpart of the approx sketch",
)
def q_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # ONE percentile buffer for all three outputs: percentile(col, array(..))
    # shares a single value-count map per group where three separate
    # percentile()/median() aggregates each build (and shuffle) their own
    # copy of the full column — med IS percentile 0.5 (Spark's Median is
    # defined as Percentile(col, 0.5); DuckDB's median is quantile_cont 0.5),
    # so the values are bit-identical while the ObjectHashAggregate carries
    # one buffer instead of three (r14 opt: 4.4 s -> see OPTIMIZATION_r14.md)
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("_p"))
        .select(
            "l_returnflag",
            F.round(F.col("_p")[0], 6).alias("p50"),
            F.round(F.col("_p")[1], 6).alias("p90"),
            F.round(F.col("_p")[0], 6).alias("med"),
        )
    )


@register(
    "q_rank_pack",
    """SELECT o_custkey, o_orderkey,
              ROW_NUMBER() OVER w AS rn,
              RANK() OVER w AS rnk,
              DENSE_RANK() OVER w AS drnk,
              NTILE(4) OVER w AS quartile,
              CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_key,
              first_value(o_orderkey) OVER w AS first_key,
              last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""",
    doc="W1-W4 extended ranking pack: row_number/rank/dense_rank/ntile/lead/first/last",
)
def q_rank_pack(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@register(
    "q_stats_pack",
    """SELECT l_returnflag,
              round(stddev_samp(l_extendedprice), 4) AS sd,
              round(var_samp(l_extendedprice), 2) AS var,
              round(corr(l_quantity, l_extendedprice), 6) AS qp_corr,
              round(covar_samp(l_quantity, l_extendedprice), 4) AS qp_cov,
              round(avg(l_extendedprice), 6) AS mean_price
       FROM lineitem GROUP BY l_returnflag""",
    doc="A6 statistical aggregates (stddev/variance/corr/covar) — rounded: accumulation order differs across engines",
)
def q_stats_pack(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qp_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qp_cov"),
        F.round(F.avg("l_extendedprice"), 6).alias("mean_price"),
    )


@register(
    "q_array_pack",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 50)
SELECT doc_id,
       len(w) AS n,
       list_contains(w, 'spark') AS has_spark,
       array_to_string(w[1:3], '|') AS head3,
       array_to_string(list_sort(list_distinct(w[1:6])), '|') AS sorted_head,
       w[1] AS first_tok,
       w[-1] AS last_tok
FROM t""",
    doc="array/list function pack (slice/contains/sort/distinct/element_at) — arrays surfaced as joined strings for stable hashing",
)
def q_array_pack(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    w = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(w).cast("long").alias("n"),
        F.array_contains(w, "spark").alias("has_spark"),
        F.array_join(F.slice(w, 1, 3), "|").alias("head3"),
        F.array_join(F.sort_array(F.array_distinct(F.slice(w, 1, 6))), "|").alias(
            "sorted_head"
        ),
        F.element_at(w, 1).alias("first_tok"),
        F.element_at(w, -1).alias("last_tok"),
    )


@register(
    "q_unpivot",
    """SELECT o_orderkey, metric, CAST(val AS DOUBLE) AS val
FROM (
  SELECT o_orderkey,
         CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice,
         CAST(o_custkey AS DECIMAL(12,2)) AS custkey_num
  FROM orders WHERE o_orderkey < 100
)
UNPIVOT (val FOR metric IN (totalprice, custkey_num))""",
    doc="A6 [EXT] unpivot/melt: wide metrics → (key, metric, value) long form",
)
def q_unpivot(spark, sf_dir):
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.col("o_totalprice").try_cast("decimal(12,2)").alias("totalprice"),
            F.col("o_custkey").try_cast("decimal(12,2)").alias("custkey_num"),
        )
    )
    return o.unpivot(
        "o_orderkey", ["totalprice", "custkey_num"], "metric", "val"
    ).withColumn("val", F.col("val").cast("double"))


@register(
    "q_sample",
    """SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS sampled_rows,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sampled_total
       FROM orders
       WHERE CAST(CAST('0x' || substr(md5('sample-v2:' || CAST(o_orderkey AS VARCHAR)), 1, 8)
                  AS BIGINT) % 20 AS BIGINT) < 1
       GROUP BY o_orderstatus""",
    doc="[EXT] deterministic 5% Bernoulli sample of orders via md5 row hash — "
    "engine-portable replacement for seeded TABLESAMPLE (whose sampler is "
    "engine-specific and thus unverifiable cross-engine). Same pattern as "
    "q_hash_sample but a different salt/rate/table: identical sample under "
    "reruns and backfills, map-only per-row decision, oracle-checkable.",
)
def q_sample(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sample-v2:"), F.col("o_orderkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        o.filter((h % 20) < 1)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("sampled_rows"),
            F.sum(F.col("o_totalprice").try_cast("decimal(12,2)"))
            .cast("double")
            .alias("sampled_total"),
        )
    )


@register(
    "q_window_frames",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                AS sliding_sum3,
              CAST(COUNT(*) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderkey
                  RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT)
                AS range_neighbors,
              percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                AS pct_rank,
              cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                AS cdist
       FROM orders""",
    doc="W4 [EXT] window frame pack: sliding ROWS frame (exact DECIMAL sum), "
    "numeric RANGE frame on the BIGINT key (value-based, not row-based), "
    "percent_rank + cume_dist (rank ratios — exact int division). Order key "
    "is globally unique so every frame is fully deterministic.",
)
def q_window_frames(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w3 = w.rowsBetween(-2, Window.currentRow)
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey").cast("long"))
        .rangeBetween(-5, 5)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").try_cast("decimal(12,2)"))
        .over(w3)
        .cast("double")
        .alias("sliding_sum3"),
        F.count("*").over(wr).cast("long").alias("range_neighbors"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "q_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
              CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), ())""",
    doc="A6 [EXT] explicit GROUPING SETS with GROUPING() indicators — the "
    "general form behind rollup/cube; one shuffle, each set partial-agg "
    "friendly; GROUPING() disambiguates real NULLs from subtotal rows",
)
def q_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
                  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
                  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
           FROM _gs_orders
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), ())"""
    )


@register(
    "q_hash_sample",
    """SELECT l_returnflag,
              CAST(COUNT(*) AS BIGINT) AS sampled_rows,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sampled_qty
       FROM lineitem
       WHERE CAST(CAST('0x' || substr(md5('sample-v1:' || CAST(l_orderkey AS VARCHAR)
                  || ':' || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS BIGINT) < 10
       GROUP BY l_returnflag""",
    doc="[EXT] deterministic hash sampling (the reproducible counterpart of "
    "TABLESAMPLE): md5(salt || row key) % 100 < rate — identical sample in "
    "any engine, stable under reruns/backfills, per-row decision is "
    "map-only. The sampling pattern every lineage-auditable pipeline "
    "uses instead of seeded RNG.",
)
def q_hash_sample(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("sample-v1:"),
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        li.filter((h % 100) < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("sampled_rows"),
            F.sum(F.col("l_quantity").try_cast("decimal(12,2)"))
            .cast("double")
            .alias("sampled_qty"),
        )
    )


@register(
    "q_salted_join",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority""",
    doc="[EXT] skew-resistant salted equi-join (operators/layout.py::"
    "salted_join): the fact side gets a uniform salt in [0,8), the other "
    "side replicates x8, the join runs on (key, salt) — a power-law hot "
    "key fans across 8 reducers instead of stalling one (the manual "
    "fallback when AQE's skew split can't help, e.g. a broadcast-"
    "disabled big-big join; measured 90%%-hot-key case in SCALING.md). "
    "Salting is pure plumbing — result multiplicity is unchanged — so "
    "the oracle is the PLAIN join+agg: any salt leak, dropped row, or "
    "duplicate from the explode side breaks the match.",
)
def q_salted_join(spark, sf_dir):
    from ..operators.layout import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_join(li, o, "k", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").try_cast("decimal(12,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


@register(
    "q_heavy_hitters",
    """SELECT user_id,
              CAST(count(*) AS BIGINT) AS cnt,
              false AS missed_by_sketch,
              false AS underestimated
       FROM events
       WHERE user_id IS NOT NULL
       GROUP BY user_id
       HAVING count(*) >= 0.007 * (SELECT count(*) FROM events
                                   WHERE user_id IS NOT NULL)""",
    doc="A6 [EXT] count-min-sketch heavy hitters "
    "(operators/sketches.py::heavy_hitters): users covering >=0.7%% of "
    "events, found via the CMS two-pass (build the depth x width "
    "mergeable sketch with ONE partially-aggregated shuffle, then a "
    "map-shaped re-scan through broadcast cell lookups — the survivor "
    "distinct is the only value shuffle, never the full universe). "
    "Oracle-able by the certificate pattern: the output lists the EXACT "
    "hitters (DuckDB mirrors the HAVING) plus two in-plan invariant "
    "booleans that are mathematically false for every row — "
    "missed_by_sketch (CMS est >= true count, so a true hitter always "
    "passes the threshold) and underestimated (min-of-cells can only "
    "overcount). Error-band and merge tests stay in "
    "tests/test_sketches.py.",
)
def q_heavy_hitters(spark, sf_dir):
    from ..operators.sketches import heavy_hitters

    ev = events_df(spark, sf_dir).where(F.col("user_id").isNotNull())
    n = ev.count()
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= F.lit(0.007) * F.lit(float(n)))
    )
    hh = heavy_hitters(ev, "user_id", min_fraction=0.007)
    return (
        exact.join(F.broadcast(hh), "user_id", "left")
        .select(
            "user_id",
            "cnt",
            F.col("est").isNull().alias("missed_by_sketch"),
            F.coalesce(F.col("est") < F.col("cnt"), F.lit(False)).alias(
                "underestimated"
            ),
        )
    )


@register(
    "q_kmv_distinct",
    """WITH h AS (
         SELECT DISTINCT o_orderpriority,
                CAST('0x' || substr(md5('kmv-v1:' || CAST(o_custkey AS VARCHAR)),
                                    1, 15) AS BIGINT) AS h
         FROM orders WHERE o_custkey IS NOT NULL
       ), rk AS (
         SELECT o_orderpriority, h,
                row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
         FROM h
       ), sk AS (
         SELECT o_orderpriority, h FROM rk WHERE rn <= 64
       )
       SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_hashes,
              CAST(max(h) AS BIGINT) AS kth_hash,
              CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                   ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                        / CAST(max(h) AS DOUBLE)
              END AS est_distinct
       FROM sk GROUP BY o_orderpriority""",
    doc="A6 [EXT] per-group KMV (bottom-k) distinct sketch "
    "(operators/sketches.py::kmv_build_grouped/kmv_distinct_grouped): "
    "distinct customers per order priority estimated from the 64 smallest "
    "md5 hashes per group — the DETERMINISTIC, engine-portable member of "
    "the sketch family (HLL/theta are binary and tolerance-tested; a KMV "
    "sketch is value-identical in any engine, so this row carries a FULL "
    "hash-match oracle, sketch construction and estimator both). One "
    "keyed dedup shuffle with map-side partials + a per-group bottom-k "
    "window; mergeable by bottom-k-of-union for per-day rollups. "
    "Estimator is fixed-order double math ((k-1)*2^60/max_h), "
    "IEEE-identical cross-engine.",
)
def q_kmv_distinct(spark, sf_dir):
    from ..operators.sketches import kmv_build_grouped, kmv_distinct_grouped

    o = _t(spark, sf_dir, "orders")
    sk = kmv_build_grouped(o, "o_orderpriority", "o_custkey", k=64)
    return kmv_distinct_grouped(sk, "o_orderpriority", k=64)


@register(
    "q_kmv_overlap",
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       ), grams AS (
         SELECT doc_id, array_to_string(tk[i+1:i+3], ' ') AS g
         FROM toks, UNNEST(range(CAST(len(tk) - 3 + 1 AS BIGINT))) AS u(i)
       ), ha AS (
         SELECT DISTINCT CAST('0x' || substr(md5('kmv-v1:' || g), 1, 15)
                              AS BIGINT) AS h
         FROM grams WHERE doc_id % 2 = 0
       ), hb AS (
         SELECT DISTINCT CAST('0x' || substr(md5('kmv-v1:' || g), 1, 15)
                              AS BIGINT) AS h
         FROM grams WHERE doc_id % 2 = 1
       ), ska AS (
         SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha)
         WHERE rn <= 256
       ), skb AS (
         SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb)
         WHERE rn <= 256
       ), uni AS (
         SELECT h FROM (
           SELECT h, row_number() OVER (ORDER BY h) AS rn
           FROM (SELECT DISTINCT h FROM (
                   SELECT h FROM ska UNION ALL SELECT h FROM skb))
         ) WHERE rn <= 256
       ), tag AS (
         SELECT u.h,
                (a.h IS NOT NULL AND b.h IS NOT NULL) AS in_both
         FROM uni u LEFT JOIN ska a USING (h) LEFT JOIN skb b USING (h)
       )
       SELECT CAST(count(*) AS BIGINT) AS k_used,
              CAST(sum(CAST(in_both AS BIGINT)) AS BIGINT) AS shared,
              CAST(sum(CAST(in_both AS BIGINT)) AS DOUBLE)
                / CAST(count(*) AS DOUBLE) AS est_jaccard,
              CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                   ELSE CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                        / CAST(max(h) AS DOUBLE)
              END AS est_union,
              CAST(sum(CAST(in_both AS BIGINT)) AS DOUBLE)
                / CAST(count(*) AS DOUBLE)
                * (CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                        ELSE CAST(255 AS DOUBLE)
                             * CAST(1152921504606846976 AS DOUBLE)
                             / CAST(max(h) AS DOUBLE)
                   END) AS est_intersection
       FROM tag""",
    doc="A6 [EXT] corpus-overlap estimation from KMV sketches alone "
    "(operators/sketches.py::kmv_build/kmv_jaccard): Jaccard / union / "
    "intersection of the two corpus halves' 3-gram shingle sets, "
    "estimated from 256 hashes per side — train/eval contamination and "
    "source-drift measurement WITHOUT co-shuffling the raw shingle "
    "lists (each side reduces to a <=k-row sketch; the compare is "
    "driver-cheap). The global build pre-filters the hash line at "
    "~4k/n of the space (n from one HLL pass), so the dedup shuffle is "
    "O(k)-expected, provably exact (a threshold is a hash-line prefix), "
    "with an unfiltered fallback. Deterministic md5 hashing end-to-end "
    "-> full cross-engine oracle on every output column.",
)
def q_kmv_overlap(spark, sf_dir):
    from ..operators.dedup import shingles
    from ..operators.sketches import kmv_build_pair, kmv_jaccard

    d = _t(spark, sf_dir, "documents")
    # one-pass two-sided build (r14 opt): both halves come from the SAME
    # corpus, so the shingle explode + md5 hashing run once over a
    # parity-tagged stream instead of once per side x per action —
    # sketches byte-identical to the per-side kmv_build (same hash/
    # threshold/fallback; pinned in tests/test_sketches.py)
    sh = shingles(d, k=3).select(
        (F.col("doc_id") % 2).alias("side"), F.col("shingle").alias("v")
    )
    sk = kmv_build_pair(sh, "side", "v", k=256, sides=(0, 1))
    return kmv_jaccard(sk[0], sk[1], k=256)


@register(
    "q_skew_report",
    """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
           FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS _tot FROM c)
SELECT user_id, n_rows,
       CAST(n_rows AS DOUBLE) / CAST(_tot AS DOUBLE) AS share,
       CAST((n_rows - 1) // 70 + 1 AS BIGINT) AS salt_factor,
       (n_rows - 1) // 70 > 0 AS is_hot
FROM c, t""",
    doc="A6 [EXT] shuffle-key skew diagnosis (operators/layout.py::"
    "skew_report): per-key row count, share of the table, and the exact "
    "salt factor salted_join/AQE would need to cap each key's reducer at "
    "target_rows — the report to read BEFORE a big shuffle. Salt factor "
    "is exact integer arithmetic ((n-1) div t + 1), never float ceil; one "
    "keyed count shuffle plus a broadcast single-row total, no collect. "
    "target 70 is non-vacuous at sf0.01 (hot and cold keys both present).",
)
def q_skew_report(spark, sf_dir):
    from ..operators.layout import skew_report

    ev = _t(spark, sf_dir, "events")
    return skew_report(ev, ["user_id"], target_rows=70)


@register(
    "q_outliers_robust",
    """WITH e AS (SELECT event_id, event_type, value FROM events
          WHERE value IS NOT NULL),
med AS (SELECT event_type, median(value) AS med FROM e GROUP BY event_type),
mad AS (SELECT e.event_type, min(med.med) AS med,
               median(abs(e.value - med.med)) AS mad
        FROM e JOIN med USING (event_type) GROUP BY e.event_type)
SELECT e.event_id, e.event_type, e.value, mad.med, mad.mad,
       round((0.6745 * (e.value - mad.med)) / mad.mad, 6) AS robust_z,
       abs(round((0.6745 * (e.value - mad.med)) / mad.mad, 6)) > 3.5
         AS is_outlier
FROM e JOIN mad USING (event_type)""",
    doc="A6 [EXT] robust per-group outlier flags "
    "(operators/timeseries.py::robust_outliers): Iglewicz-Hoaglin "
    "modified z-score 0.6745*(x-median)/MAD per event_type — the robust "
    "alternative to mean/stddev scoring (one wild reading moves every "
    "mean-based score in its group; the median/MAD move only when half "
    "the group is wild). Two grouped EXACT medians + one broadcast join "
    "back; score rounded to 6 digits BEFORE the 3.5 threshold compare "
    "(flag margin >=3.5e-3 at sf0.01, 8.8e-5 at sf0.1 — both above "
    "rounding resolution).",
)
def q_outliers_robust(spark, sf_dir):
    from ..operators.timeseries import robust_outliers

    ev = _t(spark, sf_dir, "events")
    return robust_outliers(
        ev, "event_type", "value", id_cols=["event_id"], z_thresh=3.5
    )


@register(
    "q_gapfill",
    """WITH r AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
           AS avg_value
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
span AS (SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
         FROM r GROUP BY 1),
grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
         FROM span),
g AS (SELECT grid.event_type, grid.bucket_ts, r.n_events, r.avg_value
      FROM grid LEFT JOIN r USING (event_type, bucket_ts)),
w AS (SELECT *,
        last_value(avg_value IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _lv,
        last_value(CASE WHEN avg_value IS NOT NULL THEN bucket_ts END
                   IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _pt,
        first_value(avg_value IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _nv,
        first_value(CASE WHEN avg_value IS NOT NULL THEN bucket_ts END
                    IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY bucket_ts
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS _nt
      FROM g)
SELECT event_type, bucket_ts,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       avg_value,
       _lv AS locf_avg_value,
       CASE WHEN avg_value IS NOT NULL THEN avg_value
            WHEN _lv IS NOT NULL AND _nv IS NOT NULL
            THEN round(_lv + (_nv - _lv)
                       * (CAST(date_diff('second', _pt, bucket_ts) AS DOUBLE)
                          / CAST(date_diff('second', _pt, _nt) AS DOUBLE)), 6)
            END AS linear_avg_value,
       avg_value IS NULL AS is_gap
FROM w""",
    doc="W4/T12 [EXT] time-bucket gap filling "
    "(operators/timeseries.py::gapfill): per-type hourly series densified "
    "to the full grid (sequence+explode, per-key bounded — never a global "
    "calendar cross join) with LOCF carry-forward and linear interpolation "
    "between bracketing observations — the hypertable time_bucket_gapfill/"
    "locf/interpolate surface as ONE keyed window sort (all four fills "
    "share it). Hour-bucket averages are exact-decimal sums over one IEEE "
    "division; interpolation uses naive-calendar second diffs (the DST-"
    "proof asof convention) rounded to 6 digits; real readings pass "
    "through untouched. Non-vacuous gaps at sf0.01 (~40/type of 720 "
    "hourly buckets).",
)
def q_gapfill(spark, sf_dir):
    from ..operators.timeseries import gapfill

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    readings = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    return gapfill(
        readings,
        ["event_type"],
        "bucket_ts",
        "avg_value",
        step_seconds=3600,
        count_col="n_events",
    ).select(
        "event_type",
        "bucket_ts",
        "n_events",
        "avg_value",
        "locf_avg_value",
        "linear_avg_value",
        "is_gap",
    )


@register(
    "q_time_weighted",
    """WITH s AS (SELECT user_id, event_id, ts, value FROM events
          WHERE value IS NOT NULL),
w AS (SELECT user_id, ts, value,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS next_ts
      FROM s),
d AS (SELECT user_id, value,
        date_diff('microsecond', ts, next_ts) AS dt_us
      FROM w)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(dt_us) AS BIGINT) AS duration_us,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)) * dt_us) AS DOUBLE)
             / CAST(sum(dt_us) AS DOUBLE), 6) AS time_weighted_avg
FROM d GROUP BY user_id""",
    doc="A6/W4 [EXT] time-weighted average over irregular samples "
    "(operators/timeseries.py::time_weighted_avg): the integral of each "
    "user's carry-forward value curve over its observed duration — the "
    "metrics aggregate a plain AVG gets wrong (a value held an hour must "
    "weigh 3600x one held a second; timescale time_weight('LOCF')). One "
    "lead() window + one keyed agg; value x held-seconds products are "
    "DECIMAL x INTEGER (exact in any summation order), one final IEEE "
    "divide; event_id tiebreak keeps tied timestamps partition-invariant.",
)
def q_time_weighted(spark, sf_dir):
    from ..operators.timeseries import time_weighted_avg

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return time_weighted_avg(
        ev, ["user_id"], "ts", "value", tiebreak_cols=["event_id"]
    )


@register(
    "q_counter_delta",
    """WITH s AS (SELECT user_id, event_id, ts, value FROM events
          WHERE value IS NOT NULL),
w AS (SELECT user_id,
        CAST(value AS DECIMAL(18,6)) AS v,
        lag(CAST(value AS DECIMAL(18,6)))
          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM s)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN prev IS NULL THEN NULL
                     WHEN v >= prev THEN v - prev
                     ELSE v END) AS DOUBLE) AS total_increase,
       CAST(count(*) FILTER (prev IS NOT NULL AND v < prev) AS BIGINT)
         AS n_resets
FROM w GROUP BY user_id""",
    doc="A6/W4 [EXT] monotonic-counter increase with reset handling "
    "(operators/timeseries.py::counter_deltas): per consecutive sample "
    "pair the delta is v-prev when the counter grew and v when it "
    "dropped (a drop = process restart, the counter rebuilt from zero — "
    "promql increase / timescale counter_agg semantics), plus the reset "
    "count as the ops signal. One lag() window + one keyed agg; DECIMAL "
    "deltas sum exactly in any order, DOUBLE only at the surface.",
)
def q_counter_delta(spark, sf_dir):
    from ..operators.timeseries import counter_deltas

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return counter_deltas(
        ev, ["user_id"], "ts", "value", tiebreak_cols=["event_id"]
    )
