"""Generic relational operators (SURVEY.md §2.2-2.8) on the TPC-H-ish corpus.

Each query exercises one inventory row end-to-end with a DuckDB oracle.
Reference sites cited per query. All are single declarative DataFrame plans —
Catalyst handles pushdown/pruning/join strategy; the only hints are
broadcast() on catalog-sized dimensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from ..fixtures import events_df


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- aggregates ------------------------------------------------------------


@register(
    "q_count",
    "SELECT COUNT(*) AS cnt FROM lineitem",
    doc="A1 full-table COUNT(*) — verify_replication.py:58-59",
)
def q_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


@register(
    "q_minmax",
    """SELECT MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
              MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
       FROM orders""",
    doc="A2 MIN/MAX scalar aggregates — verify_replication.py:109-110",
)
def q_minmax(spark, sf_dir):
    return _t(spark, sf_dir, "orders").agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@register(
    "q_ext_cube",
    """SELECT o_orderstatus, o_orderpriority,
              COUNT(*) AS cnt,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders
       GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    doc="A6 [EXT] cube/rollup grouping sets — decimal-exact sums",
)
def q_ext_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").try_cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


# --- filters / projections -------------------------------------------------


@register(
    "q_filter_eq",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders
       WHERE o_orderstatus = 'F' AND o_orderpriority = '3-MEDIUM'
         AND o_custkey IS NOT NULL""",
    doc="P2/P3/P6 conjunctive equality + NULL predicate — check_batch_replication_status.sql:28-31",
)
def q_filter_eq(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderpriority") == "3-MEDIUM")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "q_filter_timewindow",
    """SELECT event_type, COUNT(*) AS cnt
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' - INTERVAL 24 HOUR
         AND ts < TIMESTAMP '2024-01-02 00:00:00'
       GROUP BY event_type""",
    doc="P4/F7/F8 sliding 24h window with deterministic as_of — check_batch_replication_status.sql:32",
)
def q_filter_timewindow(spark, sf_dir):
    as_of = "cast('2024-01-02 00:00:00' as timestamp_ntz)"
    return (
        events_df(spark, sf_dir)
        .filter(
            (F.col("ts") >= F.expr(f"timestampadd(HOUR, -24, {as_of})"))
            & (F.col("ts") < F.expr(as_of))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="P8 DISTINCT projection — check_batch_replication_status.sql:35-41",
)
def q_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "q_semi_range",
    """SELECT o_orderkey, o_orderstatus FROM orders
       WHERE o_orderkey IN (SELECT * FROM range(100, 500))""",
    doc="P7/F14 IN-subquery over generate_series → left-semi join against spark.range — verify_replication.py:107-112",
)
def q_semi_range(spark, sf_dir):
    rng = spark.range(100, 500).withColumnRenamed("id", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(rng), "o_orderkey", "left_semi")
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "q_semi_exists",
    """SELECT o_orderkey, o_totalprice FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""",
    doc="J3 EXISTS correlated subquery → left-semi join — check_batch_replication_status.sql:49-53,86-90",
)
def q_semi_exists(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


# --- joins -----------------------------------------------------------------


@register(
    "q_cross_join",
    """SELECT r.r_name, s.o_orderstatus
       FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s""",
    doc="J1 CROSS JOIN of tiny dims → broadcast NLJ — check_batch_replication_status.sql:83-84",
)
def q_cross_join(spark, sf_dir):
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(s))


@register(
    "q_left_join_agg",
    """SELECT r.r_name,
              COUNT(n.n_nationkey) AS n_nations,
              COALESCE(string_agg(n.n_name, ',' ORDER BY n.n_name), '') AS nations
       FROM region r LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
    doc="J5+A3+F16 LEFT JOIN + multi-key GROUP BY + ordered ARRAY_AGG — docs/replication_troubleshooting.md:47-56",
)
def q_left_join_agg(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey, "left")
        .groupBy("r_name")
        .agg(
            F.count("n_nationkey").alias("n_nations"),
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        )
    )


# --- sorts / limits --------------------------------------------------------


@register(
    "q_sort",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
       FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
       LIMIT 100""",
    doc="O1/O4 ORDER BY DESC + LIMIT (TakeOrderedAndProject) — check_batch_replication_status.sql:91",
)
def q_sort(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --- scalar functions ------------------------------------------------------


@register(
    "q_scalar_pack",
    """SELECT n_name,
              n_name || '_slot' AS slot_like,
              replace(n_name || '_slot', '_slot', '') AS stripped,
              split_part('public.' || n_name, '.', 1) AS schema_part,
              split_part('public.' || n_name, '.', 2) AS table_part,
              COALESCE(NULLIF(n_name, 'FRANCE'), 'unknown') AS coalesced,
              CASE WHEN n_regionkey < 2 THEN 'west' ELSE 'east' END AS bucket,
              CASE WHEN n_nationkey * 1000 < 1024 THEN CAST(n_nationkey * 1000 AS VARCHAR) || ' bytes'
                   WHEN n_nationkey * 1000 < 1048576 THEN CAST(round(n_nationkey * 1000 / 1024.0, 2) AS VARCHAR) || ' KB'
                   ELSE CAST(round(n_nationkey * 1000 / 1048576.0, 2) AS VARCHAR) || ' MB'
              END AS pretty_size
       FROM nation""",
    doc="F1-F6,F13 string concat/replace/split_part/coalesce/CASE/byte-pretty-print pack",
)
def q_scalar_pack(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    nbytes = F.col("n_nationkey") * 1000
    kb, mb = 1024.0, 1024.0 * 1024.0
    pretty = (
        F.when(nbytes < kb, F.concat(nbytes.cast("string"), F.lit(" bytes")))
        .when(
            nbytes < mb,
            F.concat(F.round(nbytes / kb, 2).cast("string"), F.lit(" KB")),
        )
        .otherwise(F.concat(F.round(nbytes / mb, 2).cast("string"), F.lit(" MB")))
    )
    return n.select(
        "n_name",
        F.concat(F.col("n_name"), F.lit("_slot")).alias("slot_like"),
        F.regexp_replace(F.concat(F.col("n_name"), F.lit("_slot")), "_slot", "").alias(
            "stripped"
        ),
        F.split_part(F.concat(F.lit("public."), F.col("n_name")), F.lit("."), F.lit(1)).alias(
            "schema_part"
        ),
        F.split_part(F.concat(F.lit("public."), F.col("n_name")), F.lit("."), F.lit(2)).alias(
            "table_part"
        ),
        F.coalesce(F.nullif(F.col("n_name"), F.lit("FRANCE")), F.lit("unknown")).alias(
            "coalesced"
        ),
        F.when(F.col("n_regionkey") < 2, "west").otherwise("east").alias("bucket"),
        pretty.alias("pretty_size"),
    )


# --- window functions ------------------------------------------------------


@register(
    "q_lag_trend",
    """SELECT user_id, event_id,
              CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value_d,
              CAST(CAST(value AS DECIMAL(12,2))
                   - COALESCE(lag(CAST(value AS DECIMAL(12,2))) OVER w, CAST(0 AS DECIMAL(12,2)))
                   AS DOUBLE) AS delta,
              CAST(SUM(CAST(value AS DECIMAL(12,2)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    doc="W4 [EXT] lag + frame-spec running aggregate — trend groundwork, docs/replication_troubleshooting.md:154-167",
)
def q_lag_trend(spark, sf_dir):
    from pyspark.sql import Window

    e = events_df(spark, sf_dir).withColumn(
        "value_d", F.col("value").try_cast("decimal(12,2)")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = w.rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.col("value_d").cast("double").alias("value_d"),
        (
            F.col("value_d")
            - F.coalesce(F.lag("value_d").over(w), F.lit(0).cast("decimal(12,2)"))
        )
        .cast("double")
        .alias("delta"),
        F.sum("value_d").over(w3).cast("double").alias("rolling3"),
    )


@register(
    "q_ext_tumble",
    """SELECT date_trunc('hour', ts) AS ws,
              event_type,
              COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM events GROUP BY 1, 2""",
    doc="T12 [EXT] event-time tumbling window (batch form of streaming window()) ",
)
def q_ext_tumble(spark, sf_dir):
    e = events_df(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").try_cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "total")
    )


@register(
    "q_priority_pick",
    """SELECT o_custkey, o_orderkey, o_totalprice
       FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (
                  PARTITION BY o_custkey
                  ORDER BY CASE o_orderpriority
                             WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                             WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                             ELSE 5 END,
                           o_orderkey
                ) AS rn
         FROM orders
       ) WHERE rn = 1""",
    doc="W3/O3 priority-CASE ordered top-1 pick per group — check_latest_batch_replication_status.sql:59-65",
)
def q_priority_pick(spark, sf_dir):
    prio = F.expr(
        "CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 "
        "WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4 ELSE 5 END"
    )
    # top-1-per-group as hash aggregation — map-side partial agg collapses
    # each group before the shuffle (volume O(groups), not O(rows)); no
    # window sort anywhere. Two deliberate encodings keep the whole plan in
    # codegen HashAggregate (struct-valued min_by buffers demote to
    # SortAggregate and the per-partition sorts return):
    # 1. the composite ordering (priority, o_orderkey) packs into ONE long
    #    (collision-free while o_orderkey < 10^13: TPC-H orderkeys reach
    #    ~6e9 at SF=1000, long max admits prio*10^13 + key with headroom);
    #    o_orderkey decodes back out of the group minimum;
    # 2. the payload column rides a primitive-typed min_by(double, long) —
    #    both aggregates pick the same row because ord_key is unique.
    # Deterministic and identical to the ROW_NUMBER oracle. Same idiom as
    # operators/status.py:_latest_batches.
    ord_key = prio.cast("long") * F.lit(10_000_000_000_000) + F.col("o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(ord_key).alias("_ord"),
            F.min_by("o_totalprice", ord_key).alias("o_totalprice"),
        )
        .select(
            "o_custkey",
            (F.col("_ord") % 10_000_000_000_000).alias("o_orderkey"),
            "o_totalprice",
        )
    )


@register(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""",
    doc="J3-complement NOT EXISTS → left-anti join (customers without open orders)",
)
def q_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_pivot",
    """SELECT o_orderpriority,
              CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS F,
              CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS O,
              CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS P
       FROM orders GROUP BY o_orderpriority""",
    doc="A6 [EXT] pivot (status columns per priority) as single-pass "
    "conditional aggregation — one map-side-combined agg; DataFrame.pivot() "
    "measured 2x slower here (two-phase agg) for a fixed 3-value column set",
)
def q_pivot(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.sum(
                    F.when(F.col("o_orderstatus") == s, 1).otherwise(0)
                )
                .cast("long")
                .alias(s)
                for s in ["F", "O", "P"]
            ]
        )
    )


@register(
    "q_regex_pack",
    """SELECT doc_id,
              regexp_extract(text, '[a-z]+') AS first_word,
              regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head,
              len(regexp_extract_all(text, 'spark')) AS spark_mentions,
              regexp_matches(text, '^the ') AS starts_the
       FROM (SELECT doc_id, substr(text, 1, 40) AS text FROM documents)""",
    doc="F2-extended regex functions: extract, global replace, count, match",
)
def q_regex_pack(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 40).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_head"),
        F.regexp_count("text", F.lit("spark")).cast("long").alias("spark_mentions"),
        F.col("text").rlike("^the ").alias("starts_the"),
    )


@register(
    "q_null_funcs",
    """SELECT c_custkey,
              NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
              COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_coalesced,
              GREATEST(c_custkey % 7, c_custkey % 5, 3) AS g,
              LEAST(c_custkey % 7, c_custkey % 5, 3) AS l,
              c_acctbal IS NULL AS bal_missing,
              IFNULL(NULLIF(c_nationkey, 0), -1) AS nation_or_neg
       FROM customer""",
    doc="F4-extended null handling: nullif/coalesce/greatest/least/ifnull",
)
def q_null_funcs(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg_or_null"),
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("suppressed")
        ).alias("seg_coalesced"),
        F.greatest(F.col("c_custkey") % 7, F.col("c_custkey") % 5, F.lit(3)).alias("g"),
        F.least(F.col("c_custkey") % 7, F.col("c_custkey") % 5, F.lit(3)).alias("l"),
        F.col("c_acctbal").isNull().alias("bal_missing"),
        F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_or_neg"
        ),
    )


@register(
    "q_having",
    """SELECT o_custkey, COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12""",
    doc="TPC-H Q18-shaped GROUP BY + HAVING (post-aggregation filter)",
)
def q_having(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").try_cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "q_hopping_window",
    """WITH e2 AS (
  SELECT event_type, value,
         unnest([
           make_timestamp(CAST(floor(epoch(ts) / 900) * 900 * 1000000 AS BIGINT)),
           make_timestamp(CAST((floor(epoch(ts) / 900) - 1) * 900 * 1000000 AS BIGINT))
         ]) AS ws
  FROM events)
SELECT ws, event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM e2 GROUP BY 1, 2""",
    doc="T12 [EXT] hopping/sliding event-time window (30 min wide, 15 min "
    "slide): each event lands in exactly width/slide = 2 windows — the "
    "batch form of streaming window(ts, '30 minutes', '15 minutes'); "
    "oracle materializes both candidate window starts per event",
)
def q_hopping_window(spark, sf_dir):
    e = events_df(spark, sf_dir)
    return (
        e.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").try_cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "total")
    )
