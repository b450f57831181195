"""Round-6 staging area: finished queries awaiting driver-window slots.

The driver's correctness window is a hard 50 per round and round 5 fills
it exactly (see NOTES_r5 "Round-6 queue"), so these specs are NOT
registered yet — registering them would either bury r2-stale rows
(breaking the staleness invariant tests/test_registry_rotation.py pins)
or land never-checked. They are complete Spark+oracle pairs, proven by
the same engine-vs-DuckDB compare the driver runs
(tests/test_staged_r6.py); round 6 promotes them by moving each
(oracle, fn) into a @register call and fronting `_CHECK_PRIORITY`.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# q_interval_overlap — chunk-binned interval x interval overlap join
# (operators/temporal.py::interval_overlap_join). Oracle: the direct theta
# join — equivalence is exact for ANY chunk size, so chunk/timezone
# alignment never matters to the compare.
# --------------------------------------------------------------------------

INTERVAL_OVERLAP_ORACLE = """WITH l AS (
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
  AND l_start <= r_end AND r_start <= l_end"""


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


# --------------------------------------------------------------------------
# q_profile_diff — column drift localization on the seeded recon pair
# (operators/recon.py::profile_diff, exact mode). Oracle: one aggregate
# row per column, UNIONed.
# --------------------------------------------------------------------------


def _profile_side_sql(rel: str, prefix: str) -> str:
    cols = {"order_id": "order_id", "amount": "amount", "status": "status"}
    parts = []
    for c in cols:
        parts.append(
            f"""SELECT '{c}' AS "column",
       CAST(count(*) AS BIGINT) AS {prefix}_n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS {prefix}_n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS {prefix}_n_distinct,
       CAST(min({c}) AS VARCHAR) AS {prefix}_min_str,
       CAST(max({c}) AS VARCHAR) AS {prefix}_max_str
FROM {rel}"""
        )
    return "\nUNION ALL\n".join(parts)


PROFILE_DIFF_ORACLE_TEMPLATE = """WITH {recon_cte},
sp AS ({src_side}),
tp AS ({tgt_side})
SELECT sp."column",
       sp.src_n_rows, tp.tgt_n_rows,
       sp.src_n_nulls, tp.tgt_n_nulls,
       sp.src_n_distinct, tp.tgt_n_distinct,
       sp.src_min_str, tp.tgt_min_str,
       sp.src_max_str, tp.tgt_max_str,
       sp.src_n_rows = tp.tgt_n_rows
         AND sp.src_n_nulls = tp.tgt_n_nulls
         AND sp.src_n_distinct = tp.tgt_n_distinct
         AND sp.src_min_str IS NOT DISTINCT FROM tp.tgt_min_str
         AND sp.src_max_str IS NOT DISTINCT FROM tp.tgt_max_str
         AS column_match
FROM sp JOIN tp USING ("column")"""


def profile_diff_oracle() -> str:
    from .. import fixtures as fx

    return PROFILE_DIFF_ORACLE_TEMPLATE.format(
        recon_cte=fx.oracle_recon_cte(),
        src_side=_profile_side_sql("recon_src", "src"),
        tgt_side=_profile_side_sql("recon_tgt", "tgt"),
    )


def q_profile_diff(spark, sf_dir):
    from .. import fixtures as fx
    from ..operators.recon import profile_diff

    src, tgt = fx.recon_pair(spark, sf_dir)
    return profile_diff(src, tgt)


# --------------------------------------------------------------------------
# q_series_similarity — Pearson top-k over per-user daily event-value
# series vs user 7's series (operators/timeseries.py). Sufficient
# statistics in DECIMAL (exact cross-engine), r from those exact sums in
# double, rounded 6dp BEFORE the top-10 cut.
# --------------------------------------------------------------------------

SERIES_SIMILARITY_ORACLE = """WITH s AS (
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
ORDER BY corr_r DESC, user_id LIMIT 10"""


def q_series_similarity(spark, sf_dir):
    from .. import fixtures as fx
    from ..operators.timeseries import series_similarity_topk

    ev = fx.events_df(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("value")
    )
    return series_similarity_topk(daily, query_key=7, k=10)


#: name -> (fn, oracle_sql) — promote into @register in round 6
STAGED: dict = {
    "q_interval_overlap": (q_interval_overlap, INTERVAL_OVERLAP_ORACLE),
    "q_profile_diff": (q_profile_diff, None),  # oracle built lazily below
    "q_series_similarity": (q_series_similarity, SERIES_SIMILARITY_ORACLE),
}


def staged_oracles() -> dict:
    out = {n: o for n, (f, o) in STAGED.items() if o}
    out["q_profile_diff"] = profile_diff_oracle()
    return out
