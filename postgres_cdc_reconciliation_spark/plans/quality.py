"""[EXT] Driver-facing queries for the data-quality tier
(`operators/quality.py`) plus the SQ8 ANN variant
(`operators/similarity.py::sq_topk`).

The reference has no explicit QA surface (verify_replication.py trusts its
inputs); these are the LLM-pipeline-brief operators a 100 TB corpus needs
before training ever starts: constraint verification, re-identification
risk, distribution drift, and the 8x-compressed vector scan.

Determinism notes (registry conventions):
- every certificate metric is a ratio of two exact BIGINT counts surfaced
  as DOUBLE via one IEEE division — bit-identical in both engines;
- PSI bucketing is ONE double formula (floor((x-lo)/((hi-lo)/n)) with edge
  clamps) written identically in Spark and DuckDB; contributions round to
  6 dp before the verdict-free report leaves the plan (ln differs across
  libm implementations only in the last ulp — measured contribution margin
  to the 6 dp boundary is >= 2.6e-9 at sf0.01 / 9.3e-8 at sf0.1 in value
  units, ~1e9x the ulp gap of an O(1e-2) contribution);
- SQ8 quantization is round/clamp/scale in exact double arithmetic; scores
  follow the q_ann_cosine precedent (sequential-fold dot product vs
  DuckDB list_dot_product, 4 dp rounding, neighbor_id tie-break).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@register(
    "q_data_quality",
    """WITH fk AS (
  SELECT CAST(count(o.hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS metric
  FROM (SELECT l_orderkey AS v FROM lineitem WHERE l_orderkey IS NOT NULL) l
  LEFT JOIN (SELECT DISTINCT o_orderkey AS v, 1 AS hit FROM orders
             WHERE o_orderkey IS NOT NULL) o USING (v)
), fd AS (
  SELECT CAST(count(CASE WHEN nd <= 1 THEN 1 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS metric
  FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nd
        FROM lineitem GROUP BY l_orderkey)
), base AS (
  SELECT 'not_null' AS "constraint", 'l_orderkey' AS "column",
         CAST(count(l_orderkey) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS metric,
         1.0 AS threshold
  FROM lineitem
  UNION ALL
  SELECT 'unique', 'l_orderkey',
         CAST(count(DISTINCT l_orderkey) AS DOUBLE)
           / CAST(count(l_orderkey) AS DOUBLE), 1.0
  FROM lineitem
  UNION ALL
  SELECT 'between', 'l_discount',
         CAST(count(CASE WHEN l_discount BETWEEN CAST(0.0 AS DOUBLE)
                          AND CAST(0.1 AS DOUBLE) THEN 1 END) AS DOUBLE)
           / CAST(count(l_discount) AS DOUBLE), 1.0
  FROM lineitem
  UNION ALL
  SELECT 'in_set', 'l_returnflag',
         CAST(count(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 END)
              AS DOUBLE) / CAST(count(l_returnflag) AS DOUBLE), 1.0
  FROM lineitem
  UNION ALL
  SELECT 'matches', 'l_linestatus',
         CAST(count(CASE WHEN l_linestatus IS NOT NULL
                          AND regexp_matches(l_linestatus, '^[OF]$')
                         THEN 1 END) AS DOUBLE)
           / CAST(count(l_linestatus) AS DOUBLE), 1.0
  FROM lineitem
  UNION ALL
  SELECT 'min_rows', '*', CAST(count(*) AS DOUBLE), 1000.0 FROM lineitem
  UNION ALL
  SELECT 'foreign_key', 'l_orderkey->orders.o_orderkey', metric, 1.0 FROM fk
  UNION ALL
  SELECT 'functional_dependency', 'l_orderkey->l_suppkey', metric, 1.0 FROM fd
)
SELECT "constraint", "column", metric, threshold,
       coalesce(metric >= threshold, TRUE) AS passed
FROM base""",
    doc="[EXT] Deequ-style data-quality constraint suite "
    "(operators/quality.py::check_constraints): completeness, exact "
    "uniqueness, range/set/regex conformance, row-count floor, referential "
    "integrity into orders, and a functional-dependency check — one "
    "certificate row per constraint. Plan shape: ALL six row-local "
    "constraints share ONE aggregate scan of lineitem (map-side partials, "
    "single-row reduce); the FK adds one broadcast left join, the FD one "
    "grouped distinct-count. The suite deliberately includes FAILING "
    "constraints (l_orderkey is not unique; ~4-21%% of orders multi-source "
    "their suppliers) so the verdict column is non-vacuous. Every metric "
    "is an exact-BIGINT ratio -> one IEEE division.",
)
def q_data_quality(spark, sf_dir):
    from ..operators.quality import check_constraints

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return check_constraints(
        li,
        [
            {"kind": "not_null", "col": "l_orderkey"},
            {"kind": "unique", "col": "l_orderkey"},
            {"kind": "between", "col": "l_discount", "lo": 0.0, "hi": 0.1},
            {"kind": "in_set", "col": "l_returnflag", "values": ["A", "N", "R"]},
            {"kind": "matches", "col": "l_linestatus", "pattern": "^[OF]$"},
            {"kind": "min_rows", "n": 1000},
            {
                "kind": "foreign_key",
                "col": "l_orderkey",
                "ref": "orders",
                "ref_col": "o_orderkey",
            },
            {
                "kind": "functional_dependency",
                "det": ["l_orderkey"],
                "dep": "l_suppkey",
            },
        ],
        refs={"orders": orders},
    )


@register(
    "q_k_anonymity",
    """WITH cls AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(n) AS BIGINT) AS min_class_size,
       CAST(count(CASE WHEN n < 10 THEN 1 END) AS BIGINT) AS classes_below_k,
       CAST(coalesce(sum(CASE WHEN n < 10 THEN n END), 0) AS BIGINT)
         AS rows_below_k,
       CAST(coalesce(sum(CASE WHEN n < 10 THEN n END), 0) AS DOUBLE)
         / CAST(coalesce(sum(n), 0) AS DOUBLE) AS risk_share,
       CAST(10 AS BIGINT) AS k,
       coalesce(sum(CASE WHEN n < 10 THEN n END), 0) = 0 AS is_k_anonymous
FROM cls""",
    doc="[EXT] k-anonymity re-identification risk "
    "(operators/quality.py::k_anonymity_report): class sizes over the "
    "quasi-identifier (c_nationkey, c_mktsegment), rows/classes below "
    "k=10, and the release verdict — the privacy gate a human-derived "
    "corpus passes before publication; suppress_to_k is the matching "
    "remediation (pytest pins that its output re-certifies as "
    "k-anonymous). One keyed count shuffle + a single-row reduce; k=10 is "
    "non-vacuous at sf0.01 (both at-risk and safe classes exist). All "
    "counts BIGINT; risk_share one exact-integer IEEE division.",
)
def q_k_anonymity(spark, sf_dir):
    from ..operators.quality import k_anonymity_report

    c = _t(spark, sf_dir, "customer")
    return k_anonymity_report(c, ["c_nationkey", "c_mktsegment"], k=10)


@register(
    "q_drift_psi",
    """WITH s AS (
  SELECT min(CAST(o_totalprice AS DOUBLE)) AS lo,
         max(CAST(o_totalprice AS DOUBLE)) AS hi
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-07-01' AND o_totalprice IS NOT NULL
), rb AS (
  SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
              ELSE least(CAST(9 AS BIGINT), greatest(CAST(0 AS BIGINT),
                   CAST(floor((CAST(o_totalprice AS DOUBLE) - lo)
                        / ((hi - lo) / 10.0)) AS BIGINT))) END AS bucket,
         count(*) AS rn
  FROM orders, s
  WHERE o_orderdate < TIMESTAMP '1995-07-01' AND o_totalprice IS NOT NULL
    AND lo IS NOT NULL
  GROUP BY 1
), cb AS (
  SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
              ELSE least(CAST(9 AS BIGINT), greatest(CAST(0 AS BIGINT),
                   CAST(floor((CAST(o_totalprice AS DOUBLE) - lo)
                        / ((hi - lo) / 10.0)) AS BIGINT))) END AS bucket,
         count(*) AS cn
  FROM orders, s
  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_totalprice IS NOT NULL
    AND lo IS NOT NULL
  GROUP BY 1
), grid AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(10)),
j AS (
  SELECT g.bucket, coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
  FROM grid g LEFT JOIN rb USING (bucket) LEFT JOIN cb USING (bucket)
), sh AS (
  SELECT bucket,
         CAST(rn AS DOUBLE) / CAST(sum(rn) OVER () AS DOUBLE) AS ref_share,
         CAST(cn AS DOUBLE) / CAST(sum(cn) OVER () AS DOUBLE) AS cur_share
  FROM j
), con AS (
  SELECT bucket, ref_share, cur_share,
         round((cur_share - ref_share)
               * ln((CASE WHEN cur_share = 0 THEN 1e-6 ELSE cur_share END)
                    / (CASE WHEN ref_share = 0 THEN 1e-6 ELSE ref_share END)),
               6) AS psi_contrib
  FROM sh
)
SELECT bucket, ref_share, cur_share, psi_contrib,
       round(sum(psi_contrib) OVER (), 6) AS psi_total
FROM con ORDER BY bucket""",
    doc="[EXT] Population Stability Index drift report "
    "(operators/quality.py::psi_report): o_totalprice distribution of "
    "post-1995H2 orders vs the pre-1995H2 reference, 10 equi-width buckets "
    "anchored on the REFERENCE min/max (out-of-range current values clamp "
    "into edge buckets — the report stays comparable as data drifts). "
    "Shares are exact-integer ratios; contributions (cur-ref)*ln(cur/ref) "
    "with 1e-6 smoothing, rounded to 6 dp (measured margin to the rounding "
    "boundary >= 2.6e-9 at sf0.01 / 9.3e-8 at sf0.1 — ~1e9x the cross-libm "
    "ln ulp gap). "
    "Plan: one broadcast min/max, one keyed count per side, an n-bucket "
    "grid join — O(10) result rows at any corpus size.",
)
def q_drift_psi(spark, sf_dir):
    from ..operators.quality import psi_report

    o = _t(spark, sf_dir, "orders")
    cut = F.to_timestamp(F.lit("1995-07-01"))
    ref = o.where(F.col("o_orderdate") < cut)
    cur = o.where(F.col("o_orderdate") >= cut)
    return psi_report(cur, ref, "o_totalprice", n_buckets=10)


@register(
    "q_ann_sq",
    """WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), sc AS (
  SELECT d, max(abs(e[d + 1])) / 127.0 AS s
  FROM v, range(64) t(d) GROUP BY d
), scl AS (SELECT list(s ORDER BY d) AS sl FROM sc),
vq AS (
  SELECT vec_id,
         [CASE WHEN sl[i] = 0 THEN 0.0
               ELSE greatest(-127.0, least(127.0, round(e[i] / sl[i]))) * sl[i]
          END FOR i IN range(1, 65)] AS eq
  FROM v, scl
), vn AS (
  SELECT vec_id, eq, sqrt(list_dot_product(eq, eq)) AS n FROM vq
), q AS (SELECT * FROM vn WHERE vec_id < 16),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.eq, c.eq) / (q.n * c.n) AS cos
  FROM q JOIN vn c ON c.vec_id <> q.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= 5""",
    doc="[EXT] int8 scalar-quantization ANN (fourth tier after "
    "brute/IVF/PQ; operators/similarity.py::sq_scales/sq_topk): "
    "per-dimension max-abs/127 scales (one 64-cell aggregate), "
    "quantize-dequantize inline, brute cosine over the 8x-compressed "
    "representation — at 100 TB the scan reads int8 codes, not float32 "
    "vectors, and the scale list is the whole model. Exact-rerank variant "
    "(rerank>0) pytest-gated on recall vs exact top-k. Margins follow the "
    "ANN-family convention: 4 dp rounding (measured margin 5.8e-7 at "
    "sf0.01 / 1.1e-6 at sf0.1 in cosine units), rank-boundary gap >= "
    "7.7e-5, zero ties in the top-6 at both sfs; neighbor_id tie-break; "
    "quantization arithmetic (round/clamp/scale) is exact double math, "
    "identical in both engines.",
)
def q_ann_sq(spark, sf_dir):
    from ..operators.similarity import sq_scales, sq_topk

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scales = sq_scales(v)
    q = v.filter(F.col("vec_id") < 16)
    top = sq_topk(q, v, scales, k=5)
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cos", 4).alias("cos_r"),
    )


@register(
    "q_validate_rows",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus,
       coalesce(array_to_string(list_filter([
         CASE WHEN NOT (l_quantity IS NULL
                        OR l_quantity BETWEEN CAST(1 AS DOUBLE)
                                          AND CAST(25 AS DOUBLE))
              THEN 'between:l_quantity' END,
         CASE WHEN NOT (l_returnflag IS NULL OR l_returnflag IN ('N'))
              THEN 'in_set:l_returnflag' END,
         CASE WHEN NOT (l_linestatus IS NULL
                        OR regexp_matches(l_linestatus, '^O$'))
              THEN 'matches:l_linestatus' END
       ], x -> x IS NOT NULL), ','), '') AS violations,
       (CASE WHEN NOT (l_quantity IS NULL
                       OR l_quantity BETWEEN CAST(1 AS DOUBLE)
                                         AND CAST(25 AS DOUBLE))
             THEN 1 ELSE 0 END
        + CASE WHEN NOT (l_returnflag IS NULL OR l_returnflag IN ('N'))
               THEN 1 ELSE 0 END
        + CASE WHEN NOT (l_linestatus IS NULL
                         OR regexp_matches(l_linestatus, '^O$'))
               THEN 1 ELSE 0 END) = 0 AS is_valid
FROM lineitem WHERE l_orderkey < 2000""",
    doc="[EXT] row-level constraint validation "
    "(operators/quality.py::validate_rows/quarantine_split): per-row "
    "violation labels in suite order plus the routing verdict — WHICH rows "
    "are bad, not just how many (the quarantine split the reference's "
    "all-or-nothing batch FAILED flag can't do, ingest.py:98 analog). "
    "Map-only whole-stage-codegen expressions, zero shuffle; violations "
    "surfaced as a joined string per the array-hashing convention. The "
    "suite is deliberately violation-rich on clean data (quantity cap 25, "
    "returnflag N-only, linestatus O-only) so routing is non-vacuous.",
)
def q_validate_rows(spark, sf_dir):
    from ..operators.quality import validate_rows

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    v = validate_rows(
        li,
        [
            {"kind": "between", "col": "l_quantity", "lo": 1, "hi": 25},
            {"kind": "in_set", "col": "l_returnflag", "values": ["N"]},
            {"kind": "matches", "col": "l_linestatus", "pattern": "^O$"},
        ],
    )
    return v.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
        "l_linestatus",
        F.array_join("violations", ",").alias("violations"),
        "is_valid",
    )


@register(
    "q_prefilter_join",
    """SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN (SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderpriority = '1-URGENT') o
  ON l.l_orderkey = o.o_orderkey
GROUP BY l_returnflag""",
    doc="[EXT] runtime-filter join "
    "(operators/layout.py::prefilter_join, mode=coarse): the big side "
    "(lineitem) is pruned BEFORE its shuffle by 2 xxhash64 bucket sets "
    "(2^19 buckets each — sized >= 16x the urgent-key NDV so occupancy "
    "stays low; saturation would degrade to no-pruning, never to wrong "
    "results) "
    "built from the urgent-orders key set — a bloom filter expressed as "
    "pure codegen expressions (xxhash64 + pmod + broadcast semi-joins), "
    "the explicit form of Spark's AQE runtime bloom injection. Lossless "
    "by construction (both filters pass a key SUPERSET; the exact join "
    "removes false positives), so the oracle is the PLAIN join — "
    "strategy never changes results. Revenue in DECIMAL, surfaced as "
    "DOUBLE at the end (exactness convention).",
)
def q_prefilter_join(spark, sf_dir):
    from ..operators.layout import prefilter_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    j = prefilter_join(
        li, urgent, "l_orderkey", how="inner", mode="coarse",
        n_buckets=1 << 19, n_hashes=2,
    )
    # try_cast: the numeric-dirt sweep plants 1e300-magnitude prices that
    # overflow DECIMAL(18,2) under ANSI; clean driver data is unaffected
    rev = F.sum(
        F.expr("try_cast(l_extendedprice as decimal(18,2))")
        * (F.lit(1).cast("decimal(18,2)") - F.expr("try_cast(l_discount as decimal(18,2))"))
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        rev.cast("double").alias("revenue"),
    )


@register(
    "q_drift_categorical",
    """WITH r AS (
  SELECT o_orderpriority AS v FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-07-01' AND o_orderpriority IS NOT NULL
), c AS (
  SELECT o_orderpriority AS v FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderpriority IS NOT NULL
), top AS (
  SELECT v AS category FROM (
    SELECT v, row_number() OVER (ORDER BY count(*) DESC, v) AS rk
    FROM r GROUP BY v)
  WHERE rk < 4
), rl AS (
  SELECT coalesce(t.category, '__other__') AS category
  FROM r LEFT JOIN top t ON r.v = t.category
), cl AS (
  SELECT coalesce(t.category, '__other__') AS category
  FROM c LEFT JOIN top t ON c.v = t.category
), grid AS (
  SELECT category FROM top UNION ALL SELECT '__other__'
), rc AS (SELECT category, count(*) AS rn FROM rl GROUP BY 1),
cc AS (SELECT category, count(*) AS cn FROM cl GROUP BY 1),
j AS (
  SELECT g.category, coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
  FROM grid g LEFT JOIN rc USING (category) LEFT JOIN cc USING (category)
), sh AS (
  SELECT category,
         CAST(rn AS DOUBLE) / CAST(sum(rn) OVER () AS DOUBLE) AS ref_share,
         CAST(cn AS DOUBLE) / CAST(sum(cn) OVER () AS DOUBLE) AS cur_share
  FROM j
), con AS (
  SELECT category, ref_share, cur_share,
         round((cur_share - ref_share)
               * ln((CASE WHEN cur_share = 0 THEN 1e-6 ELSE cur_share END)
                    / (CASE WHEN ref_share = 0 THEN 1e-6 ELSE ref_share END)),
               6) AS psi_contrib
  FROM sh
)
SELECT category, ref_share, cur_share, psi_contrib,
       round(sum(psi_contrib) OVER (), 6) AS psi_total
FROM con ORDER BY category""",
    doc="[EXT] categorical drift report "
    "(operators/quality.py::categorical_drift): PSI over o_orderpriority "
    "with the category set anchored on the REFERENCE top-3 (ties broken "
    "by value — deterministic), everything else pooled into __other__ "
    "(where a brand-new category surfacing only in current data lands — "
    "the classic drift signal). max_categories=4 is non-vacuous: 5 "
    "priorities exist, so the pool holds 2. Same exact-integer shares + "
    "eps-smoothed ln contributions + 6 dp rounding as q_drift_psi; one "
    "keyed count per side, an O(max_categories) result.",
)
def q_drift_categorical(spark, sf_dir):
    from ..operators.quality import categorical_drift

    o = _t(spark, sf_dir, "orders")
    cut = F.to_timestamp(F.lit("1995-07-01"))
    ref = o.where(F.col("o_orderdate") < cut).select(
        F.col("o_orderpriority")
    )
    cur = o.where(F.col("o_orderdate") >= cut).select(
        F.col("o_orderpriority")
    )
    return categorical_drift(cur, ref, "o_orderpriority", max_categories=4)


@register(
    "q_k_suppress",
    """SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
FROM customer c
JOIN (SELECT c_nationkey, c_mktsegment
      FROM customer GROUP BY c_nationkey, c_mktsegment
      HAVING count(*) >= 10) s
  ON c.c_nationkey = s.c_nationkey AND c.c_mktsegment = s.c_mktsegment""",
    doc="[EXT] k-anonymity suppression output "
    "(operators/quality.py::suppress_to_k): the rows that SURVIVE "
    "suppression at k=10 over (c_nationkey, c_mktsegment) — the "
    "releasable table itself, not just the certificate (q_k_anonymity "
    "reports the risk; this is the remediation, k-anonymous by "
    "construction since every surviving class kept all its rows). One "
    "keyed count + one keyed join back sharing the exchange; original "
    "schema preserved.",
)
def q_k_suppress(spark, sf_dir):
    from ..operators.quality import suppress_to_k

    c = _t(spark, sf_dir, "customer")
    return suppress_to_k(c, ["c_nationkey", "c_mktsegment"], k=10)
