"""Data-quality verification operators: constraint suites, re-identification
risk, and distribution drift.

The reference pipeline's QA surface is implicit — `verify_replication.py`
trusts its inputs and the plpgsql monitors only check replication plumbing
(reference: tools/verify_replication.py:1, sql/notify_monitor.sql:1). A
100 TB training-data pipeline cannot: a silently-null join key or a drifted
feature distribution poisons every downstream consumer. These operators make
the checks first-class, Deequ-style (the published "unit tests for data"
design), but expressed as plain DataFrame plans:

- ``check_constraints``: a constraint SUITE verified in as few passes as the
  constraint mix allows — every row-local constraint (completeness, ranges,
  set membership, regex, uniqueness) folds into ONE aggregate over the table
  (one scan, one reduce to a single row, map-side partial aggregation);
  referential-integrity and functional-dependency constraints each add the
  one keyed pass they mathematically require (a broadcast-able semi-join /
  one grouped distinct-count). Output is a certificate: one row per
  constraint with the observed metric, the threshold, and the verdict.
- ``k_anonymity_report`` / ``suppress_to_k``: quasi-identifier
  re-identification risk (class sizes under k) and the suppression that
  restores k-anonymity — the release gate for any human-derived corpus.
- ``psi_report``: Population Stability Index between a reference and a
  current sample over equi-width buckets anchored on the REFERENCE min/max —
  the standard train/serve drift metric. Deterministic bucketing (one
  formula, exact double arithmetic on both engines) so the whole report is
  cross-engine reproducible.

Scale shape: every metric is an aggregate — the certificates are O(1) rows
regardless of table size; nothing collects, nothing loops on the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frac(num, den):
    """Exact-integer ratio surfaced as DOUBLE: both sides cast from BIGINT,
    one IEEE division — bit-identical in any engine. NULL when den = 0
    (vacuously-true constraints coalesce the verdict, not the metric)."""
    return F.try_divide(num.cast("double"), den.cast("double"))


_ROW_LOCAL_KINDS = ("not_null", "unique", "between", "in_set", "matches", "min_rows")


def check_constraints(
    df: DataFrame,
    constraints: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Verify a constraint suite; return a certificate DataFrame.

    Each constraint is a dict with a ``kind``:

    - ``{"kind": "not_null", "col": c}`` — completeness: fraction of rows
      with c IS NOT NULL.
    - ``{"kind": "unique", "col": c}`` — distinctness: exact
      count(DISTINCT c) / count(c) over non-null values.
    - ``{"kind": "between", "col": c, "lo": x, "hi": y}`` — fraction of
      non-null values in [lo, hi].
    - ``{"kind": "in_set", "col": c, "values": [...]}`` — fraction of
      non-null values in the allowed set.
    - ``{"kind": "matches", "col": c, "pattern": rx}`` — fraction of
      non-null values matching the (RE2-compatible) regexp.
    - ``{"kind": "min_rows", "n": N}`` — table row count >= N.
    - ``{"kind": "foreign_key", "col": c, "ref": name, "ref_col": rc}`` —
      fraction of non-null c values present in refs[name][rc].
    - ``{"kind": "functional_dependency", "det": [cols], "dep": c}`` —
      fraction of determinant groups with exactly one distinct dep value.

    Fraction constraints take an optional ``"threshold"`` (default 1.0);
    ``passed`` is metric >= threshold, vacuously TRUE on empty input (no
    rows violate). Certificate schema: constraint, column, metric DOUBLE,
    threshold DOUBLE, passed BOOLEAN.

    Plan shape: all row-local constraints share ONE aggregate over df (the
    single-scan trick is the point — a 40-constraint suite over 100 TB costs
    one read, not forty). ``unique`` contributes an exact count(DISTINCT)
    (Catalyst plans the distinct-expand; approximate NDV belongs to the
    sketch tier, a VERIFIER must be exact). foreign_key adds one
    broadcast-able left join per constraint; functional_dependency one
    grouped distinct-count pass.
    """
    refs = refs or {}
    agg_exprs = []  # shared single-pass aggregate cells
    rows = []  # (constraint, column, metric_cell, threshold) in cell order
    n_all = F.count(F.lit(1))

    def _cell(expr, label):
        agg_exprs.append(expr.alias(label))
        return label

    for i, c in enumerate(constraints):
        kind = c["kind"]
        thr = float(c.get("threshold", 1.0))
        lbl = f"_m{i}"
        if kind == "not_null":
            col = c["col"]
            rows.append((kind, col, _cell(_frac(F.count(col), n_all), lbl), thr))
        elif kind == "unique":
            col = c["col"]
            rows.append(
                (kind, col, _cell(_frac(F.countDistinct(col), F.count(col)), lbl), thr)
            )
        elif kind == "between":
            col, lo, hi = c["col"], c["lo"], c["hi"]
            ok = F.count(
                F.when(F.col(col).between(F.lit(lo), F.lit(hi)), F.lit(1))
            )
            rows.append((kind, col, _cell(_frac(ok, F.count(col)), lbl), thr))
        elif kind == "in_set":
            col = c["col"]
            ok = F.count(F.when(F.col(col).isin(list(c["values"])), F.lit(1)))
            rows.append((kind, col, _cell(_frac(ok, F.count(col)), lbl), thr))
        elif kind == "matches":
            col = c["col"]
            ok = F.count(
                F.when(
                    F.col(col).isNotNull()
                    & F.col(col).rlike(c["pattern"]),
                    F.lit(1),
                )
            )
            rows.append((kind, col, _cell(_frac(ok, F.count(col)), lbl), thr))
        elif kind == "min_rows":
            rows.append(
                (kind, "*", _cell(n_all.cast("double"), lbl), float(c["n"]))
            )
        elif kind in ("foreign_key", "functional_dependency"):
            rows.append((kind, None, None, thr))  # handled below, keeps order
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")

    parts: list[DataFrame] = []
    if agg_exprs:
        one = df.agg(*agg_exprs)
        single = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(kind).alias("constraint"),
                            F.lit(col).alias("column"),
                            F.col(lbl).alias("metric"),
                            F.lit(thr).alias("threshold"),
                        )
                        for (kind, col, lbl, thr) in rows
                        if lbl is not None
                    ]
                )
            ).alias("c")
        ).select("c.*")
        parts.append(single)

    for c in constraints:
        kind = c["kind"]
        thr = float(c.get("threshold", 1.0))
        if kind == "foreign_key":
            col, rc = c["col"], c["ref_col"]
            ref = refs[c["ref"]]
            vals = df.where(F.col(col).isNotNull()).select(F.col(col).alias("_v"))
            refd = (
                ref.select(F.col(rc).alias("_v"))
                .where(F.col("_v").isNotNull())
                .distinct()
                .withColumn("_hit", F.lit(1))
            )
            # dimension-shaped ref → broadcast; a huge ref falls back to a
            # shuffled hash join under AQE, the semantics don't change
            j = vals.join(F.broadcast(refd), "_v", "left")
            parts.append(
                j.agg(
                    F.lit(kind).alias("constraint"),
                    F.lit(f"{col}->{c['ref']}.{rc}").alias("column"),
                    _frac(F.count("_hit"), F.count(F.lit(1))).alias("metric"),
                    F.lit(thr).alias("threshold"),
                )
            )
        elif kind == "functional_dependency":
            det, dep = list(c["det"]), c["dep"]
            g = df.groupBy(*det).agg(F.countDistinct(dep).alias("_nd"))
            parts.append(
                g.agg(
                    F.lit(kind).alias("constraint"),
                    F.lit(",".join(det) + "->" + dep).alias("column"),
                    _frac(
                        F.count(F.when(F.col("_nd") <= 1, F.lit(1))),
                        F.count(F.lit(1)),
                    ).alias("metric"),
                    F.lit(thr).alias("threshold"),
                )
            )

    if not parts:
        raise ValueError("empty constraint suite")
    cert = reduce(lambda a, b: a.unionByName(b), parts)
    return cert.select(
        "constraint",
        "column",
        "metric",
        "threshold",
        # vacuous truth: no rows -> no violations (metric NULL, not 0)
        F.coalesce(F.col("metric") >= F.col("threshold"), F.lit(True)).alias(
            "passed"
        ),
    )


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier re-identification risk: one-row certificate.

    A row is k-anonymous iff at least k rows share its full quasi-identifier
    combination (the published k-anonymity model). Columns: n_rows,
    n_classes, min_class_size, classes_below_k, rows_below_k (all BIGINT),
    risk_share DOUBLE (rows_below_k / n_rows), k BIGINT, is_k_anonymous
    BOOLEAN. Empty input: zero rows at risk -> vacuously anonymous.

    One keyed count shuffle (map-side partials) + one reduce to a single
    row; class cardinality never touches the driver.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cls = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("_n"))
    below = F.col("_n") < k
    return cls.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class_size"),
        F.count(F.when(below, F.lit(1))).cast("long").alias("classes_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("_n"))), F.lit(0))
        .cast("long")
        .alias("rows_below_k"),
    ).select(
        "*",
        _frac(F.col("rows_below_k"), F.col("n_rows")).alias("risk_share"),
        F.lit(int(k)).cast("long").alias("k"),
        (F.col("rows_below_k") == 0).alias("is_k_anonymous"),
    )


def suppress_to_k(df: DataFrame, qi_cols: list[str], k: int = 5) -> DataFrame:
    """Suppression to k-anonymity: drop every row whose quasi-identifier
    class has fewer than k members. The surviving table is k-anonymous by
    construction (each remaining class kept ALL its rows, so sizes are
    unchanged and >= k — re-checkable via ``k_anonymity_report``).

    One keyed count + one keyed join back (both on the same key, so the
    exchange is reused); row order and schema are preserved. The join is
    null-safe per QI column: ``k_anonymity_report`` counts the NULL class
    like any other (groupBy groups NULLs together), so a NULL-QI class with
    >= k members survives here too — a plain equi join would drop every
    NULL-QI row and contradict the report's is_k_anonymous verdict.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # keep derives from df (self-join): aliased qualified names keep the
    # join condition unambiguous
    left = df.alias("_sk_l")
    keep = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= k)
        .alias("_sk_r")
    )
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"_sk_l.{c}").eqNullSafe(F.col(f"_sk_r.{c}"))
            for c in qi_cols
        ],
    )
    return left.join(keep, cond, "inner").select(
        *[F.col(f"_sk_l.{c}") for c in df.columns]
    )


def psi_report(
    cur: DataFrame,
    ref: DataFrame,
    col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index drift report between ``ref`` (training /
    yesterday) and ``cur`` (serving / today) on a numeric column.

    Buckets are equi-width over the REFERENCE min/max — anchoring on ref
    makes the report stable as cur drifts (new out-of-range values clamp
    into the edge buckets instead of silently re-binning everything). The
    bucket formula is one exact double expression evaluated identically in
    any engine::

        bucket = hi == lo ? 0
               : least(n-1, greatest(0, floor((x - lo) / ((hi - lo) / n))))

    Per bucket: ref_share, cur_share (exact-integer ratios), and
    psi_contrib = (cur_share - ref_share) * ln(cur_share' / ref_share')
    with zero shares eps-substituted (the standard smoothing — PSI is
    undefined at 0), rounded to 6 dp; psi_total repeats the rounded-contrib
    sum on every row. Rule of thumb: < 0.1 stable, 0.1-0.25 moderate,
    > 0.25 action. NULLs are excluded from both sides.

    Plan shape: one tiny ref min/max aggregate broadcast into both sides,
    one keyed count per side, a join on the n-row bucket grid — the report
    is O(n_buckets) rows whatever the table size.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    stats = psi_ref_stats(ref, col)
    rb = psi_bucket_counts(ref, stats, col, n_buckets).withColumnRenamed(
        "_n", "_rn"
    )
    cb = psi_bucket_counts(cur, stats, col, n_buckets).withColumnRenamed(
        "_n", "_cn"
    )
    return psi_from_counts(cur.sparkSession, rb, cb, n_buckets, eps)


def psi_ref_stats(ref: DataFrame, col: str) -> DataFrame:
    """Single-row (_lo, _hi) reference anchor for PSI bucketing."""
    return ref.where(F.col(col).isNotNull()).agg(
        F.min(F.col(col).cast("double")).alias("_lo"),
        F.max(F.col(col).cast("double")).alias("_hi"),
    )


def psi_bucket_counts(
    df: DataFrame, stats: DataFrame, col: str, n_buckets: int
) -> DataFrame:
    """(bucket, _n) counts under the PSI bucket formula — ADDITIVE (two
    samples' counts merge by cell-wise sum against the same anchor), which
    is what the streaming drift monitor accumulates per micro-batch."""
    x = F.col(col).cast("double")
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
    b = F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(n_buckets - 1).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((x - F.col("_lo")) / width),
            ),
        )
    )
    return (
        df.where(F.col(col).isNotNull())
        .crossJoin(F.broadcast(stats))
        # an empty reference has no min/max: every bucket is NULL and
        # the count below is zero — shares then divide by zero -> the
        # loud-NULL metric, never a crash
        .where(F.col("_lo").isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def psi_from_counts(
    spark,
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    n_buckets: int,
    eps: float = 1e-6,
) -> DataFrame:
    """The PSI report derived from (bucket, _rn) / (bucket, _cn) counts —
    the O(n_buckets)-row tail of psi_report, shared with the streaming
    monitor so both paths compute bit-identical contributions."""
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    j = (
        grid.join(ref_counts, "bucket", "left")
        .join(cur_counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_rn", F.lit(0)).alias("_rn"),
            F.coalesce("_cn", F.lit(0)).alias("_cn"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # n_buckets rows only — never a wide window
    rs = _frac(F.col("_rn"), F.sum("_rn").over(w))
    cs = _frac(F.col("_cn"), F.sum("_cn").over(w))
    j = j.select(
        "bucket",
        rs.alias("ref_share"),
        cs.alias("cur_share"),
    )
    r_ = F.when(F.col("ref_share") == 0, F.lit(float(eps))).otherwise(
        F.col("ref_share")
    )
    c_ = F.when(F.col("cur_share") == 0, F.lit(float(eps))).otherwise(
        F.col("cur_share")
    )
    j = j.select(
        "bucket",
        "ref_share",
        "cur_share",
        F.round(
            (F.col("cur_share") - F.col("ref_share")) * F.log(c_ / r_), 6
        ).alias("psi_contrib"),
    )
    return j.select(
        "*", F.round(F.sum("psi_contrib").over(w), 6).alias("psi_total")
    ).orderBy("bucket")


def constraint_counters(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """ADDITIVE counter form of the row-local constraint metrics: one row
    per constraint with (cid, constraint, column, num, den, threshold)
    where metric = num/den (min_rows: metric = num). Counters are plain
    sums, so two corpora's counter tables merge by cell-wise addition —
    the property the STREAMING verifier (streaming/quality.py) builds on,
    and the reason the non-additive kinds (unique, foreign_key,
    functional_dependency) are rejected here: their metrics need either
    unbounded state or another pass (batch ``check_constraints`` handles
    them; approximate streaming distinctness belongs to the KMV sketch
    stream). Same single-scan shape as check_constraints."""
    agg_exprs = []
    meta = []
    n_all = F.count(F.lit(1))
    for i, c in enumerate(constraints):
        kind = c["kind"]
        thr = float(c.get("threshold", 1.0))
        if kind == "not_null":
            col = c["col"]
            num, den = F.count(col), n_all
        elif kind == "between":
            col = c["col"]
            num = F.count(
                F.when(
                    F.col(col).between(F.lit(c["lo"]), F.lit(c["hi"])), F.lit(1)
                )
            )
            den = F.count(col)
        elif kind == "in_set":
            col = c["col"]
            num = F.count(F.when(F.col(col).isin(list(c["values"])), F.lit(1)))
            den = F.count(col)
        elif kind == "matches":
            col = c["col"]
            num = F.count(
                F.when(
                    F.col(col).isNotNull() & F.col(col).rlike(c["pattern"]),
                    F.lit(1),
                )
            )
            den = F.count(col)
        elif kind == "min_rows":
            col, num, den = "*", n_all, F.lit(None).cast("long")
            thr = float(c["n"])
        else:
            raise ValueError(
                f"constraint kind {kind!r} is not additive (streaming needs "
                "mergeable counters) — use batch check_constraints for "
                "unique/foreign_key/functional_dependency"
            )
        agg_exprs.append(num.cast("long").alias(f"_n{i}"))
        agg_exprs.append(den.cast("long").alias(f"_d{i}"))
        meta.append((i, kind, col, thr))
    if not agg_exprs:
        raise ValueError("empty constraint suite")
    one = df.agg(*agg_exprs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cid"),
                        F.lit(kind).alias("constraint"),
                        F.lit(col).alias("column"),
                        F.col(f"_n{i}").alias("num"),
                        F.col(f"_d{i}").alias("den"),
                        F.lit(thr).alias("threshold"),
                    )
                    for (i, kind, col, thr) in meta
                ]
            )
        ).alias("c")
    ).select("c.*")


def counters_to_certificate(counters: DataFrame) -> DataFrame:
    """(cid, constraint, column, num, den, threshold) -> the same
    certificate schema batch check_constraints emits."""
    metric = F.when(F.col("den").isNull(), F.col("num").cast("double")).otherwise(
        _frac(F.col("num"), F.col("den"))
    )
    return counters.select(
        "constraint",
        "column",
        metric.alias("metric"),
        "threshold",
    ).select(
        "*",
        F.coalesce(F.col("metric") >= F.col("threshold"), F.lit(True)).alias(
            "passed"
        ),
    )


def validate_rows(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Row-level constraint validation: every input column plus
    ``violations`` (array of ``kind:column`` labels, in suite order) and
    ``is_valid`` — the ROUTING complement to the aggregate certificate
    (check_constraints says "2% of rows are bad"; this says WHICH rows,
    so the pipeline can quarantine them instead of failing the load —
    the reference's all-or-nothing batch FAILED flag, ingest.py:98,
    re-expressed as row-level triage).

    Row-local kinds only (not_null / between / in_set / matches): a
    row-level verdict on uniqueness or referential integrity is not a
    map-only decision — check_constraints carries those. Map-only,
    whole-stage-codegen expression per constraint; no shuffle at all.
    NULL semantics match the certificate: a NULL value VIOLATES not_null
    but conforms vacuously to between/in_set/matches (those fractions are
    over non-null values).
    """
    checks = []
    for c in constraints:
        kind = c["kind"]
        if kind == "not_null":
            ok = F.col(c["col"]).isNotNull()
        elif kind == "between":
            ok = F.col(c["col"]).isNull() | F.col(c["col"]).between(
                F.lit(c["lo"]), F.lit(c["hi"])
            )
        elif kind == "in_set":
            ok = F.col(c["col"]).isNull() | F.col(c["col"]).isin(
                list(c["values"])
            )
        elif kind == "matches":
            ok = F.col(c["col"]).isNull() | F.col(c["col"]).rlike(
                c["pattern"]
            )
        else:
            raise ValueError(
                f"constraint kind {kind!r} is not row-local — "
                "check_constraints verifies table-level constraints"
            )
        checks.append(F.when(~ok, F.lit(f"{kind}:{c['col']}")))
    if not checks:
        raise ValueError("empty constraint suite")
    viol = F.array_compact(F.array(*checks))
    return df.select(
        "*",
        viol.alias("violations"),
        (F.size(viol) == 0).alias("is_valid"),
    )


def quarantine_split(
    df: DataFrame, constraints: list[dict]
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, quarantined_rows): valid rows come back with the
    original schema (clean continuation of the pipeline); quarantined rows
    keep the ``violations`` labels for triage. One shared validate plan —
    Spark evaluates each branch with its own pushed filter."""
    v = validate_rows(df, constraints)
    ok = v.where(F.col("is_valid")).select(*df.columns)
    bad = v.where(~F.col("is_valid")).drop("is_valid")
    return ok, bad


def categorical_drift(
    cur: DataFrame,
    ref: DataFrame,
    col: str,
    max_categories: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI drift report for a CATEGORICAL column — the string twin of
    :func:`psi_report`.

    The category set is anchored on the REFERENCE (like the numeric
    min/max): the reference's ``max_categories - 1`` most frequent values
    (ties broken by value, so the set is deterministic) each get a bucket,
    everything else — including categories that only appear in ``cur``,
    the classic drift signal — pools into ``__other__``. Shares are
    exact-integer ratios; contributions are the PSI formula with eps
    smoothing, rounded to 6 dp; ``psi_total`` repeats on every row. NULLs
    are excluded from both sides.

    Plan shape: one keyed count per side, the anchor set is a
    ``max_categories``-row broadcast — the report is O(max_categories)
    rows at any corpus size.
    """
    if max_categories < 2:
        raise ValueError(f"max_categories must be >= 2, got {max_categories}")
    from pyspark.sql import Window

    top = (
        ref.where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("category"))
        .agg(F.count(F.lit(1)).alias("_n"))
        # top-(max_categories-1) via orderBy+limit = distributed
        # TakeOrdered (per-partition partial top-k, driver merge of k-row
        # heads). The previous row_number over an UNPARTITIONED window
        # sorted every distinct category through ONE task — a
        # high-cardinality column (ids, urls) makes that the same
        # single-partition scale-killer q_vocab_coverage had (r13 sweep).
        # Same deterministic set: ties broken by category value.
        .orderBy(F.desc("_n"), F.asc("category"))
        .limit(max_categories - 1)
        .select("category")
    )

    def counted(df: DataFrame, out: str) -> DataFrame:
        c = df.where(F.col(col).isNotNull()).select(
            F.col(col).cast("string").alias("_v")
        )
        lab = c.join(
            F.broadcast(top), c["_v"] == top["category"], "left"
        ).select(
            F.coalesce("category", F.lit("__other__")).alias("category")
        )
        return lab.groupBy("category").agg(F.count(F.lit(1)).alias(out))

    grid = top.select("category").unionByName(
        cur.sparkSession.createDataFrame([("__other__",)], "category string")
    )
    j = (
        grid.join(counted(ref, "_rn"), "category", "left")
        .join(counted(cur, "_cn"), "category", "left")
        .select(
            "category",
            F.coalesce("_rn", F.lit(0)).alias("_rn"),
            F.coalesce("_cn", F.lit(0)).alias("_cn"),
        )
    )
    w = Window.partitionBy()  # <= max_categories rows
    rs = _frac(F.col("_rn"), F.sum("_rn").over(w))
    cs = _frac(F.col("_cn"), F.sum("_cn").over(w))
    j = j.select("category", rs.alias("ref_share"), cs.alias("cur_share"))
    r_ = F.when(F.col("ref_share") == 0, F.lit(float(eps))).otherwise(
        F.col("ref_share")
    )
    c_ = F.when(F.col("cur_share") == 0, F.lit(float(eps))).otherwise(
        F.col("cur_share")
    )
    j = j.select(
        "category",
        "ref_share",
        "cur_share",
        F.round(
            (F.col("cur_share") - F.col("ref_share")) * F.log(c_ / r_), 6
        ).alias("psi_contrib"),
    )
    return j.select(
        "*", F.round(F.sum("psi_contrib").over(w), 6).alias("psi_total")
    ).orderBy("category")
