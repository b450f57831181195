"""Reconciliation operators — source vs target verification (J7/J8, A1/A4).

The reference's verify_replication.py:
- check_table_counts (:54-70): COUNT(*) both sides, equality verdict;
- verify_data_consistency (:99-146): ordered SELECT both sides, positional
  zip compare in client memory, report first 5 mismatches.

The positional zip is O(table) in one Python process and silently misaligns
every row after a gap (SURVEY.md §7 delta 2). The engine's primary diff is
a KEYED full-outer join — distributed, gap-proof, and it classifies each
divergence. A positional mode (row_number over the sort order on both
sides, joined on position) is provided for bug-compatible comparisons.

Scale: the diff shuffles both sides once on the join key (or position);
hash-compare mode reduces wide rows to one hash column before the shuffle,
so network volume is O(rows·16B) instead of O(rows·row_width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compare_counts(
    pairs: dict[str, tuple[DataFrame, DataFrame]]
) -> DataFrame:
    """Per-table source/target row counts + match verdict in ONE plan.

    The reference needs dblink or two connections + client compare
    (docs/replication_troubleshooting.md:127-139); two DataFrames in one
    session make it a union of tiny aggregates."""
    outs = []
    for table, (src, tgt) in pairs.items():
        s = src.agg(F.count("*").alias("src_count")).withColumn(
            "table_name", F.lit(table)
        )
        t = tgt.agg(F.count("*").alias("tgt_count")).withColumn(
            "table_name", F.lit(table)
        )
        outs.append(s.join(t, "table_name"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "table_name",
        "src_count",
        "tgt_count",
        (F.col("src_count") == F.col("tgt_count")).alias("counts_match"),
    )


def diff_rows(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    max_report: int | None = None,
) -> DataFrame:
    """Keyed full-outer diff with per-key cardinality + value classification.

    diff_type ∈ {missing_in_target, extra_in_target, cardinality_mismatch,
    value_mismatch}. compare_cols defaults to all non-key columns.
    max_report caps the output like verify_replication.py:136-138 (first-5
    report) — applied AFTER classification so the count is still exact."""
    if compare_cols is None:
        compare_cols = [c for c in src.columns if c not in key_cols]
    s = src.groupBy(*key_cols).agg(
        F.count("*").alias("src_cnt"),
        *[F.max(c).alias(f"src_{c}") for c in compare_cols],
    )
    t = tgt.groupBy(*key_cols).agg(
        F.count("*").alias("tgt_cnt"),
        *[F.max(c).alias(f"tgt_{c}") for c in compare_cols],
    )
    j = s.join(t, key_cols, "full_outer")
    # key-only tables (no compare columns) diff on existence/cardinality
    # alone — F.lit(False) keeps the when() chain well-formed
    value_mismatch = F.lit(False)
    for c in compare_cols:
        neq = ~F.col(f"src_{c}").eqNullSafe(F.col(f"tgt_{c}"))
        value_mismatch = value_mismatch | neq
    diff_type = (
        F.when(F.col("src_cnt").isNull(), "extra_in_target")
        .when(F.col("tgt_cnt").isNull(), "missing_in_target")
        .when(F.col("src_cnt") != F.col("tgt_cnt"), "cardinality_mismatch")
        .when(value_mismatch, "value_mismatch")
    )
    out = j.withColumn("diff_type", diff_type).filter(
        F.col("diff_type").isNotNull()
    )
    if max_report is not None:
        out = out.orderBy(*key_cols).limit(max_report)
    return out


def repair_batch(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    lsn: str = "0/0",
) -> DataFrame:
    """The corrective change batch that converges the target onto the
    source — the apply-shaped event set (key + source image + op +
    source_lsn) a reconciliation run needs to HEAL the drift
    :func:`diff_rows` reported. The reference stops at reporting
    (verify_replication.py prints the first mismatches and exits);
    this closes the loop:

        apply_batch(tgt, repair_batch(src, tgt, keys), keys)

    equals the source exactly when keys are unique (the reference's
    primary-key contract); a duplicate-keyed source converges to its
    per-key max image (diff_rows' cardinality convention) — tested both
    ways. missing_in_target / value_mismatch / cardinality_mismatch
    keys upsert the source image ('u'); extra_in_target keys delete
    ('d', NULL payload — apply ignores delete payloads).

    Scale shape: one keyed diff (two map-side-combinable groupBys + a
    full-outer join on the key) — the batch is O(|drift|), and applying
    it costs O(touched keys), never O(table)."""
    if compare_cols is None:
        compare_cols = [c for c in src.columns if c not in key_cols]
    d = diff_rows(src, tgt, key_cols, compare_cols)
    upserts = d.filter(F.col("diff_type") != "extra_in_target").select(
        *key_cols,
        *[F.col(f"src_{c}").alias(c) for c in compare_cols],
        F.lit("u").alias("op"),
        F.lit(lsn).alias("source_lsn"),
    )
    deletes = d.filter(F.col("diff_type") == "extra_in_target").select(
        *key_cols,
        *[
            F.lit(None).cast(src.schema[c].dataType).alias(c)
            for c in compare_cols
        ],
        F.lit("d").alias("op"),
        F.lit(lsn).alias("source_lsn"),
    )
    return upserts.unionByName(deletes)


class _Rev:
    """Descending-order wrapper for the driver-side boundary sort (only
    ``__lt__`` is needed by ``sorted``)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def _sort_key_atom(v, asc: bool):
    """Python sort atom matching Spark's ordering semantics for one column
    value: ascending = NULLS FIRST then values then NaN LAST (Spark orders
    NaN above every number and NaN = NaN true); descending mirrors it
    (NaN first, NULLS LAST)."""
    is_nan = isinstance(v, float) and v != v
    if asc:
        if v is None:
            return (0, 0)
        if is_nan:
            return (2, 0)
        return (1, v)
    if is_nan:
        return (0, 0)
    if v is None:
        return (2, 0)
    return (1, _Rev(v))


def range_boundaries(
    df: DataFrame, keys: list[tuple[str, bool]], n_parts: int
) -> list[tuple]:
    """Deterministic range-partition boundaries as driver-side VALUES
    (r15, VERDICT r14 #5): a fixed-size hash-ordered sample (the same
    ~100-rows-per-partition budget Spark's RangePartitioner reservoir
    uses, but reproducible — smallest xxhash64 wins, full-key tie-break),
    sorted under the requested per-column order, split at the n_parts
    quantile ranks. Returns ≤ n_parts - 1 boundary tuples (deduplicated;
    heavy key duplication simply yields fewer, larger buckets — balance
    degrades, correctness never)."""
    cols = [c for c, _ in keys]
    h = F.xxhash64(*[F.col(c) for c in cols])
    # deterministic 1/16 thinning BEFORE the TakeOrdered: the heap
    # otherwise ships up to 100·n_parts rows from EVERY scan partition to
    # the driver merge (measured ~0.5 s of pure transfer at 32×3200). A
    # hash-prefix subset is still a uniform sample; a small frame that
    # thins below the budget just yields fewer boundaries (coarser
    # balance, never wrong — and small frames don't need parallelism).
    sample = (
        df.select(*[F.col(c) for c in cols], h.alias("_h"))
        .where(F.pmod(F.col("_h"), F.lit(16)) == 0)
        .orderBy("_h", *cols)
        .limit(100 * n_parts)
        .collect()
    )
    if not sample:
        return []
    rows = sorted(
        ([r[c] for c in cols] for r in sample),
        key=lambda vals: tuple(
            _sort_key_atom(v, asc) for v, (_, asc) in zip(vals, keys)
        ),
    )
    m = len(rows)
    bounds: list[tuple] = []
    for j in range(1, n_parts):
        b = tuple(rows[(j * m) // n_parts])
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def range_pid_expr(df: DataFrame, keys: list[tuple[str, bool]], bounds: list[tuple]):
    """Bucket id as a PURE ROW-VALUE expression: the count of boundary
    tuples the row's key STRUCT sorts strictly after. Spark's struct
    ordering is exactly the sort order we need — lexicographic by field,
    null fields FIRST (asc NULLS FIRST), NaN above every number and
    NaN = NaN — so each boundary costs ONE shallow comparison node
    against a constant-folded struct literal. (The first cut expanded
    each boundary into a per-column gt/eq predicate chain; at 3 key
    columns × 31 boundaries the generated code was large enough that
    janino COMPILE time — paid per job — tripled the query. The struct
    form compiles to one ordering call per boundary.)

    Descending keys ride as numeric negation inside the struct (both row
    side and boundary side), which preserves the order for the non-null
    numeric descents the callers use; a desc key must be numeric and
    non-null (asserted).

    Monotone in the sort order by construction, so
    row_number-within-bucket + preceding-bucket counts is exactly the
    global row_number — and because the id is a function of the row
    VALUE (boundaries are literals folded into the plan), any number of
    jobs recompute it identically: no pinned data, no cache-consistency
    requirement, executor-loss-safe.

    The comparisons form a balanced BINARY-SEARCH tree (nested CASE WHEN
    with literal int leaves), so a row evaluates ⌈log₂ buckets⌉ struct
    comparisons, not one per boundary — the linear sum-of-predicates form
    cost ~10 µs/row at 31 boundaries, which dominated the whole operator
    at bench scale and would be the per-row scan cost at 100 TB."""
    if not bounds:
        return F.lit(0)
    dtypes = dict(df.dtypes)
    row_fields = []
    for c, asc in keys:
        row_fields.append(F.col(c) if asc else (-F.col(c)).alias(c))
    rk = F.struct(*row_fields)

    def bound_struct(b: tuple):
        fields = []
        for (c, asc), bv in zip(keys, b):
            if not asc:
                if bv is None:
                    raise ValueError(
                        f"range_pid_expr: desc key {c!r} must be non-null"
                    )
                bv = -bv
            fields.append(F.lit(bv).cast(dtypes[c]).alias(c))
        return F.struct(*fields)

    def tree(lo: int, hi: int):
        # bucket ids in [lo, hi]; bounds[i] separates bucket i from i+1
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(rk > bound_struct(bounds[mid]), tree(mid + 1, hi)).otherwise(
            tree(lo, mid)
        )

    return tree(0, len(bounds))


def _with_global_positions(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Global sort positions WITHOUT a single-partition window: a
    value-derived range-bucket id (literal boundary comparisons —
    :func:`range_pid_expr`), row_number WITHIN each bucket, shifted by
    the preceding buckets' counts.

    Consistency contract (r15 redesign, VERDICT r14 #5): the counts job
    and the positions job MUST agree on every row's bucket. The r13 shape
    relied on a scoped CACHE and the r14 fix on an eager localCheckpoint
    to pin one boundary sample for both jobs — correct, but the pin held
    the FULL diff input in non-replicated executor-local blocks (an
    executor loss kills the query; at 100 TB the footprint is the whole
    input). Now the bucket id is a pure function of the ROW VALUE:
    boundaries are sampled once on the driver (deterministic hash-ordered
    sample) and folded into both plans as literals, so both jobs — and
    any recomputation after executor loss — derive identical buckets
    from scratch. The persist below is a pure HINT (one materialization
    instead of three scans); eviction is value-safe again.

    Value-identical to `row_number over (ORDER BY order_cols)`: the
    bucket id is monotone in the total sort order, and ties (exact
    duplicate sort keys) are interchangeable positions either way. The
    boundary sample is O(100·numPartitions) rows of driver metadata; the
    bucket offsets stay inside the plan (no driver collect at all)."""
    from .cache_scope import scoped_persist

    spark = df.sparkSession
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:  # e.g. "auto" on vendor runtimes
        n_parts = max(2, spark.sparkContext.defaultParallelism)
    keys = [(c, True) for c in order_cols]
    base = scoped_persist(df)
    bounds = range_boundaries(base, keys, n_parts)
    withpid = base.withColumn("_pid", range_pid_expr(base, keys, bounds))
    # bucket offsets computed INSIDE the plan (r15): per-bucket counts are
    # a tiny keyed agg (≤ n_parts rows), and each bucket's offset is the
    # sum of the counts of the buckets before it — a ≤ n_parts² self-join
    # that AQE broadcasts. Folding this into the consumer's job removes
    # the per-call driver collect round-trip (one scheduler job per diff
    # side at bench scale), keeps the whole operator a single job, and —
    # because _pid is value-derived — every branch recomputes consistent
    # buckets even after cache eviction or executor loss.
    cnts = withpid.groupBy("_pid").agg(F.count("*").alias("_c"))
    prev = cnts.select(
        F.col("_pid").alias("_ppid"), F.col("_c").alias("_pc")
    )
    offs = (
        cnts.crossJoin(F.broadcast(prev))
        .groupBy("_pid")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_ppid") < F.col("_pid"), F.col("_pc"))),
                F.lit(0),
            )
            .cast("long")
            .alias("_off")
        )
    )
    w_local = Window.partitionBy("_pid").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        withpid.join(F.broadcast(offs), "_pid")
        .withColumn("_pos", F.row_number().over(w_local) + F.col("_off"))
        .drop("_pid", "_off")
    )


def diff_rows_positional(
    src: DataFrame, tgt: DataFrame, order_cols: list[str]
) -> DataFrame:
    """Bug-compatible positional diff (verify_replication.py:125-133):
    row_number over the sort order on both sides, joined on position.

    Kept for parity with the reference's semantics; note a single missing
    row shifts every subsequent position — exactly the reference's
    misalignment behavior. The positions themselves are computed
    DISTRIBUTED (range-partitioned two-pass prefix sum, no
    single-partition Exchange) — the misalignment semantics is the
    parity bug we keep, the single-task sort was not."""
    cols = list(src.columns)

    def pos_prefixed(df: DataFrame, prefix: str) -> DataFrame:
        return _with_global_positions(df, order_cols).select(
            "_pos", *[F.col(c).alias(f"{prefix}{c}") for c in cols]
        )

    s = pos_prefixed(src, "src_")
    t = pos_prefixed(tgt, "tgt_")
    cond = None
    for c in cols:
        neq = ~F.col(f"src_{c}").eqNullSafe(F.col(f"tgt_{c}"))
        cond = neq if cond is None else (cond | neq)
    return s.join(t, "_pos", "full_outer").filter(cond)


def diff_by_hash(
    src: DataFrame, tgt: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Wide-table diff: compare one xxhash64 over all non-key columns.

    Shrinks shuffle payload to (key, hash) — the 100 TB mode. Rows whose
    hash differs (or exist on one side only) are reported; re-join the
    originals on key for the value-level detail of just those rows."""
    def h(df: DataFrame) -> DataFrame:
        rest = [c for c in df.columns if c not in key_cols]
        # xxhash64 leaves its accumulator untouched for a NULL argument, so
        # (a, NULL, b) and (a, b, NULL) would collide; tag each field with
        # an explicit null marker / value prefix to keep positions distinct
        return df.select(
            *key_cols,
            F.xxhash64(
                *[
                    F.when(F.col(c).isNull(), F.lit("N")).otherwise(
                        F.concat(F.lit("v"), F.col(c).cast("string"))
                    )
                    for c in rest
                ]
            ).alias("row_hash"),
        )

    s = h(src).withColumnRenamed("row_hash", "src_hash")
    t = h(tgt).withColumnRenamed("row_hash", "tgt_hash")
    return (
        s.join(t, key_cols, "full_outer")
        .filter(
            ~F.col("src_hash").eqNullSafe(F.col("tgt_hash"))
        )
        .select(
            *key_cols,
            "src_hash",
            "tgt_hash",
            F.when(F.col("src_hash").isNull(), "extra_in_target")
            .when(F.col("tgt_hash").isNull(), "missing_in_target")
            .otherwise("value_mismatch")
            .alias("diff_type"),
        )
    )


def verify_batch(
    spark,
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    max_report: int = 5,
) -> dict:
    """One-call verification verdict (verify_replication.py main flow):
    counts + keyed diff, first-N mismatch sample, boolean verdict."""
    src_count = src.count()
    tgt_count = tgt.count()
    diff = diff_rows(src, tgt, key_cols)
    n_diff = diff.count()
    sample = diff.orderBy(*key_cols).limit(max_report).collect()
    return {
        "source_count": src_count,
        "target_count": tgt_count,
        "counts_match": src_count == tgt_count,
        "n_differences": n_diff,
        "consistent": n_diff == 0 and src_count == tgt_count,
        "sample": [r.asDict() for r in sample],
    }


def fingerprint_diff(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    n_buckets: int = 1024,
    hash_cols: list[str] | None = None,
    bucket_of=None,
) -> DataFrame:
    """Bucket-level checksum compare — the 100 TB FIRST pass of a recon.

    Every keyed diff above (diff_rows / diff_by_hash) shuffles O(rows);
    at 100 TB that is the whole table over the network just to learn that
    almost everything matches. This pass reduces each side to ONE
    (count, checksum) row per key-hash bucket:

      row_fingerprint = first 8 md5 hex chars of the canonicalized row
                        (cross-engine-exact: same md5 idiom as hash_split)
      bucket checksum = SUM of row fingerprints — order-independent, so
                        no sort anywhere; 32-bit terms keep the BIGINT
                        sum overflow-free below 2^30 rows/bucket (size
                        n_buckets so buckets stay under that)

    With map-side partial aggregation the shuffle is O(n_buckets x
    partitions) partial rows — network cost is independent of table
    width and effectively independent of row count. Buckets whose
    (count, checksum) match on both sides are PROVEN divergence-free
    (up to checksum collision, ~2^-32 per bucket per divergence);
    only mismatched buckets proceed to the row-level drill-down
    (``fingerprint_drilldown``), so the expensive keyed diff runs on
    O(divergent buckets), not O(table).

    Output: one row per bucket present on either side — (bucket,
    src_count, tgt_count, src_fp, tgt_fp, bucket_match).

    ``bucket_of(df) -> Column`` overrides the bucket key (default
    pmod(xxhash64(key), n)); pass the same expression the target layout
    uses (operators/apply.py::bucket_expr) and the pass reads co-located.

    The canonicalized column list is derived ONCE from the SOURCE (or
    ``hash_cols``) and selected by name on both sides — a target with a
    different physical column order, or with extra columns (e.g. the
    ``_bucket`` layout column a bucketed target read exposes), compares
    by content, not by schema accident. A target MISSING a source column
    is a schema divergence and fails the plan with a clear resolution
    error rather than silently flagging every bucket.
    """
    cols = hash_cols or src.columns

    def side(df: DataFrame, cnt: str, fp: str) -> DataFrame:
        # netstring-style canonicalization: each field is length-prefixed
        # ("5:hello") or the null marker "N" — self-delimiting, so values
        # containing the separator can't alias across field boundaries and
        # NULL never collides with any literal string (a plain '|' join
        # has both ambiguities). Same expression shape in the SQL oracle.
        parts = [
            F.when(F.col(c).isNull(), F.lit("N")).otherwise(
                F.concat(
                    F.length(F.col(c).cast("string")).cast("string"),
                    F.lit(":"),
                    F.col(c).cast("string"),
                )
            )
            for c in cols
        ]
        canon = F.concat_ws("|", *parts)
        rowh = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
        b = (
            bucket_of(df)
            if bucket_of is not None
            else F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets))
        )
        return (
            df.select(b.cast("long").alias("bucket"), rowh.alias("_h"))
            .groupBy("bucket")
            .agg(
                F.count("*").cast("long").alias(cnt),
                F.sum("_h").cast("long").alias(fp),
            )
        )

    s = side(src, "src_count", "src_fp")
    t = side(tgt, "tgt_count", "tgt_fp")
    return (
        s.join(t, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("src_count", F.lit(0)).cast("long").alias("src_count"),
            F.coalesce("tgt_count", F.lit(0)).cast("long").alias("tgt_count"),
            "src_fp",
            "tgt_fp",
            (
                (
                    F.coalesce("src_count", F.lit(0))
                    == F.coalesce("tgt_count", F.lit(0))
                )
                & F.col("src_fp").eqNullSafe(F.col("tgt_fp"))
            ).alias("bucket_match"),
        )
    )


def fingerprint_drilldown(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    summary: DataFrame,
    n_buckets: int = 1024,
    bucket_of=None,
) -> DataFrame:
    """Row-level diff restricted to the buckets ``fingerprint_diff``
    flagged — the second pass. The bucket predicate is pushed into BOTH
    scans (on a bucket-partitioned target it prunes to the divergent
    dirs), so the keyed full-outer diff joins O(divergent buckets) rows."""
    bad = [r["bucket"] for r in summary.filter(~F.col("bucket_match")).collect()]

    def restrict(df: DataFrame) -> DataFrame:
        b = (
            bucket_of(df)
            if bucket_of is not None
            else F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets))
        )
        return df.filter(b.cast("long").isin(bad))

    return diff_rows(restrict(src), restrict(tgt), key_cols)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Column-level profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str).

    The column-granular sibling of compare_counts: where row counts say
    "something is off", the profile says WHICH column drifted (a NULLed-out
    field, a truncated string, a shifted range) without any keyed join.
    All metrics per column are computed as parallel aggregate
    expressions — never one scan per column — then unpivoted with
    stack(). min/max surface as strings so heterogeneous column types
    fit one frame. Exact mode runs TWO aggregation jobs over the source
    (the distinct counts must live in their own aggregation, see below),
    so a source mutating between them — e.g. a parquet dir a stream is
    appending to — can yield a profile mixing two snapshots; approx mode
    is a true single pass (one snapshot) as well as the 100 TB mode.

    ``approx_distinct`` is the 100 TB switch: exact mode uses one
    count_distinct PER COLUMN, and Catalyst plans multiple distinct
    aggregates via Expand — every input row duplicated (n_cols+1)x before
    aggregation (the q_approx_stats lesson), ruinous on a wide table.
    approx mode swaps in approx_count_distinct (HLL, a plain non-distinct
    aggregate buffer: no Expand, true single pass, ~2%% rsd). HLL is
    deterministic for identical value sets, so profile_diff's match flags
    remain sound in approx mode — equal slices still compare equal.
    """
    cols = cols or df.columns
    bad = [c for c in cols if "`" in c]
    if bad:  # backticks can't be escaped in a quoted identifier
        raise ValueError(f"column names with backticks unsupported: {bad!r}")
    # positional aliases (_nn_0, _nd_0, ...) keep generated identifiers
    # valid for ANY source column name (spaces, dots, quotes); the real
    # name only ever appears as an escaped string literal in the stack
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_nn_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{i}"),
        ]
    if approx_distinct:
        # HLL buffers are plain aggregates — no Expand, safe to co-locate
        aggs += [
            F.approx_count_distinct(F.col(c)).cast("long").alias(f"_nd_{i}")
            for i, c in enumerate(cols)
        ]
        one = df.agg(*aggs)
    else:
        # exact mode: the n_cols count_distinct aggregates go in their OWN
        # aggregation — Catalyst plans multi-distinct via Expand (every row
        # duplicated (n_cols+1)x), and co-locating that with the min/max/
        # null aggregates multiplies THEIR input too (the q_approx_stats
        # 8x lesson, NOTES_r5). Split, the Expand only multiplies slim
        # projected rows; the two 1-row results cross-join for free.
        nd_aggs = [
            F.count_distinct(F.col(c)).cast("long").alias(f"_nd_{i}")
            for i, c in enumerate(cols)
        ]
        one = df.agg(*aggs).crossJoin(df.agg(*nd_aggs))
    stack_args = ", ".join(
        "'{lbl}', _nn_{i}, _nd_{i}, _mn_{i}, _mx_{i}".format(
            lbl=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min_str, max_str)",
        "n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def profile_diff(
    src: DataFrame,
    tgt: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Side-by-side column profiles with per-metric match flags — the
    zero-join data-diff first look (which column diverged, without any
    keyed join). ``approx_distinct=True`` for wide tables at scale AND
    for single-snapshot reads of live sources (see profile_columns;
    match flags stay sound — HLL is deterministic)."""
    s = profile_columns(src, cols, approx_distinct)
    t = profile_columns(tgt, cols, approx_distinct)
    s = s.select(
        "column",
        *[F.col(c).alias(f"src_{c}") for c in s.columns if c != "column"],
    )
    t = t.select(
        "column",
        *[F.col(c).alias(f"tgt_{c}") for c in t.columns if c != "column"],
    )
    j = s.join(t, "column", "full_outer")
    return j.select(
        "column",
        "src_n_rows", "tgt_n_rows",
        "src_n_nulls", "tgt_n_nulls",
        "src_n_distinct", "tgt_n_distinct",
        "src_min_str", "tgt_min_str",
        "src_max_str", "tgt_max_str",
        (
            F.col("src_n_rows").eqNullSafe(F.col("tgt_n_rows"))
            & F.col("src_n_nulls").eqNullSafe(F.col("tgt_n_nulls"))
            & F.col("src_n_distinct").eqNullSafe(F.col("tgt_n_distinct"))
            & F.col("src_min_str").eqNullSafe(F.col("tgt_min_str"))
            & F.col("src_max_str").eqNullSafe(F.col("tgt_max_str"))
        ).alias("column_match"),
    )


def cast_null_audit(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Per-column count of values a ``try_cast`` would SILENTLY null —
    rows where the source value is non-NULL but ``try_cast(col AS type)``
    returns NULL (unparseable text, out-of-DECIMAL-range doubles, NaN/Inf
    into exact types).

    The auditability companion to the engine's try_cast money discipline
    (ADVICE r7): every revenue/stats query casts measures with try_cast so
    one corrupt value costs itself instead of failing the job under ANSI —
    but that makes the exclusion silent, and aggregate totals can
    understate on a dirty feed with no signal. Run this audit beside (or
    scheduled against) any try_cast-consuming pipeline: a non-zero
    ``silently_nulled`` names exactly which column is quietly losing
    values and how many. One scan, all columns as parallel aggregate
    expressions (the profile_columns dataflow), unpivoted with stack().

    ``casts`` maps column name → target type string, e.g.
    ``{"l_quantity": "decimal(12,2)"}``.
    """
    cols = list(casts)
    bad = [c for c in cols if "`" in c]
    if bad:
        raise ValueError(f"column names with backticks unsupported: {bad!r}")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull() & F.col(c).try_cast(casts[c]).isNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"_sn_{i}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{lbl}', '{ty}', _sn_{i}".format(
            lbl=c.replace("\\", "\\\\").replace("'", "\\'"),
            ty=casts[c].replace("'", "\\'"),
            i=i,
        )
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (column, target_type, silently_nulled)",
        "n_rows",
    ).select("column", "target_type", "n_rows", "silently_nulled")
