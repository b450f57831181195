"""[EXT] Mergeable-sketch aggregates: HLL distinct counts, theta set
algebra, KLL quantiles (Apache DataSketches, built into Spark 4 SQL).

Why sketches are the 100 TB answer: a sketch is a small (KB) summary with
an associative, commutative merge. That buys three things exact aggregates
can't give at scale:

- **map-side partials stay tiny**: a distinct-count over billions of keys
  shuffles fixed-size sketch bytes per group, never the key sets
  (`approx_count_distinct` is the same idea; these functions also EXPOSE
  the sketch, which enables the next two);
- **incremental maintenance**: persist one sketch per partition/day; any
  range's distinct count is a union of stored sketches — no re-scan of the
  raw data (the rollup_stream pattern, but for distincts, which plain
  running sums cannot maintain under re-aggregation);
- **cross-segment algebra** (theta): union/intersection/difference of
  *sets* from their sketches alone — "users in segment A and B" across
  shards without ever co-shuffling the raw membership lists.

Everything here is JVM expressions (zero Python on the data path); results
are estimates with published error bounds (HLL lgConfigK=12 → ~1.6% RSE;
KLL k=200 → ~1.65% rank error), asserted in tests/test_sketches.py against
exact answers. DataSketches KLL compaction flips random coins, so asserts
use tolerance bands, not exact equality.

Reference parity: the reference has no approximate surface (its COUNT(*)
comparisons are exact, verify_replication.py:54-70); this extends SURVEY
§2.4 A6's approx row into the full mergeable-sketch family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group approximate distinct count, keeping the sketch bytes.

    Returns (group, approx_distinct, sketch). Persisting ``sketch`` is the
    point: later rollups union the stored sketches (``hll_rollup``) instead
    of touching the raw data again.
    """
    return df.groupBy(group_col).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(value_col, F.lit(lg_config_k))
        ).alias("approx_distinct"),
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias("sketch"),
    )


def hll_rollup(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Global distinct estimate from per-group sketches ALONE — the merge
    that makes incremental/partitioned maintenance work. Distinct counts
    don't sum (groups share members); sketch union handles overlap."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            "approx_distinct_total"
        )
    )


def theta_segment_algebra(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    seg_a: str,
    seg_b: str,
) -> DataFrame:
    """Set algebra over two segments' member sets from theta sketches:
    |A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| — one scan, no self-join.

    The exact formulation is a groupBy + self-join (or two scans with
    INTERSECT/EXCEPT); at 100 TB that shuffles the full membership lists.
    Theta sketches reduce it to one scan emitting two KB-sized summaries,
    then constant-time algebra on the driver side of the plan.
    """
    sk = df.filter(F.col(segment_col).isin(seg_a, seg_b)).agg(
        F.theta_sketch_agg(
            F.when(F.col(segment_col) == seg_a, F.col(value_col))
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(F.col(segment_col) == seg_b, F.col(value_col))
        ).alias("sk_b"),
    )
    return sk.select(
        F.theta_sketch_estimate("sk_a").alias("n_a"),
        F.theta_sketch_estimate("sk_b").alias("n_b"),
        F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias(
            "n_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")).alias(
            "n_a_only"
        ),
    )


def kll_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group streaming quantiles from a KLL sketch (double variant).

    Exact percentiles need a full sort per group; KLL reads once, merges
    associatively (partial aggregation applies), and answers any quantile
    after the fact. Returns one row per group with ``q_<pct>`` columns.
    """
    sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("sk")
    )
    cols = [F.col(group_col)]
    for p in probs:
        cols.append(
            F.kll_sketch_get_quantile_double("sk", F.lit(float(p))).alias(
                f"q_{int(p * 100)}"
            )
        )
    return sk.select(*cols)


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of ``value_col`` as a SMALL relational sketch:
    one row per (hash_row, cell) with the cell's total count — at most
    ``depth x width`` rows regardless of input size.

    The frequency twin of the HLL/theta/KLL family above, and the same
    100 TB argument: the groupBy's map-side partial aggregation caps each
    task's contribution at depth x width cells, so a frequency summary of
    a trillion-row column shuffles KBs per partition, never the value
    set. The sketch is MERGEABLE by construction (:func:`cms_merge` is
    union + re-sum — associative, commutative), so per-day/per-shard
    sketches roll up without re-scanning raw data. Estimates are
    one-sided: est >= true count always; est <= true + e/width x N with
    probability 1-(1/2)^depth (Cormode-Muthukrishnan bounds). Hashing is
    xxhash64(value, row) — JVM-side, deterministic, cross-run stable.
    (Spark ships a binary `count_min_sketch` aggregate; this relational
    form is used instead because the sketch stays queryable/mergeable
    with plain SQL and oracle-checkable cross-engine.) NULLs are not
    counted (frequency of NULL is a COUNT filter, not a sketch lookup).
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    rows = F.explode(
        F.array([F.lit(r) for r in range(depth)])
    ).alias("r")
    return (
        df.select(F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .select(rows, "_v")
        .select(
            "r",
            F.pmod(F.xxhash64("_v", F.col("r")), F.lit(width)).alias("cell"),
        )
        .groupBy("r", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (width, depth): cell-wise
    sum. Exactly equals the sketch of the concatenated inputs."""
    return (
        a.unionByName(b)
        .groupBy("r", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    values: DataFrame,
    value_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate the frequency of each distinct value in ``values``
    from a :func:`cms_build` sketch: min over the value's depth cells
    (missing cell = 0). Returns (value_col, est). The sketch side is
    broadcast (<= depth x width rows), so estimation is map-shaped on the
    values side — no shuffle of the probe set."""
    cand = values.select(F.col(value_col)).where(
        F.col(value_col).isNotNull()
    ).distinct()
    expanded = cand.select(
        value_col,
        F.explode(F.array([F.lit(r) for r in range(depth)])).alias("r"),
    ).withColumn(
        "cell", F.pmod(F.xxhash64(value_col, F.col("r")), F.lit(width))
    )
    return (
        expanded.join(F.broadcast(cms), ["r", "cell"], "left")
        .select(value_col, F.coalesce("cnt", F.lit(0)).alias("_c"))
        .groupBy(value_col)
        .agg(F.min("_c").cast("long").alias("est"))
    )


#: KMV hash space: md5's first 15 hex digits as a non-negative 60-bit long.
#: md5 is the cross-engine bridge (identical in Spark `conv(substr(md5(..)))`
#: and DuckDB `CAST('0x'||substr(md5(..)) AS BIGINT)` — the q_hash_sample
#: precedent), so unlike the HLL/theta binary sketches above, a KMV sketch
#: is value-identical in ANY engine and therefore fully oracle-checkable.
KMV_SPACE = 1 << 60


def kmv_hash(value_col: str, salt: str = "kmv-v1"):
    """The shared KMV hash expression: uniform in [0, 2^60) — deterministic,
    engine-portable (md5 over the salted string form), JVM-side."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def kmv_build(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    salt: str = "kmv-v1",
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch: the k smallest
    DISTINCT hash values of ``value_col`` as a <=k-row DataFrame (column
    ``h``). Mergeable by construction (:func:`kmv_merge` = bottom-k of the
    union — associative, commutative, idempotent), and DETERMINISTIC: same
    data gives byte-identical sketches on any cluster layout, which is what
    lets :func:`kmv_distinct` / :func:`kmv_jaccard` carry full cross-engine
    oracles where the binary HLL/theta sketches can only be
    tolerance-tested.

    Scale path: the naive build is distinct-then-take-k — a shuffle of the
    FULL distinct universe to find k survivors. This build instead
    pre-filters the hash line: one pass estimates n (HLL, merge-order
    independent), then only hashes below ~4k/n of the space enter the
    distinct — an O(k)-expected shuffle. The filter cannot produce a wrong
    sketch: a threshold is a prefix of the hash line, so if >=k distinct
    hashes survive it, the k smallest of the survivors ARE the k smallest
    overall; if fewer survive (astronomically unlikely at 4x headroom, but
    possible), the build falls back to the unfiltered distinct. NULLs are
    not members (a NULL contributes nothing to a distinct count).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.storagelevel import StorageLevel

    hashed = (
        df.select(F.col(value_col))
        .where(F.col(value_col).isNotNull())
        .select(kmv_hash(value_col, salt).alias("h"))
    )
    # The hash stream feeds TWO actions — the HLL n-estimate and the
    # filtered distinct — and its upstream (typically a shingle explode +
    # md5 per row) is the expensive part of the build. Persist it so the
    # source scan + hashing run once instead of once per action; the handle
    # is unpersisted before returning (every returned sketch is an eager
    # localCheckpoint of <= k rows, so no consumer ever re-reads the cache
    # — the ADVICE r13 persist-leak rule).
    # Footprint note (ADVICE r14): the persisted stream is ONE long per
    # member — 8 bytes x total shingles of executor storage for the
    # build's duration, spilling to disk past the memory fraction
    # (MEMORY_AND_DISK). That trades bounded, evictable storage for not
    # re-running the corpus explode+md5; on a stream too large even for
    # disk, drop the persist and pay the recompute — the sketch value is
    # identical either way (the cache is a hint, not a consistency pin).
    hashed = hashed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        bottom = None
        n_est = hashed.agg(F.approx_count_distinct("h").alias("n")).first()["n"]
        if n_est > 4 * k:
            threshold = int(KMV_SPACE * (4.0 * k / float(n_est)))
            filtered = (
                hashed.where(F.col("h") < threshold)
                .distinct()
                .orderBy("h")
                .limit(k)
                .localCheckpoint()  # bounded: <= k rows
            )
            if filtered.count() >= k:
                bottom = filtered
        if bottom is None:
            bottom = hashed.distinct().orderBy("h").limit(k).localCheckpoint()
        return bottom
    finally:
        hashed.unpersist()


def kmv_build_pair(
    df: DataFrame,
    side_col: str,
    value_col: str,
    k: int = 256,
    salt: str = "kmv-v1",
    sides: tuple = (),
) -> dict:
    """Two (or more) :func:`kmv_build` sketches from ONE pass over a
    side-tagged stream — {side_value: sketch DataFrame}.

    Value-identical to calling ``kmv_build`` once per side (same hash,
    same 4x-headroom threshold pre-filter per side, same unfiltered
    fallback, byte-identical <=k-row sketches), but the physical shape
    halves the work (r14 opt, guide §1.2): the source is scanned and
    md5-hashed ONCE for all sides (persisted across the actions, released
    before returning), the per-side HLL n-estimates share one aggregation
    action, and the per-side filtered bottom-k survivors materialize in
    one combined action (per-side window rank over the thresholded hash
    line — each side's prefix property is untouched, so the proof in
    kmv_build applies per side verbatim). Per-build action count drops
    from 2 per side to ~3 total; at corpus scale the saved term is the
    repeated raw-stream scan+hash, which dominates the O(k) sketch work.

    Rows with a NULL side are dropped (ADVICE r14: a NULL side key is not
    a side — it would otherwise become a None dict key and break the
    sorted-side iteration). Side values present in the DATA but absent
    from ``sides`` get sketches under their own keys — callers indexing
    by expected side should pass ``sides`` explicitly.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    hashed = (
        df.select(F.col(side_col).alias("_side"), F.col(value_col))
        .where(F.col(value_col).isNotNull() & F.col(side_col).isNotNull())
        .select("_side", kmv_hash(value_col, salt).alias("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        ests = {
            r["_side"]: r["n"]
            for r in hashed.groupBy("_side")
            .agg(F.approx_count_distinct("h").alias("n"))
            .collect()
        }
        # ``sides`` pre-declares the expected side values so a side with
        # ZERO rows (empty half of an empty/degenerate corpus) still gets
        # its (empty) sketch — kmv_build's empty-input contract per side
        for s in sides:
            ests.setdefault(s, 0)
        sides = sorted(ests)
        out: dict = {}
        filt_sides = [s for s in sides if ests[s] > 4 * k]
        if filt_sides:
            cond = F.lit(False)
            for s in filt_sides:
                thr = int(KMV_SPACE * (4.0 * k / float(ests[s])))
                cond = cond | (
                    (F.col("_side") == F.lit(s)) & (F.col("h") < F.lit(thr))
                )
            w = Window.partitionBy("_side").orderBy("h")
            both = (
                hashed.where(cond)
                .distinct()
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= k)
                .select("_side", "h")
                .localCheckpoint()  # bounded: <= k rows per side
            )
            counts = {
                r["_side"]: r["c"]
                for r in both.groupBy("_side")
                .agg(F.count("*").alias("c"))
                .collect()
            }
            for s in filt_sides:
                if counts.get(s, 0) >= k:
                    out[s] = both.where(F.col("_side") == F.lit(s)).select("h")
        for s in sides:
            if s not in out:  # small side, or filter under-filled (fallback)
                out[s] = (
                    hashed.where(F.col("_side") == F.lit(s))
                    .select("h")
                    .distinct()
                    .orderBy("h")
                    .limit(k)
                    .localCheckpoint()
                )
        return out
    finally:
        hashed.unpersist()


def kmv_build_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    salt: str = "kmv-v1",
) -> DataFrame:
    """Per-group KMV sketch: (group, h) with the k smallest distinct hashes
    of ``value_col`` within each group — "distinct users per segment" as a
    bounded, mergeable, re-aggregatable summary.

    One keyed shuffle: groupBy(group, h) deduplicates with map-side partial
    aggregation (each task ships at most its per-partition distinct hashes),
    then a per-group window keeps the bottom k. The shuffle is bounded by
    the per-group distinct universe — the grouped trade-off; for a single
    global sketch use :func:`kmv_build`, whose threshold pre-filter makes
    the shuffle O(k)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    dedup = (
        df.select(F.col(group_col), F.col(value_col))
        .where(F.col(value_col).isNotNull())
        .select(group_col, kmv_hash(value_col, salt).alias("h"))
        .groupBy(group_col, "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        dedup.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(group_col, "h")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two sketches built with the SAME (salt, k): bottom-k of the
    distinct union. Exactly equals the sketch of the concatenated inputs —
    the property that makes per-day/per-shard sketches roll up without
    re-scanning raw data. Inputs are <=k rows each, so this is driver-cheap."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def _kmv_estimate_expr(k: int):
    """The KMV estimator as a deterministic aggregate expression:
    exact count when the sketch holds fewer than k hashes (the sketch IS
    the distinct hash set), else the classic (k-1)/U_k with U_k = max_hash
    normalized to the 2^60 space. Pure double arithmetic in a fixed
    operation order, so an oracle writing the same expression hashes
    identically (IEEE semantics are shared)."""
    n = F.count("*")
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1))
        * F.lit(float(KMV_SPACE))
        / F.max("h").cast("double")
    )


def kmv_distinct(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_build` sketch alone:
    one row (n_hashes, kth_hash, est_distinct). Standard error is
    ~1/sqrt(k-2) (Beyer et al.); k=256 → ~6%. Exact (not an estimate) when
    the universe had fewer than k members."""
    return sketch.agg(
        F.count("*").cast("long").alias("n_hashes"),
        F.max("h").cast("long").alias("kth_hash"),
        _kmv_estimate_expr(k).alias("est_distinct"),
    )


def kmv_distinct_grouped(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """Per-group distinct estimates from a :func:`kmv_build_grouped`
    sketch: (group, n_hashes, kth_hash, est_distinct)."""
    return sketch.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_hashes"),
        F.max("h").cast("long").alias("kth_hash"),
        _kmv_estimate_expr(k).alias("est_distinct"),
    )


def kmv_jaccard(sk_a: DataFrame, sk_b: DataFrame, k: int = 256) -> DataFrame:
    """Jaccard / union / intersection estimates for two sets from their
    KMV sketches ALONE — corpus-overlap measurement (train/eval shingle
    contamination, vocabulary drift between sources) without ever
    co-shuffling the raw membership lists.

    The estimator (Beyer et al. / the theta-sketch construction): take the
    k smallest hashes of the sketch UNION — a uniform sample of the union —
    and count how many lie in BOTH input sketches: est_jaccard = shared /
    |union_k|; est_union = the KMV count estimate on the union sketch;
    est_intersection = est_jaccard x est_union. All arithmetic is
    fixed-order double math over deterministic hashes, so the whole row is
    oracle-checkable cross-engine. Returns one row:
    (k_used, shared, est_jaccard, est_union, est_intersection)."""
    a = sk_a.select(F.col("h"), F.lit(True).alias("_in_a"))
    b = sk_b.select(F.col("h"), F.lit(True).alias("_in_b"))
    union_k = (
        sk_a.select("h")
        .unionByName(sk_b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    tagged = (
        union_k.join(a, "h", "left")
        .join(b, "h", "left")
        .select(
            "h",
            (
                F.coalesce(F.col("_in_a"), F.lit(False))
                & F.coalesce(F.col("_in_b"), F.lit(False))
            ).alias("_both"),
        )
    )
    return tagged.agg(
        F.count("*").cast("long").alias("k_used"),
        F.sum(F.col("_both").cast("long")).cast("long").alias("shared"),
        (
            F.sum(F.col("_both").cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("est_jaccard"),
        _kmv_estimate_expr(k).alias("est_union"),
        (
            F.sum(F.col("_both").cast("long")).cast("double")
            / F.count("*").cast("double")
            * _kmv_estimate_expr(k)
        ).alias("est_intersection"),
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_fraction: float = 0.01,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Values whose estimated frequency reaches ``min_fraction`` of the
    non-null rows, WITHOUT an exact full groupBy on the value — the CMS
    two-pass heavy-hitters (Cormode-Muthukrishnan): build the sketch
    (pass 1), then re-scan filtering each row through its ``depth``
    broadcast cell lookups (pass 2, map-shaped — the only shuffle is the
    final distinct over SURVIVORS). Returns (value_col, est,
    est_fraction), est = the CMS estimate.

    Guarantees (both one-sided, both inherited from est >= true):
    - **no false negatives**: every value with true frequency >=
      min_fraction x N is returned (its est can only be higher);
    - **bounded false positives**: a returned value has true frequency
      > min_fraction x N - e/width x N with probability 1-(1/2)^depth —
      near-hitters inflated by collisions, never arbitrary values.

    Why this scales where groupBy(value) doesn't: the shuffle after
    pass 2 carries only values whose EVERY cell reached the threshold —
    O(depth x width / min_fraction)-bounded in expectation — while an
    exact top-k must shuffle the full distinct universe. Deterministic
    end-to-end (xxhash64), so same data = same answer, any cluster
    layout."""
    if not 0 < min_fraction <= 1:
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    n = df.where(F.col(value_col).isNotNull()).count()  # bounded: one scalar
    sketch = cms_build(df, value_col, width, depth).localCheckpoint()
    threshold = float(min_fraction) * float(n)
    probe = df.select(F.col(value_col)).where(F.col(value_col).isNotNull())
    # depth broadcast lookups, each a map-side hash join against <= width
    # cells of one sketch row — no shuffle of the data side
    for r in range(depth):
        row_r = sketch.where(F.col("r") == r).select(
            F.col("cell").alias(f"_cell{r}"), F.col("cnt").alias(f"_cnt{r}")
        )
        probe = probe.withColumn(
            f"_cell{r}", F.pmod(F.xxhash64(value_col, F.lit(r)), F.lit(width))
        ).join(F.broadcast(row_r), f"_cell{r}", "left")
    est = F.least(*[F.coalesce(F.col(f"_cnt{r}"), F.lit(0)) for r in range(depth)])
    return (
        probe.select(value_col, est.alias("est"))
        .where(F.col("est") >= F.lit(threshold))
        .groupBy(value_col)
        .agg(F.max("est").cast("long").alias("est"))
        .select(
            value_col,
            "est",
            (F.col("est").cast("double") / F.lit(float(max(n, 1)))).alias(
                "est_fraction"
            ),
        )
    )
