"""[EXT] Time-series similarity search over keyed event series.

Motivated by the distributed time-series similarity-search literature
(e.g. "Time Series Similarity Search for Streaming Data in Distributed
Systems", EDBT 2019): given per-key value series (one reading per key per
time bucket), find the keys whose series moves most like a query key's
series.

Spark-first shape — the whole search is ONE broadcast join + ONE keyed
aggregation + a TakeOrdered top-k:

  1. the query key's series (a few hundred rows) broadcasts;
  2. every other key's series inner-joins it on the time bucket — series
     align on the query's observed buckets, keys missing a bucket simply
     contribute fewer paired points (n per key is part of the output);
  3. Pearson r per key from the five sufficient statistics
     (n, Σx, Σy, Σxy, Σx², Σy²) in one map-side-combined aggregation —
     shuffle O(keys), never O(points);
  4. top-k by (r, key) via sort+limit (planned as TakeOrdered — no global
     sort materialization).

Determinism discipline (the repo's oracle rules): values are cast to
DECIMAL before summation so the sufficient statistics are EXACT in any
engine regardless of summation order; r is computed from those exact
sums in double (same IEEE inputs → same IEEE result cross-engine) and
rounded BEFORE the top-k cut so fp noise can't flip the ordering.

Pearson r is z-normalized-euclidean similarity in disguise
(d_z² = 2n(1−r)), so this is also the classic normalized-subsequence
ranking; correlation is preferred here because it is scale/offset
invariant — two users with the same activity *shape* at different
volumes rank together.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import pandas_parallelism as _pandas_parallelism


def series_similarity_topk(
    series: DataFrame,
    query_key,
    key_col: str = "user_id",
    time_col: str = "bucket",
    value_col: str = "value",
    k: int = 10,
    min_overlap: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k keys by Pearson correlation of their series with
    ``query_key``'s series, aligned on the query's time buckets.

    ``series`` must hold ONE row per (key, time bucket) — pre-aggregate
    first (e.g. daily sums). Keys with fewer than ``min_overlap`` paired
    buckets are dropped (a 1-point series correlates with anything), as
    are constant series on either side (r undefined: zero variance).

    Returns (key, n_buckets, corr_r) ordered by (corr_r desc, key),
    ``corr_r`` rounded at ``round_dp`` before the cut.
    """
    # 18,6: products are decimal(37,12) — still exact within both engines'
    # 38-digit ceiling; a wider input decimal would overflow the multiply
    # and the engines disagree on precision-loss handling
    dec = "decimal(18,6)"
    q = (
        series.filter(F.col(key_col) == F.lit(query_key))
        .select(
            F.col(time_col).alias("_t"),
            F.col(value_col).cast(dec).alias("_y"),
        )
    )
    rest = series.filter(F.col(key_col) != F.lit(query_key)).select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_t"),
        F.col(value_col).cast(dec).alias("_x"),
    )
    paired = rest.join(F.broadcast(q), "_t")
    stats = paired.groupBy("_k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r = (n * sxy - sx * sy) / F.sqrt(var_x * var_y)
    # loud-failure guard (ADVICE r5): under ANSI-off, a DECIMAL sum that
    # overflows (or an all-NULL value column) yields a NULL sufficient
    # statistic — without this check the key would silently vanish from
    # the top-k through the var>0 filter. n >= 1 always holds post-groupBy,
    # so a NULL sum is never a legitimate empty-group artifact.
    null_stat = (
        F.col("sx").isNull()
        | F.col("sy").isNull()
        | F.col("sxy").isNull()
        | F.col("sxx").isNull()
        | F.col("syy").isNull()
    )
    r_checked = F.when(
        null_stat,
        F.raise_error(
            F.concat(
                F.lit(
                    "series_similarity_topk: NULL sufficient statistic for "
                    "key "
                ),
                F.col("_k").cast("string"),
                F.lit(
                    " — decimal(18,6) sum overflow or all-NULL values; "
                    "reduce input magnitude or pre-aggregate coarser"
                ),
            )
        ).cast("double"),
    ).otherwise(F.round(r, round_dp))
    return (
        stats.filter(
            (F.col("n") >= min_overlap)
            & (null_stat | ((var_x > 0) & (var_y > 0)))
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("n").alias("n_buckets"),
            r_checked.alias("corr_r"),
        )
        .orderBy(F.desc("corr_r"), key_col)
        .limit(k)
    )


def _znorm_np(x):
    """Population z-norm; None for a constant series (r undefined)."""
    s = x.std()
    return None if s == 0 else (x - x.mean()) / s


def _dtw_np(a, b, r: int) -> float:
    """Banded (Sakoe-Chiba radius ``r``) DTW distance between two numpy
    arrays — O(n*band) vectorized DP, no per-cell Python."""
    import numpy as np

    n, m = a.size, b.size
    w = max(r, abs(n - m))  # band must cover the diagonal offset
    inf = np.inf
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo, hi = max(1, i - w), min(m, i + w)
        cost = (a[i - 1] - b[lo - 1:hi]) ** 2
        # the row recurrence cur[j] = min(cand[j], cur[j-1] + cost[j])
        # (cand = cost + min(up, diag)) is a prefix-min with additive
        # drift: cur[j] = cc[j] + min_{k<=j}(cand[k] - cc[k]) with
        # cc = cumsum(cost) — so the whole row is two vectorized mins
        # and an accumulate, no per-cell Python
        cand = cost + np.minimum(prev[lo:hi + 1], prev[lo - 1:hi])
        cc = np.cumsum(cost)
        cur[lo:hi + 1] = cc + np.minimum.accumulate(cand - cc)
        prev = cur
    return float(np.sqrt(prev[m]))


def _packed_dtw_scores(
    series: DataFrame,
    query_key,
    key_col: str,
    time_col: str,
    value_col: str,
    qz,
    bands: list,
    min_len: int,
    candidate_keys: DataFrame | None = None,
) -> DataFrame:
    """(_k, n_points, _d0[, _d1...]) — banded-DTW distance(s) to the query
    series for every candidate key, via the packed series-as-row shape:

    1. ONE groupBy packs each key's time-ordered values into an array
       column (collect_list + array_sort on (t, x) structs — the same
       O(points) keyed shuffle any per-key assembly pays);
    2. ONE Arrow-batched scalar pandas UDF scores a whole batch of keys
       (~10k rows) per Python invocation, running the numpy DP per row.

    vs applyInPandas(score) per key group: identical numbers (same sort,
    same DP, same rounding — pinned in tests/test_timeseries.py), but the
    per-key Python/pandas group-assembly overhead — which dominates once
    keys number in the thousands and would dwarf the DP at corpus scale —
    collapses to per-batch. Keys shorter than min_len or with zero
    variance score NULL and are filtered here.

    The explicit repartition is the AQE guard (see
    session.pandas_parallelism): the packed rows are few bytes, and
    byte-based coalescing would serialize the Python scoring stage.

    ``candidate_keys``: when given (a 1-column ``_k`` frame), it is the
    AUTHORITY on which keys get scored — the series rows left-semi-join it
    before packing and the numpy-side null filter is skipped (short /
    zero-variance rows score NULL and stay VISIBLE, so a caller whose
    key-set filter disagrees with numpy's — e.g. Spark stddev_pop vs
    numpy std on a pathological series — sees a loud NULL row instead of
    a silently vanished key). Without it, numpy's own min_len/variance
    check defines the key set (the top-k contract).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    d_fields = ", ".join(f"_d{i} double" for i in range(len(bands)))

    @pandas_udf(f"n_points long, {d_fields}")
    def score_batch(xs: pd.Series) -> pd.DataFrame:
        out = {"n_points": [], **{f"_d{i}": [] for i in range(len(bands))}}
        for arr in xs:
            x = np.asarray(arr, dtype=np.float64)
            xz = _znorm_np(x) if x.size >= min_len else None
            out["n_points"].append(int(x.size))
            for i, b in enumerate(bands):
                out[f"_d{i}"].append(
                    None if xz is None else round(_dtw_np(xz, qz, b), 6)
                )
        return pd.DataFrame(out)

    # nondeterministic marker = "evaluate exactly once": the null filter
    # below otherwise gets pushed through the projection and Catalyst
    # DUPLICATES the UDF expression — two ArrowEvalPython nodes running
    # the whole DP twice per key (observed in the plan). The function is
    # in fact deterministic; the flag only pins its evaluation count.
    score_batch = score_batch.asNondeterministic()

    spark = series.sparkSession
    candidates = series.filter(F.col(key_col) != F.lit(query_key))
    if candidate_keys is not None:
        # no broadcast hint: the certificate passes its FULL key set (no
        # top-k cut, unbounded at corpus scale) — a forced broadcast would
        # collect it to the driver; AQE broadcasts small sets at runtime
        # and keeps a shuffle semi-join for large ones (the dedup.py
        # hot-set discipline)
        candidates = candidates.join(
            candidate_keys.withColumnRenamed("_k", key_col),
            key_col,
            "left_semi",
        )
    packed = (
        candidates
        # the explicit repartition BEFORE the pack is the AQE guard: the
        # agg reuses this user-specified partitioning as its one exchange
        # (REPARTITION_BY_NUM, which AQE's byte-based coalescing leaves
        # alone), so the Python scoring stage downstream keeps its
        # parallelism. Placed after the agg it would be redundant with
        # the agg's own exchange and get optimized away — leaving an
        # ENSURE_REQUIREMENTS exchange AQE would fold to one partition.
        .repartition(_pandas_parallelism(spark), key_col)
        .groupBy(F.col(key_col).alias("_k"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(time_col).alias("t"),
                            F.col(value_col).cast("double").alias("x"),
                        )
                    )
                ),
                lambda s: s["x"],
            ).alias("_xs")
        )
    )
    scored = packed.withColumn("_s", score_batch("_xs"))
    if candidate_keys is None:
        scored = scored.filter(F.col("_s._d0").isNotNull())
    return scored.select(
        "_k",
        F.col("_s.n_points").alias("n_points"),
        *[F.col(f"_s._d{i}").alias(f"_d{i}") for i in range(len(bands))],
    )


def series_dtw_topk(
    series: DataFrame,
    query_key,
    key_col: str = "user_id",
    time_col: str = "bucket",
    value_col: str = "value",
    k: int = 10,
    band: int = 10,
    min_len: int = 3,
) -> DataFrame:
    """Top-k keys by banded Dynamic Time Warping distance to the query
    key's series — the shape-matching metric for series that are locally
    stretched/shifted in time, where lockstep Pearson
    (series_similarity_topk) under-scores.

    Spark shape — the canonical custom-operator-via-Arrow path, kept off
    the row-at-a-time API:

      1. the query key's series is collected ONCE (bounded: one key's
         bucket count) and closes over the UDF as a z-normalized numpy
         array;
      2. candidate series are PACKED one-row-per-key (collect_list +
         array_sort — the same O(points) keyed shuffle any per-key
         assembly pays) and scored by an Arrow-batched scalar pandas
         UDF: one Python invocation per ~10k keys running the O(n*band)
         Sakoe-Chiba numpy DP per row (_packed_dtw_scores — replaced the
         per-key-group applyInPandas whose group-assembly overhead
         dominated once keys number in the thousands);
      3. top-k by (distance asc, key) — TakeOrdered.

    Both series are z-normalized first (scale/offset invariance, matching
    the Pearson variant). Keys shorter than ``min_len`` or with zero
    variance are dropped. ``band`` is the Sakoe-Chiba radius in buckets —
    DTW's usual accuracy/cost dial; band >= max(len) degenerates to full
    DTW (pytest-pinned against an unbanded reference DP).

    Scale: per-key cost O(len * band); the groupBy shuffles O(points)
    once (the same keyed shuffle any per-key assembly pays); the UDF
    state per key is two short arrays — no global structure, any number
    of keys streams through executors.
    """
    import numpy as np
    import pandas as pd

    q_rows = (
        series.filter(F.col(key_col) == F.lit(query_key))
        .select(time_col, value_col)
        .orderBy(time_col)
        .collect()
    )
    qv = np.array([r[1] for r in q_rows], dtype=np.float64)
    if qv.size < min_len or qv.std() == 0:
        raise ValueError(
            f"query series needs >= {min_len} points with variance; got "
            f"{qv.size} points"
        )
    qz = (qv - qv.mean()) / qv.std()

    return (
        _packed_dtw_scores(
            series, query_key, key_col, time_col, value_col,
            qz, [band], min_len,
        )
        .select(
            # the packed path carries the key as _k with its ORIGINAL type
            # (string/int/decimal keys all valid; ADVICE r5)
            F.col("_k").alias(key_col),
            "n_points",
            F.col("_d0").alias("dtw_dist"),
        )
        .orderBy("dtw_dist", key_col)
        .limit(k)
    )


def series_dtw_certificate(
    series: DataFrame,
    query_key,
    key_col: str = "user_id",
    time_col: str = "bucket",
    value_col: str = "value",
    band: int = 10,
    narrow_band: int = 2,
    min_len: int = 3,
    eps: float = 1e-5,
) -> DataFrame:
    """Per-key correctness certificate for the banded-DTW operator — the
    driver-checkable face of ``series_dtw_topk`` (the kmeans pattern: an
    iterative/non-SQL computation witnessed through exact invariants
    emitted in-plan, VERDICT r5 #6).

    Runs the REAL numpy Sakoe-Chiba DP at two band radii per key (both
    inside ONE Arrow-batched scoring pass — _packed_dtw_scores) and
    checks three mathematical invariants that hold for a correct DTW
    regardless of data:

    - ``dtw_nonneg``: distances are finite and >= 0;
    - ``band_monotone``: widening the band can only shrink the distance
      (radius ``band`` path set contains the radius ``narrow_band`` set);
    - ``dtw_within_edgepath``: the DP minimum is bounded by the cost of
      one EXPLICIT valid warping path, computed independently as a
      DataFrame aggregation — diagonal for min(n, m) steps, then the
      shorter side's last point absorbs the longer side's tail. That
      path's |i-j| never exceeds |n-m|, which the operator's effective
      band w = max(r, |n-m|) always covers, so the bound is sound for
      ANY band and unequal lengths.

    All three flags compare Spark-computed doubles with Spark-computed
    doubles (the oracle only reproduces the key set and emits literal
    TRUE), so cross-engine float drift cannot produce a spurious
    mismatch; ``eps`` absorbs the 6dp output rounding and z-norm
    fp noise.

    Returns (key, n_points, dtw_nonneg, band_monotone,
    dtw_within_edgepath) ordered by key — ALL candidate keys with
    >= min_len points and nonzero variance, no top-k cut (the key set
    must be reproducible without knowing the distances).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    # the certificate reads the (pre-aggregated, O(keys x buckets)-sized)
    # series several times — DP scoring, per-key stats, z-norm rows, the
    # spine; materialize it ONCE instead of re-running the upstream
    # aggregation per consumer
    series = series.localCheckpoint(eager=True)

    # query-side z-norm (population std, same as the operator's _znorm);
    # bounded collect: one key's series, the same pattern series_dtw_topk
    # itself uses
    q_rows = (
        series.filter(F.col(key_col) == F.lit(query_key))
        .select(time_col, value_col)
        .orderBy(time_col)
        .collect()
    )
    qv = np.array([r[1] for r in q_rows], dtype=np.float64)
    if qv.size < min_len or qv.std() == 0:
        # same contract as series_dtw_topk: an absent, too-short or
        # constant query series must fail HERE with a clear message — not
        # as an IndexError on qz[-1] or NaN-poisoned invariant flags
        raise ValueError(
            f"query series needs >= {min_len} points with variance; got "
            f"{qv.size} points"
        )
    qz = (qv - qv.mean()) / qv.std()
    q_len = int(qz.size)
    q_last = float(qz[-1])
    spark = series.sparkSession
    qz_df = spark.createDataFrame(
        [(i + 1, float(z)) for i, z in enumerate(qz)], "_pos int, _yz double"
    )

    rest = series.filter(F.col(key_col) != F.lit(query_key)).select(
        F.col(key_col).alias("_k"),
        F.col(time_col).alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    )

    stats = (
        rest.groupBy("_k")
        .agg(
            F.count("*").cast("int").alias("_n"),
            F.avg("_x").alias("_mean"),
            F.stddev_pop("_x").alias("_std"),
        )
        .filter((F.col("_n") >= min_len) & (F.col("_std") > 0))
    )

    # ONE Arrow-batched scoring pass covers BOTH bands per key
    # (_packed_dtw_scores: packed series-as-row + scalar pandas UDF — a
    # per-band applyInPandas would shuffle and re-assemble every group
    # once per band AND pay per-key Python overhead). `stats` is the
    # single authority on the certificate's key set (candidate_keys):
    # were the UDF's numpy-side variance check allowed to re-filter, a
    # Spark-vs-numpy zero-variance disagreement on a pathological series
    # would silently drop the key from one side of the scored<->bound
    # join; under the authority contract such a key scores NULL and
    # surfaces as a visible NULL-flag row instead
    scored = _packed_dtw_scores(
        series, query_key, key_col, time_col, value_col,
        qz, [band, narrow_band], min_len,
        candidate_keys=stats.select("_k"),
    ).select(
        "_k",
        "n_points",
        F.col("_d0").alias("dtw_dist"),
        F.col("_d1").alias("_dtw_narrow"),
    )

    # tie-break by value as well: the DP scores values in
    # array_sort(struct(t, x)) order, so the edge-path bound must walk the
    # SAME sequence when duplicate timestamps occur — an orderBy(_t)-only
    # row_number could permute ties and break the bound's validity
    wk = Window.partitionBy("_k").orderBy("_t", "_x")
    xz_rows = (
        rest.withColumn("_pos", F.row_number().over(wk))
        .join(stats, "_k")
        .select(
            "_k",
            "_pos",
            ((F.col("_x") - F.col("_mean")) / F.col("_std")).alias("_xz"),
        )
    )
    last_xz = xz_rows.groupBy("_k").agg(
        F.max_by("_xz", "_pos").alias("_xz_last")
    )
    # per-key position spine up to max(n, q_len): tails beyond a side's
    # length repeat that side's last z-value (the edge of the path)
    spine = stats.select(
        "_k",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("_n"), F.lit(q_len)))
        ).alias("_pos"),
    )
    bound = (
        spine.join(xz_rows, ["_k", "_pos"], "left")
        .join(F.broadcast(qz_df), "_pos", "left")
        .join(last_xz, "_k")
        .select(
            "_k",
            (
                F.coalesce(F.col("_xz"), F.col("_xz_last"))
                - F.coalesce(F.col("_yz"), F.lit(q_last))
            ).alias("_d"),
        )
        .groupBy("_k")
        .agg(F.sqrt(F.sum(F.col("_d") * F.col("_d"))).alias("_edge_bound"))
    )

    return (
        scored.join(bound, "_k")
        .withColumnRenamed("_k", key_col)
        .select(
            key_col,
            "n_points",
            (
                F.col("dtw_dist").isNotNull()
                & ~F.isnan("dtw_dist")
                & (F.col("dtw_dist") >= 0)
            ).alias("dtw_nonneg"),
            (F.col("dtw_dist") <= F.col("_dtw_narrow") + eps).alias(
                "band_monotone"
            ),
            (F.col("dtw_dist") <= F.col("_edge_bound") + eps).alias(
                "dtw_within_edgepath"
            ),
        )
        .orderBy(key_col)
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    z_thresh: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier flags via the median/MAD modified z-score
    (Iglewicz & Hoaglin's 0.6745·(x−med)/MAD rule, the standard robust
    alternative to mean/stddev z-scores — a single wild reading shifts a
    mean-based score for every row in its group, but moves the median and
    MAD not at all until half the group is wild).

    Two grouped EXACT medians (sort-based, linear interpolation — identical
    in any engine) and one broadcast join back: shuffle cost is two keyed
    aggregations on ``group_col`` plus a ≤|groups|-row broadcast, never a
    per-row window sort. The score is rounded to 6 digits BEFORE the
    threshold compare so fp noise can't flip the flag (registry
    convention). NULL values are excluded up front; a zero MAD (more than
    half the group identical) makes the score ±inf/NaN rather than an
    error — callers should treat such groups as degenerate.
    """
    e = df.filter(F.col(value_col).isNotNull()).select(
        *id_cols, group_col, value_col
    )
    med = e.groupBy(group_col).agg(F.median(value_col).alias("med"))
    stats = (
        e.join(F.broadcast(med), group_col)
        .groupBy(group_col)
        .agg(
            F.min("med").alias("med"),
            F.median(F.abs(F.col(value_col) - F.col("med"))).alias("mad"),
        )
    )
    rz = F.round(
        (F.lit(0.6745) * (F.col(value_col) - F.col("med"))) / F.col("mad"), 6
    )
    return e.join(F.broadcast(stats), group_col).select(
        *id_cols,
        group_col,
        value_col,
        "med",
        "mad",
        rz.alias("robust_z"),
        (F.abs(rz) > F.lit(z_thresh)).alias("is_outlier"),
    )


def gapfill(
    readings: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    count_col: str | None = None,
) -> DataFrame:
    """Time-bucket gap filling with LOCF and linear interpolation — the
    hypertable `time_bucket_gapfill`/`locf`/`interpolate` surface
    re-expressed as one keyed window plan.

    ``readings`` holds one row per (key, bucket) — the output of a rollup;
    this operator densifies each key's series to the full
    ``step_seconds`` grid between ITS first and last observation and fills
    the holes two ways: carry-forward (``locf_<v>``) and linear
    interpolation between the surrounding observations (``linear_<v>``,
    NULL before the first / after the last observation where no pair
    brackets the gap). ``is_gap`` marks generated rows; ``count_col`` (if
    given) zero-fills so downstream sums stay correct.

    Plan shape at scale: the grid is ``sequence()`` + ``explode`` (pure
    JVM, per-key bounded — never a driver loop or a cross join against a
    global calendar), the fills are four window functions SHARING one
    (key, bucket) sort, so the whole densify-and-fill costs one keyed
    shuffle. Interpolation fractions use naive-calendar second diffs
    (``timestampdiff`` — the DST-proof choice, the as-of join precedent)
    and the interpolated value is rounded to 6 digits (registry
    convention) while real readings pass through untouched.
    """
    from pyspark.sql import Window

    keys = [F.col(k) for k in key_cols]
    span = readings.groupBy(*keys).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.expr(f"sequence(_lo, _hi, interval {int(step_seconds)} seconds)")
        ).alias(ts_col),
    )
    g = grid.join(readings, [*key_cols, ts_col], "left")
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    w_back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(ts_col))
    locf = F.last(v, ignorenulls=True).over(w_back)
    prev_t = F.last(obs_ts, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_t = F.first(obs_ts, ignorenulls=True).over(w_fwd)
    frac = F.expr(
        f"CAST(timestampdiff(SECOND, _pt, {ts_col}) AS DOUBLE) / "
        "CAST(timestampdiff(SECOND, _pt, _nt) AS DOUBLE)"
    )
    out = (
        g.withColumn("_pt", prev_t)
        .withColumn("_nt", next_t)
        .withColumn("_lv", locf)
        .withColumn("_nv", next_v)
        .withColumn(
            f"locf_{value_col}", F.col("_lv")
        )
        .withColumn(
            f"linear_{value_col}",
            F.when(v.isNotNull(), v).otherwise(
                F.when(
                    F.col("_lv").isNotNull() & F.col("_nv").isNotNull(),
                    F.round(
                        F.col("_lv") + (F.col("_nv") - F.col("_lv")) * frac, 6
                    ),
                )
            ),
        )
        .withColumn("is_gap", v.isNull())
    )
    if count_col is not None:
        out = out.withColumn(
            count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("long")
        )
    return out.drop("_pt", "_nt", "_lv", "_nv")


def time_weighted_avg(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    decimal_type: str = "decimal(18,6)",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key time-weighted average over IRREGULAR samples — the metrics
    aggregate a plain AVG gets wrong (a value held for an hour must weigh
    3600x one held for a second): the integral of the carry-forward curve
    divided by the observed duration.

    One keyed window (lead) + one keyed aggregation. Exactness discipline:
    each value is cast to DECIMAL and multiplied by its INTEGER held-for
    MICROseconds (timestamps are micro-precision, so the diff is exact —
    second-granularity diffs are also engine-ambiguous: boundary-crossing
    counts vs truncated elapsed), so the per-key sum is EXACT in any
    partition/summation order; the final divide is the only IEEE op,
    rounded to 6 digits (the decimal->double conversion of a 38-digit sum
    can differ by an ULP across engines — registry convention).
    Keys with one sample (zero duration) return NULL, not a division
    error. Pass ``tiebreak_cols`` (a unique id) when the feed can carry
    tied timestamps per key — lead() over a tie is otherwise
    partition-arrival-dependent (the determinism-sweep class)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(tiebreak_cols or []))
    dt = F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _next_ts)")
    weighted = (
        samples.withColumn("_next_ts", F.lead(ts_col).over(w))
        .withColumn("_dt", dt.cast("long"))
        .withColumn("_wv", F.col(value_col).try_cast(decimal_type) * F.col("_dt"))
    )
    return weighted.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum("_dt").cast("long").alias("duration_us"),
        F.round(
            F.sum("_wv").cast("double") / F.sum("_dt").cast("double"), 6
        ).alias("time_weighted_avg"),
    )


def counter_deltas(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    decimal_type: str = "decimal(18,6)",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Monotonic-counter rate extraction with RESET handling (the promql
    ``increase``/timescale ``counter_agg`` semantics): per consecutive
    sample pair, the delta is ``v - prev`` when the counter grew and ``v``
    when it dropped (a drop means the process restarted and the counter
    rebuilt from zero — the post-reset reading IS the increase since).

    One keyed window (lag) + one keyed aggregation; deltas are DECIMAL
    subtractions summed exactly (order-independent), surfaced as DOUBLE at
    the end. Also reports the reset count — the ops signal itself.
    ``tiebreak_cols``: see :func:`time_weighted_avg`."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(tiebreak_cols or []))
    v = F.col(value_col).try_cast(decimal_type)
    prev = F.lag(v).over(w)
    delta = F.when(prev.isNull(), None).otherwise(
        F.when(v >= prev, v - prev).otherwise(v)
    )
    return (
        samples.withColumn("_d", delta)
        .withColumn("_reset", (prev.isNotNull() & (v < prev)).cast("long"))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum("_d").cast("double").alias("total_increase"),
            F.sum("_reset").cast("long").alias("n_resets"),
        )
    )
