"""[EXT] Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an IVF-style bucketed
variant as the scale path (probe only the query's cluster bucket instead of
the full corpus — here the corpus ships precomputed cluster labels; in a
full system a k-means step would assign them).

All math is native Spark SQL array expressions (zip_with + aggregate =
sequential double fold, deterministic) — no UDF, no driver collect. The
candidate generation is a keyed join (query×bucket), the ranking a
window partitioned by query: both shuffle-bounded, never O(corpus²).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D = "transform({c}, x -> cast(x as double))"


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({_D.format(c=a)}, {_D.format(c=b)}, (x, y) -> x * y),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "_norm",
        F.sqrt(
            F.expr(
                f"aggregate(transform({vec_col}, x -> cast(x as double) * cast(x as double)),"
                f" cast(0.0 as double), (acc, v) -> acc + v)"
            )
        ),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per query (self excluded).

    bucket_col=None → brute force (query broadcast against full corpus);
    bucket_col='label' → IVF-style: candidates restricted to the query's
    bucket (equality join on the bucket key — shuffle pruning)."""
    from ..session import spread_scan

    # the broadcast join preserves the corpus side's partitioning, so a
    # single-row-group corpus would score every pair on ONE core (r14 opt,
    # guide §2.5; no-op on parallel scans, bit-identical per pair)
    corpus = spread_scan(corpus)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
        *([F.col(bucket_col).alias("q_bucket")] if bucket_col else []),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
        *([F.col(bucket_col).alias("c_bucket")] if bucket_col else []),
    )
    if bucket_col:
        joined = c.join(F.broadcast(q), F.col("q_bucket") == F.col("c_bucket"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        # try_divide: a zero-norm vector (cosine undefined) must drop out of
        # the ranking, not raise under ANSI mode (Spark 4 default) or rank
        # FIRST as NaN (Spark orders NaN above every number)
        "cos", F.try_divide(_dot("q_vec", "c_vec"), F.col("q_norm") * F.col("c_norm"))
    ).filter(F.col("cos").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """cosine_topk with the pairwise math in an Arrow-batched pandas UDF
    (numpy einsum per batch) — the alternative hot path for wide embeddings.

    Measured (scripts/scaling_probe.py, 256k pairs x 64 dims, local[32]):
    ~1.2x the SQL fold — the interpreted higher-order fold is cheaper than
    expected and the Python worker round-trip isn't free, so at 64 dims
    either path is fine; the numpy path pulls ahead as dimensionality and
    per-pair work grow (768-4096-dim model embeddings). Results agree with
    cosine_topk to float round-off (numpy pairwise summation differs in the
    last ulps — ranks stable unless two cosines are within ~1e-13)."""
    from ..session import spread_scan

    pair_cos = _pair_cos_udf()

    corpus = spread_scan(corpus)  # see cosine_topk (r14 opt, guide §2.5)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        *([F.col(bucket_col).alias("q_bucket")] if bucket_col else []),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        *([F.col(bucket_col).alias("c_bucket")] if bucket_col else []),
    )
    if bucket_col:
        joined = c.join(F.broadcast(q), F.col("q_bucket") == F.col("c_bucket"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cos", pair_cos("q_vec", "c_vec")
    ).filter(F.col("cos").isNotNull() & ~F.isnan("cos"))  # zero-norm: see cosine_topk
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def rp_planes(n_planes: int, dim: int, offset: int = 0) -> list[list[float]]:
    """Deterministic random-hyperplane constants for sign-LSH.

    Component j of plane p derives from md5(f"rp_{offset + p}_{j}") —
    reproducible in any engine from the same literals, no RNG state. Values
    uniform in [-1, 1] with 1e-3 granularity. ``offset`` selects disjoint
    plane sets for independent LSH tables."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"rp_{offset + p}_{j}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000)
            / 1000.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def assign_rp_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 4,
    vec_col: str = "embedding",
    bucket_col: str = "rp_bucket",
    plane_offset: int = 0,
) -> DataFrame:
    """Sign-LSH bucket assignment: bit p of the bucket id = sign of
    ⟨v, plane_p⟩. The 100 TB answer to "where do blocking buckets come
    from": a narrow map-only projection (no shuffle, no training step),
    after which near-dup pair generation is an equality join on the bucket.

    Single-table sign-LSH is a candidate-generation scheme: two vectors at
    angle θ share a bucket with probability (1 − θ/π)^n_planes, so
    production recall comes from running L independent tables (L plane
    sets) and unioning candidates. The math stays a native SQL fold —
    sequential double accumulation, deterministic, oracle-checkable.
    """
    planes = rp_planes(n_planes, dim, plane_offset)
    vec_d = f"transform({vec_col}, x -> cast(x as double))"
    bucket = None
    for p, plane in enumerate(planes):
        lit = "array(" + ",".join(repr(x) + "d" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_d}, {lit}, (x, y) -> x * y),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bit = F.when(F.expr(dot) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return vectors.withColumn(bucket_col, bucket.cast("int"))


def auto_n_planes(n_rows: int, target_bucket_size: int = 64) -> int:
    """PRIMARY blocking plane count sized to a measured corpus count:
    ``ceil(log2(n_rows / target_bucket_size))``, clamped to [1, 24].

    The corpus-tracking twin of :func:`_auto_split_planes` (which sizes the
    CAP's refinement planes from the measured hottest bucket). A fixed
    primary plane count is the one remaining way the near-dup tier goes
    quadratic-ish at scale (VERDICT r7 #3): expected bucket size is
    n/2^planes, so candidates per table ≈ n·bucket/2 — at a fixed count a
    10× corpus means 10× buckets' SIZE, hence ~100× candidates (measured at
    sf1: `q_dedup_embed_rp_multi` grew ~100× at 4 fixed planes). Growing
    planes with log2(n/target) pins the EXPECTED bucket at ~target, so
    candidate volume stays ~(target/2)·n — linear in the corpus — and the
    matrix scorer's s×s gemm stays executor-sized.

    Pure arithmetic on a count the caller already has (or one cheap
    ``count()`` — parquet footer metadata at rest); deterministic, mirrored
    by the `q_rp_plane_sizing` DuckDB oracle. Clamp floor 1 keeps a tiny
    corpus in one or two buckets (the pair join is trivially safe there);
    ceiling 24 keeps the bucket id an int and is ~16M buckets — past any
    realistic blocking need (2^24 × target=64 ≈ 10^9 rows per LSH table
    before the ceiling binds).
    """
    import math

    if n_rows <= 0:
        return 1
    return min(
        24, max(1, math.ceil(math.log2(max(1.0, n_rows / target_bucket_size))))
    )


def rp_plane_sizing(vectors: DataFrame, target_bucket_size: int = 64) -> DataFrame:
    """1-row sizing report for the auto plane count: (n_rows,
    target_bucket_size, n_planes, expected_bucket_size). Runs the REAL
    resolver (:func:`auto_n_planes`) on the corpus count — the same call
    ``rp_near_dup_pairs_multi(n_planes="auto")`` makes — so a driver oracle
    over this frame verifies the shipped sizing rule, not a reimplementation.
    """
    n = vectors.count()
    p = auto_n_planes(n, target_bucket_size)
    return vectors.sparkSession.range(1).select(
        F.lit(n).cast("long").alias("n_rows"),
        F.lit(int(target_bucket_size)).alias("target_bucket_size"),
        F.lit(p).alias("n_planes"),
        (F.lit(float(n)) / F.lit(float(1 << p))).alias("expected_bucket_size"),
    )


def hot_buckets(
    vectors: DataFrame, max_bucket_size: int, bucket_col: str
) -> DataFrame:
    """(bucket, size) rows for buckets over the cap — the loud half of the
    hot-bucket guard. Run (and log/alert on) this alongside any capped
    near-dup job so dropped or split buckets are visible, not silent."""
    return (
        vectors.groupBy(bucket_col)
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def _auto_split_planes(hot: DataFrame, max_bucket_size: int) -> int:
    """Plane count sized to the MEASURED hottest bucket: ceil(log2(
    max_hot / cap)) + 1 headroom bit, clamped to [1, 16]. The SCALING.md
    round-7 lesson made the sizing rule executable: a fixed under-sized
    split leaves every sub-bucket over the cap and the residual-drop
    stage cuts the whole mode to zero recall; a corpus-tracking count
    keeps expected sub-buckets at ~cap/2. ``hot`` is any frame with a
    ``bucket_size`` column (the max is a tiny agg over ≤ n/cap rows;
    pass the materialized hot list when one exists)."""
    import math

    row = hot.agg(F.max("bucket_size")).first()[0]
    if row is None:
        return 0  # no bucket over the cap: nothing to split
    return min(16, max(1, math.ceil(math.log2(row / max_bucket_size)) + 1))


def cap_hot_buckets(
    vectors: DataFrame,
    max_bucket_size: int,
    bucket_col: str,
    dim: int | None = None,
    vec_col: str = "embedding",
    split_planes: int | str = "auto",
    plane_offset: int = 1000,
) -> DataFrame:
    """Bound every blocking bucket at ``max_bucket_size`` before a pair join.

    The skew guard for the embedding-dedup tier (the twin of the shingle
    df-cap, `dedup.py::ngram_jaccard_pairs` max_doc_freq): a within-bucket
    pair join is O(Σ bucket²), so ONE dense embedding mode — thousands of
    near-identical vectors landing in the same LSH/label bucket — turns a
    linear job quadratic at 100 TB. Two-stage, deterministic, SQL-mirrorable:

    1. **split** (``split_planes`` > 0, or ``"auto"``): rows in oversized
       buckets get a refined key ``bucket || '#' || rp_bucket`` from
       ``split_planes`` extra sign-LSH hyperplanes (disjoint
       ``plane_offset`` set) — a map-only projection that partitions a hot
       bucket into up to 2^split_planes sub-buckets while keeping
       truly-near vectors (small angle → same signs) together. Rows in
       small buckets keep their key. ``"auto"`` sizes the plane count from
       the MEASURED hottest bucket (:func:`_auto_split_planes`) — the
       corpus-tracking mode that avoids the under-sized-split footgun
       (every sub-bucket still over the cap → the whole mode residually
       dropped; SCALING.md round-7).
    2. **residual drop**: sub-buckets STILL over the cap are dropped. No
       hyperplane separates identical vectors, so splitting alone cannot
       bound a degenerate mass-duplicate mode — run exact dedup first (it
       collapses identical vectors for free) and surface what was dropped
       via :func:`hot_buckets` on the refined frame.

    Returns ``vectors`` with ``bucket_col`` replaced by the refined STRING
    key, every bucket ≤ ``max_bucket_size`` by construction. Both size scans
    move only (bucket, count), and both hot lists are MATERIALIZED once
    (localCheckpoint — the r6 bounded-intermediates rule): the capped frame
    feeds a self-join, and without materialization each side re-runs the
    full size-aggregation pipeline — measured 8 table scans instead of 4
    on q_dedup_embed_capped. A hot list is bounded by n/cap rows by
    definition (only buckets with > cap members appear), so the eager
    job is small at any corpus size; no forced broadcast (a degenerate
    input could still make it wide — AQE decides)."""
    if split_planes != 0 and dim is None:
        raise ValueError("cap_hot_buckets: dim is required unless split_planes=0")
    if split_planes == 0:
        # pure drop mode: anti-join the hot list out, key cast to string so
        # every mode returns the same key type
        hot = hot_buckets(vectors, max_bucket_size, bucket_col).select(
            bucket_col
        ).localCheckpoint()
        return vectors.join(hot, bucket_col, "left_anti").withColumn(
            bucket_col, F.col(bucket_col).cast("string")
        )
    hot = hot_buckets(vectors, max_bucket_size, bucket_col).select(
        bucket_col, "bucket_size", F.lit(True).alias("_hot")
    ).localCheckpoint()
    n_planes = (
        _auto_split_planes(hot, max_bucket_size)
        if split_planes == "auto"
        else split_planes
    )
    if n_planes == 0:  # auto, and no bucket over the cap: key-type normalize only
        return vectors.withColumn(bucket_col, F.col(bucket_col).cast("string"))
    split = assign_rp_buckets(
        vectors, dim, n_planes, vec_col, "_split", plane_offset=plane_offset
    )
    return _cap_with_split(
        split, max_bucket_size, bucket_col, hot=hot.drop("bucket_size")
    ).drop("_split")


def _cap_with_split(
    df: DataFrame,
    max_bucket_size: int,
    bucket_col: str,
    split_col: str = "_split",
    hot: DataFrame | None = None,
) -> DataFrame:
    """Refine-and-bound one bucket column, given a precomputed split key:
    rows of oversized buckets get ``bucket || '#' || split``; sub-buckets
    still over the cap are dropped. ``bucket_col`` comes back as string with
    every group ≤ ``max_bucket_size``. Shared by :func:`cap_hot_buckets`
    and the per-table capping in :func:`rp_near_dup_pairs_multi` (which
    computes ``split_col`` once and caps each table's bucket independently —
    a vector dropped from one table's degenerate bucket stays a candidate
    via the other tables). Both hot lists localCheckpointed — see
    :func:`cap_hot_buckets` (self-join consumers would re-aggregate per
    side otherwise; the lists are ≤ n/cap rows by definition). Pass a
    precomputed ``hot`` frame (bucket_col, _hot) to skip the first
    aggregation when the caller already materialized it."""
    if hot is None:
        hot = hot_buckets(df, max_bucket_size, bucket_col).select(
            bucket_col, F.lit(True).alias("_hot")
        ).localCheckpoint()
    marked = df.join(hot, bucket_col, "left")
    base_key = F.col(bucket_col).cast("string")
    refined = F.when(
        F.col("_hot"),
        F.concat(base_key, F.lit("#"), F.col(split_col).cast("string")),
    ).otherwise(base_key)
    capped = marked.withColumn(bucket_col, refined).drop("_hot")
    still_hot = hot_buckets(capped, max_bucket_size, bucket_col).select(
        bucket_col
    ).localCheckpoint()
    return capped.join(still_hot, bucket_col, "left_anti")


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    max_bucket_size: int | None = None,
    dim: int | None = None,
    split_planes: int | str = "auto",
    scorer: str = "sql",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, blocked by bucket.

    Blocking keeps the pair join O(Σ bucket²) instead of O(n²); at scale the
    bucket key comes from LSH or coarse k-means.

    ``max_bucket_size`` bounds the quadratic term per bucket via
    :func:`cap_hot_buckets` (split oversized buckets with ``split_planes``
    extra hyperplanes, drop what still exceeds the cap) — without it a dense
    embedding mode makes one bucket O(bucket²) at corpus scale.

    ``scorer="sql"`` (default, oracle-checkable bit-for-bit) enumerates
    candidate pairs and scores each with the native fold;
    ``scorer="matrix"`` is the production path for big buckets: one BLAS
    gemm per bucket via applyInPandas (:func:`_matrix_score_fn`), only
    surviving pairs leave the worker — same pairs, cosine to float
    round-off (the rp_near_dup_pairs_multi scorer contract). NULL bucket
    keys pair with nothing in either scorer (the SQL equality join is
    null-rejecting; the matrix path filters them before grouping), and
    zero-norm vectors (cosine undefined = NaN) are excluded in both —
    Spark's nonstandard NaN >= x = TRUE would otherwise keep them on the
    SQL path while numpy and DuckDB drop them."""
    if scorer not in ("sql", "matrix"):
        raise ValueError(
            f"embedding_near_dup_pairs: unknown scorer {scorer!r} "
            "(expected 'sql' or 'matrix')"
        )
    if max_bucket_size is not None:
        vectors = cap_hot_buckets(
            vectors, max_bucket_size, bucket_col, dim, vec_col, split_planes
        )
    if scorer == "matrix":
        return _matrix_pairs(
            vectors.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_v"),
                F.col(bucket_col).alias("_bk"),
            ),
            threshold,
            dict(vectors.dtypes)[id_col],
        )
    v = with_norm(vectors, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("v"), F.col("_norm").alias("n"),
        F.col(bucket_col).alias("bk"),
    )
    a = v.alias("a")
    b = v.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bk") == F.col("b.bk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        # try_divide: a zero-norm vector makes the divisor 0 — under ANSI
        # mode (Spark 4 default) a plain division RAISES, and with ANSI off
        # it yields NaN, which Spark orders GREATER than every number so
        # NaN >= threshold would pass. NULL + the filter below matches the
        # numpy/DuckDB behavior (such pairs are dropped)
        F.try_divide(_dot("a.v", "b.v"), F.col("a.n") * F.col("b.n")).alias("cos"),
    )
    return pairs.filter(F.col("cos").isNotNull() & ~F.isnan("cos")
                        & (F.col("cos") >= threshold))


def _matrix_score_fn(threshold: float):
    """Per-bucket BLAS scorer for applyInPandas groups of (_id, _v): the
    whole within-bucket similarity matrix in one gemm, only the pairs over
    ``threshold`` leave the worker. Shared by the multi-table and
    single-table near-dup near-dup matrix paths.

    Dirty-row contract (must match the SQL fold exactly): vectors of
    DIFFERENT lengths in one bucket never pair — zip_with pads the shorter
    with NULL, so the fold's dot is NULL and the pair is filtered. A
    mixed-length bucket would also crash np.stack outright, so the gemm
    runs per length group (real corpora carry truncated/empty embedding
    rows; a malformed row must cost its own pairs, not the job). Zero-norm
    vectors give 0/0 = NaN under errstate-ignore and NaN >= t is False —
    dropped, same as the fold's try_divide."""
    import numpy as np

    def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(pdf["_v"].values).astype(np.float64)
        ids = pdf["_id"].values
        norms = np.linalg.norm(x, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = (x @ x.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        with np.errstate(invalid="ignore"):
            keep = sim[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cos": sim[iu, ju][keep],
            }
        )

    def _score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        lens = pdf["_v"].map(len)
        if lens.nunique() <= 1:
            return _score_group(pdf)
        return pd.concat(
            [_score_group(g) for _, g in pdf.groupby(lens)], ignore_index=True
        )

    return _score_bucket


def _matrix_pairs(tbl: DataFrame, threshold: float, id_type: str) -> DataFrame:
    """Shared matrix-scorer plumbing over a (_id, _v, _bk) frame: drop NULL
    bucket keys (an equality self-join is null-rejecting — the scorers must
    agree, and an unfiltered NULL group would also bypass the hot-bucket
    cap straight into one giant gemm), repartition by the bucket key with
    an explicit count (AQE's byte-based coalescing would fold the small
    vector shuffle to one partition and serialize the per-bucket gemms),
    and run one BLAS gemm per group. Output schema follows the caller's id
    type — ids are compared with np.minimum/maximum, which handles ints
    and strings alike."""
    from ..session import pandas_parallelism

    return (
        # _v NOT NULL: a NULL embedding folds to bucket 0 (the sign CASE's
        # otherwise-branch), and np.stack crashes on a None row — the SQL
        # scorers drop such rows silently (NULL dot → NULL cos → filtered);
        # match them. _bk NOT NULL: equality self-joins are null-rejecting.
        tbl.filter(F.col("_bk").isNotNull() & F.col("_v").isNotNull())
        .repartition(pandas_parallelism(tbl.sparkSession), "_bk")
        .groupBy("_bk")
        .applyInPandas(
            _matrix_score_fn(threshold),
            f"id_a {id_type}, id_b {id_type}, cos double",
        )
    )


def rp_hot_bucket_report(
    vectors: DataFrame,
    dim: int,
    max_bucket_size: int,
    n_planes: int | str = "auto",
    n_tables: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """(table, bucket, bucket_size) rows for every blocking bucket the
    capped :func:`rp_near_dup_pairs_multi` would split or drop — computed
    over the SAME plane sets (offsets ``t * n_planes``), so the report
    names exactly the modes the guard acts on. The multi operator's
    internal bucket columns never leave it, so this is the loud-reporting
    companion the engine facade points callers at (run it alongside any
    capped job; empty result = the cap changed nothing).

    ``n_planes="auto"`` (default) resolves through the SAME
    ``auto_n_planes(count, target_bucket_size=max_bucket_size)`` call
    ``rp_near_dup_pairs_multi(n_planes="auto", max_bucket_size=...)``
    makes, so a default-for-default pairing reports the exact bucket ids
    the capped job blocks on (ADVICE r9: the old fixed default of 4
    silently diverged from the job's auto-resolved plane count). Pin the
    same explicit int on both calls to audit a pinned-geometry job."""
    if n_planes == "auto":
        n_planes = auto_n_planes(
            vectors.count(), target_bucket_size=max_bucket_size
        )
    elif (
        isinstance(n_planes, bool)
        or not isinstance(n_planes, int)
        or n_planes < 1
    ):
        raise ValueError(
            f"rp_hot_bucket_report: n_planes must be 'auto' or an int >= 1,"
            f" got {n_planes!r}"
        )
    bucketed = vectors
    for t in range(n_tables):
        bucketed = assign_rp_buckets(
            bucketed, dim, n_planes, vec_col, f"_bk{t}", plane_offset=t * n_planes
        )
    out = None
    for t in range(n_tables):
        h = hot_buckets(
            bucketed.select(f"_bk{t}"), max_bucket_size, f"_bk{t}"
        ).select(
            F.lit(t).alias("table"),
            F.col(f"_bk{t}").alias("bucket"),
            "bucket_size",
        )
        out = h if out is None else out.unionAll(h)
    return out


def _pair_cos_udf():
    """Arrow-batched pairwise cosine (numpy einsum) — shared by
    cosine_topk_fast and the near-dup scorers. ~30x the interpreted SQL
    fold per pair once candidates number in the millions.

    Dirty-row contract (matches the SQL fold): a pair of DIFFERENT-length
    vectors scores NaN (the fold's zip_with-padded dot is NULL) and a
    zero-norm pair scores NaN (0/0) — both are dropped by every caller's
    isNotNull/~isnan filter. A mixed-length Arrow batch would crash
    np.stack, so the einsum runs per length group; the uniform-length fast
    path is unchanged."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def _block(am, bm):
        dots = np.einsum("ij,ij->i", am, bm)
        with np.errstate(divide="ignore", invalid="ignore"):
            return dots / (np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1))

    @pandas_udf("double")
    def pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        # NULL vector → length -1: pairs with nothing (the fold's NULL dot),
        # including another NULL
        la = np.fromiter(
            (-1 if x is None else len(x) for x in a.values), np.int64, len(a)
        )
        lb = np.fromiter(
            (-1 if x is None else len(x) for x in b.values), np.int64, len(b)
        )
        if len(a) and la[0] >= 0 and (la == la[0]).all() and (lb == la[0]).all():
            return pd.Series(
                _block(
                    np.stack(a.values).astype(np.float64),
                    np.stack(b.values).astype(np.float64),
                ),
                index=a.index,
            )
        out = np.full(len(a), np.nan)
        ok = (la == lb) & (la >= 0)
        for length in np.unique(la[ok]):
            m = ok & (la == length)
            out[m] = _block(
                np.stack(a.values[m]).astype(np.float64),
                np.stack(b.values[m]).astype(np.float64),
            )
        return pd.Series(out, index=a.index)

    return pair_cos


def rp_near_dup_pairs_multi(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.3,
    n_planes: int | str = "auto",
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "sql",
    max_bucket_size: int | None = None,
    cap_split_planes: int | str = "auto",
) -> DataFrame:
    """Near-dup pairs via L independent sign-LSH tables, candidates unioned.

    One 4-plane table finds a pair at angle θ with probability (1 − θ/π)^4;
    L tables lift that to 1 − (1 − p)^L — the standard recall knob. Dataflow:
    each table's bucket is one more map-only int column on the SAME pass over
    the vectors (no extra scans); candidate generation is L equality
    self-joins unioned + a distinct on (id_a, id_b) — one keyed shuffle —
    and the exact cosine runs once per distinct candidate. At 100 TB the
    scan cost is unchanged from single-table; only the candidate volume
    (and its dedup shuffle) grows, which is the point of the knob.

    Three scorers, one contract (same pairs, cosine to float round-off):

    - ``"sql"`` — per-candidate native SQL fold; oracle-checkable
      bit-for-bit. The registered query uses this.
    - ``"numpy"`` — per-candidate Arrow einsum UDF; same dataflow, faster
      per pair, but still enumerates + ships every candidate pair.
    - ``"matrix"`` — the production scale path: applyInPandas per
      (table, bucket) computes the whole within-bucket similarity matrix
      with one BLAS gemm and emits only the pairs over threshold; the
      expensive per-pair enumeration/shuffle disappears (vectors move once
      per table, surviving pairs — not candidates — get deduped).
      Measured at 20k×64-dim / ~12M candidates on local[16]: sql 70s,
      numpy 47s, matrix 11s. Bucket size is bounded by n_planes (buckets
      ≈ n/2^planes) — grow planes with log(n) so a bucket's s×s matrix
      fits an executor (the same knob that bounds candidate counts).

    ``max_bucket_size`` (the hot-bucket guard, :func:`cap_hot_buckets`):
    expected bucket size tracks n/2^planes only for spread-out data — a
    dense embedding mode concentrates in ONE bucket of every table no
    matter how many planes, making the candidate join (and the matrix
    scorer's s×s gemm) quadratic in the mode's size. With the cap set,
    each table's oversized buckets are split by extra shared planes —
    ``cap_split_planes="auto"`` (default) sizes the count from the
    MEASURED hottest bucket across all tables (one tiny agg over the
    narrow bucket projections; :func:`_auto_split_planes`), so the split
    tracks corpus growth instead of silently under-splitting — and
    residually dropped, independently per table: a vector cut from one
    table's degenerate bucket still pairs via its other tables. Surface
    what was cut with :func:`hot_buckets`; run exact dedup upstream so
    identical vectors (unsplittable by construction) never form a mode.

    ``n_planes="auto"`` (default): size the primary plane count from the
    measured corpus — one ``count()`` then :func:`auto_n_planes` with
    target bucket ``max_bucket_size`` when the cap is set (the two knobs
    then agree: expected bucket ≈ cap, so the cap machinery only fires on
    genuine skew) else 64. A fixed count is the remaining quadratic-ish
    knob at scale: candidates/table ≈ n·(n/2^planes)/2, so 10× data at
    fixed planes is ~100× candidates (measured, SCALING.md sf1), while
    auto holds candidates ~linear in n. Pass an explicit int to pin the
    blocking geometry (oracle-mirrored queries do — the plane LITERALS
    depend on the count, which a fixed SQL string can't track).
    """
    if n_planes == "auto":
        n_planes = auto_n_planes(
            vectors.count(),
            target_bucket_size=(
                max_bucket_size if max_bucket_size is not None else 64
            ),
        )
    elif (
        isinstance(n_planes, bool)  # bool is an int subclass: True would
        or not isinstance(n_planes, int)  # silently run a 1-plane pass
        or n_planes < 1
    ):
        raise ValueError(
            f"rp_near_dup_pairs_multi: n_planes must be 'auto' or an int >= 1,"
            f" got {n_planes!r}"
        )
    if scorer not in ("sql", "numpy", "matrix"):
        raise ValueError(
            f"rp_near_dup_pairs_multi: unknown scorer {scorer!r} "
            "(expected 'sql', 'numpy' or 'matrix')"
        )
    if max_bucket_size is not None and cap_split_planes != "auto":
        if (
            isinstance(cap_split_planes, bool)
            or not isinstance(cap_split_planes, int)
            or cap_split_planes < 1
        ):
            raise ValueError(
                "rp_near_dup_pairs_multi: cap_split_planes must be >= 1 or "
                "'auto' (per-table drop-without-split is not offered — the "
                "tables themselves are the recall redundancy; to drop a "
                "mode entirely, run exact dedup upstream)"
            )
    bucketed = vectors
    for t in range(n_tables):
        bucketed = assign_rp_buckets(
            bucketed, dim, n_planes, vec_col, f"_bk{t}", plane_offset=t * n_planes
        )
    hot_by_table: list[DataFrame] = []
    if max_bucket_size is not None:
        # per-table hot lists, materialized ONCE (bounded by n/cap rows by
        # definition) and reused for BOTH the auto sizing and each table's
        # _cap_with_split — without the reuse every cap call re-ran the
        # same size aggregation over the full sign-LSH fold
        for t in range(n_tables):
            hot_by_table.append(
                hot_buckets(bucketed.select(f"_bk{t}"), max_bucket_size, f"_bk{t}")
                .withColumn("_hot", F.lit(True))
                .localCheckpoint()
            )
        if cap_split_planes == "auto":
            hot_union = None
            for h in hot_by_table:
                hs = h.select("bucket_size")
                hot_union = hs if hot_union is None else hot_union.unionAll(hs)
            n_split = _auto_split_planes(hot_union, max_bucket_size)
            if n_split == 0:
                # nothing anywhere over the cap: skip the whole guard (the
                # same short-circuit cap_hot_buckets takes) — no split
                # fold, no per-table cap jobs
                max_bucket_size = None
                hot_by_table = []
        else:
            n_split = cap_split_planes
    if max_bucket_size is not None:
        # one shared refinement key for all tables' caps: map-only, computed
        # on the same pass as the table buckets (plane set disjoint from
        # every table's — tables use offsets [0, n_tables*n_planes))
        bucketed = assign_rp_buckets(
            bucketed, dim, n_split, vec_col, "_split", plane_offset=1000
        )
    if scorer == "matrix":
        id_type = dict(vectors.dtypes)[id_col]
        per_table = None
        for t in range(n_tables):
            tbl = bucketed.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_v"),
                F.col(f"_bk{t}").alias("_bk"),
                *(["_split"] if max_bucket_size is not None else []),
            )
            if max_bucket_size is not None:
                # bound the per-group gemm: an uncapped hot bucket is an
                # executor OOM (s×s doubles), not just wasted work
                hot_t = hot_by_table[t].select(
                    F.col(f"_bk{t}").alias("_bk"), "_hot"
                )
                tbl = _cap_with_split(
                    tbl, max_bucket_size, "_bk", hot=hot_t
                ).drop("_split")
            tbl = _matrix_pairs(tbl, threshold, id_type)
            per_table = tbl if per_table is None else per_table.unionAll(tbl)
        # same pair found via several tables: keep one row (gemm bits can
        # differ in the last ulp between groups, so dedup by key, not value)
        return per_table.groupBy("id_a", "id_b").agg(F.max("cos").alias("cos"))
    # candidate generation runs on a NARROW (id, buckets) projection — the
    # self-joins and the distinct shuffle move a few ints per row, never the
    # vectors (at 64+ dims the vector payload dominates the join cost ~20:1)
    keys = bucketed.select(
        F.col(id_col),
        *[f"_bk{t}" for t in range(n_tables)],
        *(["_split"] if max_bucket_size is not None else []),
    )
    cands = None
    for t in range(n_tables):
        kt = keys.select(id_col, f"_bk{t}", *(
            ["_split"] if max_bucket_size is not None else []
        ))
        if max_bucket_size is not None:
            kt = _cap_with_split(
                kt,
                max_bucket_size,
                f"_bk{t}",
                hot=hot_by_table[t].select(f"_bk{t}", "_hot"),
            )
        a, b = kt.alias("a"), kt.alias("b")
        ct = a.join(
            b,
            (F.col(f"a._bk{t}") == F.col(f"b._bk{t}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        cands = ct if cands is None else cands.unionAll(ct)
    cands = cands.distinct()
    v = with_norm(vectors, vec_col)
    left = v.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("_norm").alias("na"),
    )
    right = v.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("_norm").alias("nb"),
    )
    joined = cands.join(left, "id_a").join(right, "id_b")
    if scorer == "numpy":
        # evaluate-once marker (the q_series_dtw lesson, plan-pinned in
        # tests/test_plan_audit.py): the threshold filter below otherwise
        # pushes through the projection and Catalyst DUPLICATES the UDF —
        # two ArrowEvalPython nodes running the einsum twice per pair
        cos = _pair_cos_udf().asNondeterministic()("va", "vb")
    else:
        # try_divide + isnan guard: see embedding_near_dup_pairs — zero-norm
        # vectors must drop, matching numpy/DuckDB/matrix semantics, not
        # raise (ANSI) or pass as NaN (Spark NaN ordering)
        cos = F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb"))
    scored = joined.select("id_a", "id_b", cos.alias("cos"))
    return scored.filter(F.col("cos").isNotNull() & ~F.isnan("cos")
                         & (F.col("cos") >= threshold))


# --- SemDeDup: cluster-then-prune semantic deduplication --------------------


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.7,
    k: int | None = None,
    target_cluster_size: int = 128,
    max_iter: int = 3,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "hash",
    keep: str = "first",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public): k-means the
    embedding space, then within each cluster prune every vector that has a
    HIGHER-PRIORITY neighbor at cosine >= ``threshold``. Returns one row
    per well-formed vector: (id_col, cent_id, keep).

    ``keep`` picks the representative rule (both total orders, so results
    are deterministic): "first" keeps the smallest id per duplicate
    neighborhood; "central" keeps the member FARTHEST from its cluster
    centroid (largest assignment distance, id tie-break) — the paper's
    rule (it keeps the LOW centroid-cosine example of each group, which
    preserves boundary/diverse examples over mode-typical ones).

    The semantic tier of the dedup ladder — exact (byte dup) →
    MinHash/n-gram (lexical near-dup) → THIS (same content, different
    words): clustering makes the O(n²) cosine comparison local, and k
    scales with the corpus (``k = ceil(n / target_cluster_size)`` when not
    given) so expected cluster size — and therefore per-cluster pair cost —
    stays CONSTANT as n grows: total work ~ n × target_cluster_size, the
    published design's linearity argument. Keep-smallest-id is the
    deterministic representative rule (the paper keeps low
    centroid-similarity examples; id order makes the result reproducible
    and oracle-checkable).

    Skew guard: a mode-collapsed embedding region can produce one huge
    cluster regardless of k. ``max_cluster_size`` opts into the module's
    :func:`cap_hot_buckets` guard on the cluster key (sign-LSH sub-split +
    residual drop, same trade as rp_near_dup_pairs: a vector separated
    from its witness by the split stays kept — dedup RECALL degrades on
    the capped mode, never correctness, and still-over-cap residues are
    dropped from pruning, i.e. kept). Run :func:`hot_buckets` on the
    result's cent_id alongside, per the capped-job convention.

    Scale shape: kmeans_fit is iterative scan + tiny keyed agg (its own
    docstring); assignment is map-only literal-folded; the pair step is a
    keyed self-join on the cluster id (never a cross join) with the cos
    fold inside; the prune set is a distinct on the loser ids. No driver
    collect beyond the k×dim centroid list. ``init`` defaults to "hash"
    (one-pass seeded-uniform sample) rather than kmeans_fit's
    farthest-first: here k GROWS with the corpus (k = n/target), and
    Gonzalez seeding is k sequential driver rounds — a 40-cluster sf0.1
    run would pay 40 scans before the first iteration. Dedup needs
    locality, not optimal inertia, so the cheap seeding is the right
    default; pass init="farthest" for small fixed k.
    """
    from .clustering import kmeans_assign, kmeans_fit

    if not (isinstance(threshold, (int, float)) and not isinstance(threshold, bool)):
        raise ValueError(f"threshold must be a number, got {threshold!r}")
    if keep not in ("first", "central"):
        raise ValueError(f"keep must be 'first' or 'central', got {keep!r}")
    # ONE grouped-size scan serves both bounded driver values (r15,
    # guide §1.2): n (k sizing — all rows, like the old count()) and the
    # modal dimensionality (same rule as clustering._dim_of: most
    # frequent positive size, ties to the larger), which kmeans_fit
    # would otherwise re-infer with its own scan.
    sizes = vectors.groupBy(F.size(vec_col).alias("d")).count().collect()
    n = sum(r["count"] for r in sizes)
    if k is None:
        import math

        if n == 0:
            return vectors.select(
                F.col(id_col),
                F.lit(0).alias("cent_id"),
                F.lit(True).alias("keep"),
            ).limit(0)
        k = max(1, math.ceil(n / target_cluster_size))
    good = [r for r in sizes if r["d"] is not None and r["d"] > 0]
    if not good:
        raise ValueError(
            f"cannot infer dimensionality of {vec_col!r}: empty input"
        )
    dim = int(
        max(good, key=lambda r: (r["count"], r["d"]))["d"]
    )
    cents, _iters = kmeans_fit(
        vectors, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col,
        init=init, dim=dim,
    )
    assigned = kmeans_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
    # priority: a vector is pruned only by a STRICTLY higher-priority
    # neighbor, so the order must be total — both rules tie-break on the
    # globally-unique id ("first": priority is just the id; "central":
    # centroid distance first, the paper's keep-low-centroid-cosine rule)
    # carry the raw ordering columns and compare them directly below —
    # an arithmetic-negation encoding (-id) would restrict id_col to
    # numeric types (ANSI CAST error on string ids), while
    # semantic_dedup_incremental already accepts any orderable id
    # the base frame feeds both sides of the self-join and the final keep
    # join — materialize once (the r6 bounded-intermediates rule for
    # reused multi-stage frames)
    tbl = with_norm(
        vectors.join(assigned.select(id_col, "cent_id", "dist"), id_col),
        vec_col,
    ).select(
        F.col(id_col),
        F.col("cent_id").cast("string").alias("cent_id"),
        F.col("dist").alias("_dist"),
        F.col(vec_col).alias("_vec"),
        "_norm",
    ).localCheckpoint()
    # capping narrows the PAIR-JOIN SOURCE only — the output base stays the
    # full corpus, so a row the guard splits away from (or residually drops
    # with) its bucket loses its witnesses and comes back KEPT, never
    # absent (dedup must return a verdict for every well-formed vector)
    pair_src = tbl
    if max_cluster_size is not None:
        pair_src = cap_hot_buckets(
            tbl,
            max_cluster_size,
            "cent_id",
            dim=dim,
            vec_col="_vec",
        ).localCheckpoint()
    a = pair_src.select(
        F.col("cent_id"),
        F.col(id_col).alias("_id_a"),
        F.col("_dist").alias("_dist_a"),
        F.col("_vec").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    b = pair_src.select(
        F.col("cent_id"),
        F.col(id_col).alias("_id_b"),
        F.col("_dist").alias("_dist_b"),
        F.col("_vec").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    # a STRICTLY outranks b — "first": smaller id wins; "central": larger
    # centroid distance wins (the paper's keep-low-centroid-cosine rule),
    # id tie-break. Both total orders, both id-type-agnostic.
    if keep == "central":
        outranks = (F.col("_dist_a") > F.col("_dist_b")) | (
            (F.col("_dist_a") == F.col("_dist_b"))
            & (F.col("_id_a") < F.col("_id_b"))
        )
    else:
        outranks = F.col("_id_a") < F.col("_id_b")
    # try_divide + NaN guard: zero-norm vectors have undefined cosine and
    # must never witness a prune (embedding_near_dup_pairs convention)
    cos = F.try_divide(_dot("_va", "_vb"), F.col("_na") * F.col("_nb"))
    pruned = (
        a.join(b, "cent_id")
        .filter(outranks)
        .select("_id_b", cos.alias("_cos"))
        .filter(F.col("_cos").isNotNull() & ~F.isnan("_cos")
                & (F.col("_cos") >= threshold))
        .select(F.col("_id_b").alias(id_col))
        .distinct()
        .withColumn("_pruned", F.lit(True))
    )
    return (
        tbl.join(pruned, id_col, "left")
        .select(
            id_col,
            "cent_id",
            F.col("_pruned").isNull().alias("keep"),
        )
    )


#: sidecar holding the trained centroids (+ layout params) of a persisted
#: semantic-dedup index. Underscore-prefixed so parquet readers ignore it.
_SEMINDEX_SIDECAR = "_pcr_semindex.json"


def semantic_index_build(
    vectors: DataFrame,
    path: str,
    k: int | None = None,
    target_cluster_size: int = 128,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "hash",
    centroids: list[list[float]] | None = None,
    overwrite_batches: bool = False,
) -> int:
    """Persist the corpus side of incremental semantic dedup: k-means the
    corpus (the :func:`semantic_dedup` sizing rule), write the vectors
    PARTITIONED BY cluster id, and stamp the trained centroids in a
    sidecar. Returns k.

    The cluster dirs make later probes partition-pruned: a batch touches
    at most |batch| clusters, so an incremental dedup reads O(touched
    clusters) of a corpus index that can hold billions of vectors — the
    same O(batch) shape as the MinHash band index
    (``dedup.lsh_band_index``), with k-means cells instead of hash bands
    as the blocking structure.

    Refit safety: the seed write only overwrites ``batch=-1``, so
    rebuilding IN PLACE over an index that has admitted ``batch=N``
    partitions would leave those rows assigned under the OLD centroids —
    duplicate/mis-routed cluster members next to the new sidecar. The
    build therefore REFUSES a path holding batch>=0 partitions unless
    ``overwrite_batches=True`` (which deletes them first); the
    no-data-loss refit is :func:`semantic_index_compact` to a NEW path.

    Layout: ``{path}/batch=-1/cent_id=K/`` — the seed corpus lives in the
    reserved ``batch=-1`` partition (the streaming/dedup.py
    snapshot-then-stream convention: micro-batch ids start at 0, and the
    stream's replay-exclusion drops the partition matching the CURRENT
    batch id, so a seed at batch=0 would be invisible to the first
    micro-batch — the round-4 probe lesson). Admission
    (:func:`semantic_index_admit`) adds ``batch=N`` partitions without
    refitting; refit + rebuild on drift is the caller's periodic
    compaction, exactly like re-clustering an IVF index.

    ``centroids`` (list of vectors, index = cent_id) skips the k-means
    fit and partitions by nearest-given-centroid instead — this IS a
    persisted IVF index (the coarse quantizer is whatever you pass, e.g.
    :func:`ivf_centroids`), served by :func:`ivf_topk_persisted`. One
    layout, two read paths: dedup probes and ANN probes both ride the
    same cluster-dir pruning."""
    from .clustering import kmeans_assign, kmeans_fit
    from .manifest_target import _fs

    # fail fast on an in-place refit over admitted batches (stale batch=N
    # rows would sit mis-assigned under the NEW centroids — ADVICE r10)
    fs0, root = _fs(vectors.sparkSession, path)
    if fs0.exists(root):
        stale = [
            st.getPath()
            for st in fs0.listStatus(root)
            if st.isDirectory()
            and st.getPath().getName().startswith("batch=")
            and st.getPath().getName() != "batch=-1"
        ]
        if stale and not overwrite_batches:
            raise ValueError(
                f"{path} already holds {len(stale)} admitted batch "
                "partition(s); rebuilding in place would strand them under "
                "the old centroids. Compact to a NEW path with "
                "semantic_index_compact, or pass overwrite_batches=True to "
                "discard the admitted batches."
            )
        for p in stale:
            fs0.delete(p, True)

    if centroids is not None:
        if not centroids:
            raise ValueError("centroids must be non-empty when given")
        cents = [list(c) for c in centroids]
        k = len(cents)
    elif k is None:
        import math

        n = vectors.count()
        if n == 0:
            raise ValueError("cannot build a semantic index from an empty corpus")
        k = max(1, math.ceil(n / target_cluster_size))
    if centroids is None:
        cents, _ = kmeans_fit(
            vectors, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col,
            init=init,
        )
    assigned = kmeans_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
    (
        vectors.join(assigned.select(id_col, "cent_id"), id_col)
        .select(id_col, vec_col, "cent_id")
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(f"{path}/batch=-1")
    )
    import json

    from .manifest_target import _fs

    doc = json.dumps(
        {
            "centroids": cents,
            "id_col": id_col,
            "vec_col": vec_col,
            "dim": len(cents[0]),
            # the index's on-disk vector type: admission CASTS batches to
            # it — mixed parquet physical types across batch files (float
            # seed + double batch) make every later read crash (found by
            # the round-10 lifecycle probe)
            "vec_type": vectors.schema[vec_col].dataType.simpleString(),
        }
    )
    fs, _ = _fs(vectors.sparkSession, path)
    _, tmp = _fs(vectors.sparkSession, f"{path}/.{_SEMINDEX_SIDECAR}.tmp")
    _, final = _fs(vectors.sparkSession, f"{path}/{_SEMINDEX_SIDECAR}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(doc.encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)
    return k


def _read_semindex_doc(spark, path: str) -> dict:
    import json

    from .manifest_target import _fs

    fs, spath = _fs(spark, f"{path}/{_SEMINDEX_SIDECAR}")
    if not fs.exists(spath):
        raise FileNotFoundError(
            f"no semantic-index sidecar at {path} — build with "
            "semantic_index_build"
        )
    stream = fs.open(spath)
    try:
        return json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()


def semantic_dedup_incremental(
    batch: DataFrame,
    path: str,
    threshold: float = 0.7,
    exclude_batch: int | None = None,
    max_cluster_members: int | None = None,
) -> DataFrame:
    """Semantic near-dup verdicts for an ingest batch WITHOUT rescanning
    the corpus: batch vectors assign to the PERSISTED centroids (the
    index's sidecar), and each compares only against (a) index members of
    its own cluster — a partition-pruned read of the touched cluster dirs
    — and (b) the batch's own members in that cluster (intra-batch dups
    arrive together). Cost O(|batch| × cluster size), never O(corpus).

    Returns one row per well-formed batch vector: (id, cent_id, keep,
    match_src ∈ corpus|batch|NULL). Index members are canonical — ANY
    corpus witness at cosine >= threshold prunes a batch vector; among
    batch-only duplicates the smallest id survives (the
    :func:`semantic_dedup` "first" rule). match_src reports the strongest
    evidence class (corpus over batch) for admission/audit pipelines; a
    kept row has NULL match_src. Admit kept rows with
    :func:`semantic_index_admit` (same contract as
    ``dedup.incremental_near_dups``).

    ``exclude_batch``: skip the index's ``batch=<exclude_batch>``
    partition at DIRECTORY-LISTING time — under an at-least-once replay
    of streaming micro-batch N the index already holds batch=N, and
    probing against it would turn every vector into a duplicate of its
    own previous admission (the streaming/dedup.py replay-exclusion
    rule, enforced here before any file is opened).

    ``max_cluster_members`` arms the hot-cluster guard: a mode-collapsed
    embedding region can put millions of corpus rows in ONE cluster,
    making every batch that touches it pay O(hot) forever. The cap keeps
    only the ``max_cluster_members`` smallest-id corpus members per
    touched cluster (deterministic; one bounded window over the touched
    members only). Same trade as ``semantic_dedup(max_cluster_size=)``:
    dropping corpus members can only LOSE witnesses, so capped verdicts
    degrade RECALL only — every capped prune still carries a genuine
    witness, and capped keep ⊇ uncapped keep (tested). Run
    :func:`semantic_index_stats` alongside to see which clusters are
    hot; refit with a larger k (or compact) to fix the layout."""
    spark = batch.sparkSession
    doc = _read_semindex_doc(spark, path)
    cents = [list(c) for c in doc["centroids"]]
    id_col, vec_col = doc["id_col"], doc["vec_col"]
    from .clustering import kmeans_assign

    assigned = kmeans_assign(batch, cents, id_col=id_col, vec_col=vec_col)
    probe = with_norm(
        batch.join(assigned.select(id_col, "cent_id"), id_col), vec_col
    ).select(
        F.col(id_col), "cent_id", F.col(vec_col).alias("_vec"), "_norm"
    ).localCheckpoint()  # feeds routing collect + two joins + final verdict
    # bounded collect: ≤ min(|batch|, k) cluster ids — the routing step,
    # same shape as manifest_target.read_keys
    touched = [r["cent_id"] for r in probe.select("cent_id").distinct().collect()]
    if not touched:
        return probe.select(
            id_col, "cent_id", F.lit(True).alias("keep"),
            F.lit(None).cast("string").alias("match_src"),
        ).limit(0)
    # list ONLY the touched cluster dirs across all admitted batch=
    # partitions (skip clusters k-means left empty): no full-table file
    # listing, and inputFiles() honestly reflects the pruned read
    # (read_keys pattern, manifest_target.py). Listing cost is
    # O(touched clusters × admitted batches), never O(index files).
    from .manifest_target import _fs

    fs, _ = _fs(spark, path)
    skip = None if exclude_batch is None else f"batch={exclude_batch}"
    touched_dirs = []
    for c in touched:
        _, gpath = _fs(spark, f"{path}/batch=*/cent_id={c}")
        for st in fs.globStatus(gpath) or []:
            batch_dir = st.getPath().getParent().getName()
            if batch_dir == skip:
                continue
            touched_dirs.append(f"{path}/{batch_dir}/cent_id={c}")
    cos = F.try_divide(_dot("_va", "_vb"), F.col("_na") * F.col("_nb"))
    p = probe.select(
        "cent_id",
        F.col(id_col).alias("_pid"),
        F.col("_vec").alias("_va"),
        F.col("_norm").alias("_na"),
    )
    b = probe.select(
        "cent_id",
        F.col(id_col).alias("_bid"),
        F.col("_vec").alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    batch_hits = (
        p.join(b, "cent_id")
        .filter(F.col("_bid") < F.col("_pid"))  # smaller batch id wins
        .select("_pid", cos.alias("_cos"))
        .filter(F.col("_cos").isNotNull() & ~F.isnan("_cos")
                & (F.col("_cos") >= threshold))
        .select("_pid")
        .distinct()
        .withColumn("_src", F.lit("batch"))
    )
    if max_cluster_members is not None and (
        isinstance(max_cluster_members, bool)
        or not isinstance(max_cluster_members, int)
        or max_cluster_members < 1
    ):
        raise ValueError(
            f"max_cluster_members must be a positive int or None, "
            f"got {max_cluster_members!r}"
        )
    all_hits = batch_hits
    if touched_dirs:
        members = spark.read.option("basePath", path).parquet(*touched_dirs)
        if max_cluster_members is not None:
            # hot-cluster guard: bounded window over TOUCHED members only
            # (smallest ids win — deterministic, replay-stable)
            cap_w = Window.partitionBy("cent_id").orderBy(id_col)
            members = (
                members.withColumn("_rn", F.row_number().over(cap_w))
                .filter(F.col("_rn") <= max_cluster_members)
                .drop("_rn")
            )
        corpus_side = with_norm(members, vec_col).select(
            F.col("cent_id"),
            F.col(vec_col).alias("_vb"),
            F.col("_norm").alias("_nb"),
        )
        corpus_hits = (
            p.join(corpus_side, "cent_id")
            .select("_pid", cos.alias("_cos"))
            .filter(F.col("_cos").isNotNull() & ~F.isnan("_cos")
                    & (F.col("_cos") >= threshold))
            .select("_pid")
            .distinct()
            .withColumn("_src", F.lit("corpus"))
        )
        all_hits = corpus_hits.unionByName(batch_hits)
    # else: every touched cluster is brand-new — no corpus competitors,
    # intra-batch dedup above still applies
    # strongest evidence class per id: corpus beats batch — explicit
    # priority (min over 0/1), not lexicographic min over the labels
    hits = all_hits.groupBy("_pid").agg(
        F.min(F.when(F.col("_src") == "corpus", 0).otherwise(1)).alias("_p")
    ).select(
        F.col("_pid").alias(id_col),
        F.when(F.col("_p") == 0, "corpus").otherwise("batch").alias("match_src"),
    )
    return probe.join(hits, id_col, "left").select(
        id_col,
        "cent_id",
        F.col("match_src").isNull().alias("keep"),
        "match_src",
    )


def semantic_index_admit(
    vectors: DataFrame,
    path: str,
    batch_id: int,
) -> int:
    """Admit vectors (typically an ingest batch's KEPT rows) into the
    persisted semantic index as the ``batch=<batch_id>`` partition.
    Returns the number admitted.

    Never refits: rows assign to the sidecar centroids — unless the frame
    already carries a ``cent_id`` column (e.g. joined back from a
    :func:`semantic_dedup_incremental` verdict), which is trusted as-is
    so the assignment isn't recomputed. Replay-idempotent by
    construction: the batch partition is written in overwrite mode, so an
    at-least-once replay rewrites the same content into the same dir
    (the streaming/dedup.py admission contract). ``batch_id`` must be a
    non-negative int — ``batch=-1`` is reserved for the
    :func:`semantic_index_build` seed."""
    if isinstance(batch_id, bool) or not isinstance(batch_id, int) or batch_id < 0:
        raise ValueError(
            f"batch_id must be a non-negative int (batch=-1 is the "
            f"reserved seed partition), got {batch_id!r}"
        )
    doc = _read_semindex_doc(vectors.sparkSession, path)
    id_col, vec_col = doc["id_col"], doc["vec_col"]
    if "cent_id" in vectors.columns:
        adm = vectors.select(id_col, vec_col, "cent_id")
    else:
        from .clustering import kmeans_assign

        cents = [list(c) for c in doc["centroids"]]
        assigned = kmeans_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
        adm = vectors.join(assigned.select(id_col, "cent_id"), id_col).select(
            id_col, vec_col, "cent_id"
        )
    vec_type = doc.get("vec_type")
    if vec_type is not None:
        # enforce the index's on-disk vector type: a double-typed batch
        # admitted into a float-typed index leaves mixed parquet physical
        # types across files, and every later read crashes (lifecycle
        # probe). Legacy sidecars without vec_type keep old behavior.
        adm = adm.withColumn(vec_col, F.col(vec_col).cast(vec_type))
    adm = adm.localCheckpoint()  # one computation for count + write
    n = adm.count()
    adm.write.mode("overwrite").partitionBy("cent_id").parquet(
        f"{path}/batch={batch_id}"
    )
    return n


def semantic_index_compact(
    spark,
    src_path: str,
    dst_path: str,
    files_per_cluster: int = 1,
) -> int:
    """Rewrite a semantic/IVF index's accumulated ``batch=N`` partitions
    into a fresh single-seed index at ``dst_path`` (batch=-1 only, at most
    ``files_per_cluster`` files per cluster dir, same sidecar centroids —
    no refit). Returns the number of rows carried over.

    The maintenance op for the incremental lifecycle: every admitted
    micro-batch adds one file per touched cluster, so a long-running
    stream makes probes open O(admitted batches) files per touched
    cluster; compaction restores O(files_per_cluster). Offline by
    design — it writes a NEW index and the caller swaps the path (the
    safe pattern on overwrite-by-rename filesystems; an in-place
    overwrite under live readers is exactly the race
    manifest_target.py's versioned commits exist to prevent, and this
    index deliberately stays manifest-free/cheap). Probe results before
    and after are identical (tested)."""
    if src_path.rstrip("/") == dst_path.rstrip("/"):
        raise ValueError("compact writes a NEW index: dst must differ from src")
    doc = _read_semindex_doc(spark, src_path)
    id_col, vec_col = doc["id_col"], doc["vec_col"]
    if isinstance(files_per_cluster, bool) or not isinstance(
        files_per_cluster, int
    ) or files_per_cluster < 1:
        raise ValueError(
            f"files_per_cluster must be a positive int, got {files_per_cluster!r}"
        )
    members = spark.read.parquet(src_path).select(id_col, vec_col, "cent_id")
    # each (cluster, salt) group lands in exactly one shuffle partition →
    # each cluster dir gets ≤ files_per_cluster files; salt only exists
    # when >1 is asked for (files_per_cluster sizes row groups for very
    # hot clusters at scale)
    if files_per_cluster == 1:
        members = members.repartition("cent_id")
    else:
        members = members.withColumn(
            "_salt", F.pmod(F.hash(id_col), F.lit(files_per_cluster))
        ).repartition("cent_id", "_salt").drop("_salt")
    members = members.localCheckpoint()  # one computation: count + write
    n = members.count()
    (
        members.write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(f"{dst_path}/batch=-1")
    )
    import json

    from .manifest_target import _fs

    fs, _ = _fs(spark, dst_path)
    _, tmp = _fs(spark, f"{dst_path}/.{_SEMINDEX_SIDECAR}.tmp")
    _, final = _fs(spark, f"{dst_path}/{_SEMINDEX_SIDECAR}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)
    return n


def semantic_index_stats(spark, path: str) -> DataFrame:
    """Per-cluster (cent_id, n_batches, n_files, n_rows, n_bytes) for a
    persisted semantic/IVF index, from parquet FOOTERS only — zero data
    IO at any index size (the ``manifest_target.bucket_stats`` shape).
    The maintenance view of the incremental lifecycle: hot clusters show
    up as row outliers (arm ``max_cluster_size`` on the batch dedup, or
    refit with a larger k), file-count/batch-count outliers mean
    :func:`semantic_index_compact` is due."""
    from .layout import footer_stats
    from .manifest_target import _fs

    _read_semindex_doc(spark, path)  # fail loud on a non-index path
    fs, _ = _fs(spark, path)
    _, gpath = _fs(spark, f"{path}/batch=*/cent_id=*/*")
    per_file: dict[str, tuple[int, str]] = {}
    for st in fs.globStatus(gpath) or []:
        p = st.getPath()
        name = p.getName()
        if name.startswith(("_", ".")):
            continue
        cent = int(p.getParent().getName().split("=", 1)[1])
        batch = p.getParent().getParent().getName()
        per_file[p.toString()] = (cent, batch)
    if not per_file:
        return spark.createDataFrame(
            [],
            "cent_id int, n_batches long, n_files long, n_rows long, "
            "n_bytes long",
        )
    stats = footer_stats(spark, list(per_file), [])
    agg: dict[int, list] = {}
    for f, per in stats.items():
        cent, batch = per_file[f]
        cur = agg.setdefault(cent, [set(), 0, 0, 0])
        cur[0].add(batch)
        cur[1] += 1
        cur[2] += per["rows"]
        cur[3] += per["bytes"]
    return spark.createDataFrame(
        [(c, len(v[0]), v[1], v[2], v[3]) for c, v in sorted(agg.items())],
        "cent_id int, n_batches long, n_files long, n_rows long, "
        "n_bytes long",
    )


def ivf_topk_persisted(
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Multi-probe IVF top-k against a PERSISTED index
    (:func:`semantic_index_build`, typically with
    ``centroids=ivf_centroids(...)`` as the coarse quantizer):
    (query_id, neighbor_id, rank, cos), value-identical to
    :func:`ivf_topk_multiprobe` over the same corpus + centroids
    (tested), but the serving shape — the in-memory variant re-assigns
    the whole corpus per call, while this reads the ingest-time
    assignment it persisted and opens ONLY the probed cluster dirs.
    Per-query-batch IO is |probed lists| × cluster size; at a
    billion-vector index a 16-query batch with nprobe=4 opens ≤64
    cluster dirs, never the corpus. Query-side math is the multiprobe
    fold (broadcast centroid ranking + exact cosine on candidates)."""
    spark = queries.sparkSession
    doc = _read_semindex_doc(spark, path)
    id_col, vec_col = doc["id_col"], doc["vec_col"]
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(doc["centroids"])],
        "cent_id int, cent array<double>",
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_q"),
    )
    probe_w = Window.partitionBy("query_id").orderBy("dist", "cent_id")
    probes = (
        qs.join(F.broadcast(cent_df))
        .withColumn("dist", _sqdist("_q", "cent"))
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "cent_id")
        .localCheckpoint()  # feeds the routing collect + candidate join
    )
    # bounded collect: ≤ n_cent cluster ids (the routing step)
    touched = sorted(
        r["cent_id"] for r in probes.select("cent_id").distinct().collect()
    )
    from .manifest_target import _fs

    fs, _ = _fs(spark, path)
    dirs = []
    for c in touched:
        _, gpath = _fs(spark, f"{path}/batch=*/cent_id={c}")
        for st in fs.globStatus(gpath) or []:
            dirs.append(f"{path}/{st.getPath().getParent().getName()}/cent_id={c}")
    empty = queries.sparkSession.createDataFrame(
        [], qs.schema
    ).select(
        "query_id",
        F.col("query_id").alias("neighbor_id"),
        F.lit(0).cast("int").alias("rank"),
        F.lit(0.0).alias("cos"),
    )
    if not dirs:
        return empty
    members = spark.read.option("basePath", path).parquet(*dirs)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    ).join(probes, "query_id")
    c = with_norm(members, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
        "cent_id",
    )
    scored = c.join(F.broadcast(q), "cent_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "cos",
        F.try_divide(_dot("q_vec", "c_vec"), F.col("q_norm") * F.col("c_norm")),
    ).filter(F.col("cos").isNotNull())  # zero-norm: see cosine_topk
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# --- centroid-based multi-probe IVF (real coarse quantizer) -----------------


def ivf_centroids(
    corpus: DataFrame,
    n_cent: int = 16,
    seed_lo: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer centroids: the ``n_cent`` corpus
    vectors with ids in [seed_lo, seed_lo + n_cent), as (cent_id, cent).

    seed_lo defaults past the conventional query range (ids < 16) so the
    quantizer is disjoint from the query set — measuring recall with
    query-derived centroids is leakage. Same dataflow note as pq_codebooks:
    production k-means refinement keeps this exact shape (broadcast
    centroids → keyed re-assign → mean-agg), and the table stays
    broadcast-sized at any corpus scale."""
    return corpus.filter(
        (F.col(id_col) >= seed_lo) & (F.col(id_col) < seed_lo + n_cent)
    ).select(
        (F.col(id_col) - seed_lo).cast("int").alias("cent_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("cent"),
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-list assignment: each vector → nearest centroid by squared
    L2 (ties to the smallest cent_id). Broadcast-join against the tiny
    centroid table + min_by hash aggregate: map-side combinable, one keyed
    shuffle on ``id_col``, no window sort. At 100 TB this runs once at
    ingest and persists as a partition/bucket column."""
    from ..session import spread_scan

    # the centroid broadcast explodes ×k on the vector side's partitioning
    # — spread a degenerate scan first (r14 opt, guide §2.5; min_by over
    # exact struct comparisons is order-independent, values unchanged)
    vectors = spread_scan(vectors)
    scored = vectors.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
    ).join(F.broadcast(centroids)).withColumn("dist", _sqdist("_v", "cent"))
    return scored.groupBy(id_col).agg(
        F.min(F.struct("dist", "cent_id")).alias("_m")
    ).select(id_col, F.col("_m.cent_id").alias("cent_id"))


def ivf_topk_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe IVF top-k: rank centroids per query, take the ``nprobe``
    nearest inverted lists, exact-cosine rank only those candidates.

    Scale shape: the probe table is |queries| × nprobe rows (broadcast);
    candidate generation is an equality join on cent_id, so each query
    scans nprobe/n_cent of the corpus instead of all of it — the knob that
    trades recall for scan fraction. All math native SQL folds."""
    assigned = corpus.join(
        ivf_assign(corpus, centroids, id_col, vec_col), id_col
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_q"),
    )
    probe_w = Window.partitionBy("query_id").orderBy("dist", "cent_id")
    probes = (
        qs.join(F.broadcast(centroids))
        .withColumn("dist", _sqdist("_q", "cent"))
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "cent_id")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    ).join(probes, "query_id")
    c = with_norm(assigned, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
        "cent_id",
    )
    scored = c.join(F.broadcast(q), "cent_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "cos", F.try_divide(_dot("q_vec", "c_vec"), F.col("q_norm") * F.col("c_norm"))
    ).filter(F.col("cos").isNotNull())  # zero-norm: see cosine_topk
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# --- product quantization (third ANN tier) ---------------------------------


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    d_sub: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebooks: (sub, cent_id, cent) — the subvectors of
    the ``k_codes`` smallest-id corpus vectors.

    A production system would run a few k-means refinement sweeps per
    subspace; the centroid *selection* step is the part that must be
    deterministic and engine-reproducible (the refinement is an optional
    quality knob with the same dataflow shape: broadcast centroids, keyed
    re-assignment, mean-agg update). Codebooks are tiny (n_sub × k_codes
    rows) — always broadcast-joined, never shuffled."""
    # well-formed seeds only: a NULL/truncated embedding among the
    # smallest-id rows would otherwise become a malformed centroid
    # (size(NULL) is NULL, so NULL embeddings drop here too)
    seeds = corpus.filter(
        (F.col(id_col) < k_codes) & (F.size(vec_col) == n_sub * d_sub)
    ).select(
        F.col(id_col).cast("int").alias("cent_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
    )
    subs = seeds.select(
        "cent_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_sub - 1}),"
                f" m -> struct(m as sub, slice(_v, m * {d_sub} + 1, {d_sub}) as cent))"
            )
        ).alias("s"),
    )
    return subs.select(F.col("s.sub").alias("sub"), "cent_id", F.col("s.cent").alias("cent"))


def _sqdist(a: str, b: str):
    """Squared L2 distance between two double arrays — sequential fold,
    deterministic across engines."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    n_sub: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes per corpus vector: (vec_id, sub, code) with
    code = argmin over centroids of subvector squared distance
    (ties broken by smallest cent_id).

    Scale shape: the corpus explodes to n_sub rows per vector
    (partition-local), broadcast-joins the tiny codebook, and the argmin is
    a min_by hash aggregate — map-side combinable, one keyed shuffle on
    (vec_id, sub), no window sort."""
    # malformed vectors (NULL / wrong length) cannot be coded — drop
    # them, identically in both encoders (agreement-tested); at corpus
    # scale a dirty row must cost itself, not the job
    subs = corpus.filter(F.size(vec_col) == n_sub * d_sub).select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_sub - 1}),"
                f" m -> struct(m as sub,"
                f" slice(transform({vec_col}, x -> cast(x as double)),"
                f" m * {d_sub} + 1, {d_sub}) as subv))"
            )
        ).alias("s"),
    ).select(id_col, F.col("s.sub").alias("sub"), F.col("s.subv").alias("subv"))
    scored = subs.join(F.broadcast(codebooks), "sub").withColumn(
        "dist", _sqdist("subv", "cent")
    )
    return scored.groupBy(id_col, "sub").agg(
        F.min(F.struct("dist", "cent_id")).alias("_m")
    ).select(id_col, "sub", F.col("_m.cent_id").alias("code"))


def pq_encode_fast(
    corpus: DataFrame,
    codebooks: DataFrame,
    n_sub: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``pq_encode`` as a single mapInPandas pass: the codebook (tiny) is
    collected once and closed over as a numpy array; each Arrow batch
    computes all subspace distances with one broadcasted-ndarray op and
    takes the argmin per (row, sub).

    This is the production encoder: MAP-ONLY (zero shuffle — pq_encode's
    explode + keyed agg disappears entirely) and vectorized (measured ~8x
    at 20k×64-dim on local[32]; the interpreted per-row fold is the cost
    being deleted). numpy argmin returns the first minimum = smallest
    cent_id, matching pq_encode's tie-break; agreement-tested exactly in
    tests/test_ann_recall.py."""
    import numpy as np

    cb = codebooks.collect()
    if not cb:
        # empty-corpus ANN degrades to an empty result set (the
        # cosine/ivf siblings' contract); an empty codebook with corpus
        # rows present would silently drop every vector — fail loud
        # instead (the pq_codebooks seed filter found no id < k_codes)
        schema = f"{id_col} long, sub integer, code integer"
        if corpus.isEmpty():
            return corpus.sparkSession.createDataFrame([], schema)
        raise ValueError(
            "pq_encode_fast: empty codebook for a non-empty corpus — "
            "pq_codebooks seeds from vectors with id < k_codes; none exist"
        )
    k_codes = max(r["cent_id"] for r in cb) + 1
    cents = np.zeros((n_sub, k_codes, d_sub), dtype=np.float64)
    for r in cb:
        cents[r["sub"], r["cent_id"]] = r["cent"]

    # distance temps are (rows, n_sub, k_codes, d_sub) — chunk the Arrow
    # batch so each temp stays <= ~8 MB. Row-chunking is value-exact (the
    # op is row-independent) and keeps every temp inside malloc's reusable
    # heap instead of a fresh mmap per batch: a full 10k-row batch
    # allocates ~130 MB of fresh pages per call, and first-touch faulting
    # of that was measured at 6-16 s (vs 0.16 s warm) on an oscillating
    # host — the q_ann_pq round-13 first-call blow-up (BASELINE.md r14)
    chunk = max(1, (1 << 23) // (n_sub * k_codes * d_sub * 8))

    def encode(batches):
        for pdf in batches:
            b = len(pdf)
            if not b:
                continue
            x = (
                np.stack(pdf[vec_col].values)
                .astype(np.float64)
                .reshape(b, n_sub, d_sub)
            )
            # inf - inf = NaN is the INTENDED dirty-vector semantics (a
            # non-finite component's distances go NaN and argmin picks an
            # arbitrary-but-deterministic code; rerank drops the row) —
            # silence numpy's per-batch RuntimeWarning about it
            codes = np.empty((b, n_sub), dtype=np.int64)
            with np.errstate(invalid="ignore", over="ignore"):
                for s in range(0, b, chunk):
                    xs = x[s : s + chunk]
                    dists = ((xs[:, :, None, :] - cents[None]) ** 2).sum(-1)
                    codes[s : s + chunk] = dists.argmin(-1)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].values, n_sub),
                    "sub": np.tile(np.arange(n_sub), b),
                    "code": codes.reshape(-1),
                }
            )

    # same malformed-row drop as pq_encode (agreement-tested): a NULL or
    # wrong-length vector would crash the batched reshape.
    # spread_scan: mapInPandas inherits the scan's partitioning, so a
    # single-row-group corpus would encode on ONE core (r14 opt, guide
    # §2.5; the encoder is row-independent — bit-identical codes)
    from ..session import spread_scan

    return (
        spread_scan(corpus.filter(F.size(vec_col) == n_sub * d_sub))
        .select(id_col, vec_col)
        .mapInPandas(encode, schema=f"{id_col} long, sub integer, code integer")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    n_sub: int = 8,
    d_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: approx dist(q, x) = Σ_sub
    ||q_sub − centroid[code_sub(x)]||², computed from the codes alone —
    the corpus vectors are never touched at query time.

    Dataflow: build the per-query distance table (queries × n_sub × k_codes
    — tiny, broadcast), hash-join it to the code table on (sub, code), and
    sum per (query, vec) — the join input is |codes| = corpus × n_sub narrow
    int rows, which is the entire point of PQ at 100 TB: the scan reads
    8 ints per vector instead of 64 floats, and memory holds codebooks only."""
    # malformed query vectors contribute no rows (the corpus-side
    # encoders drop them the same way)
    qsubs = queries.filter(F.size(vec_col) == n_sub * d_sub).select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_sub - 1}),"
                f" m -> struct(m as sub,"
                f" slice(transform({vec_col}, x -> cast(x as double)),"
                f" m * {d_sub} + 1, {d_sub}) as subv))"
            )
        ).alias("s"),
    ).select("query_id", F.col("s.sub").alias("sub"), F.col("s.subv").alias("subv"))
    dtable = qsubs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("cent_id").alias("code"),
        _sqdist("subv", "cent").alias("part_dist"),
    )
    joined = codes.withColumnRenamed(id_col, "neighbor_id").join(
        F.broadcast(dtable), ["sub", "code"]
    )
    adist = (
        joined.groupBy("query_id", "neighbor_id")
        .agg(F.sum("part_dist").alias("approx_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("approx_dist", "neighbor_id")
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "approx_dist")
    )


# --- scalar quantization (fourth ANN tier: SQ8) -----------------------------


def sq_scales(
    corpus: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[float]:
    """Per-dimension symmetric int8 scales: scale_d = max(|x_d|) / 127.

    One aggregate with ``dim`` max-abs cells (no explode — the per-dimension
    maxes reduce map-side to a single row), collected as a dim-bounded list
    (<= a few thousand doubles, the same bounded-collect class as IVF
    centroids / PQ codebooks). A zero-spread dimension gets scale 0 and
    encodes to 0 (dequantizes to 0.0 exactly).

    Symmetric max-abs is the standard int8 scheme: codes live in
    [-127, 127], dequantization is code * scale, and the scale list is the
    entire "model" — 8x smaller vectors at query time, like the published
    IVF-SQ8 index family.

    r15 shape: per-partition numpy max-abs partials via mapInPandas +
    driver combine (the kmeans M-step pattern, guide §4.2) — the old
    d-cell ``max()`` aggregate compiled a d-wide codegen'd buffer per
    call, which cost more than the whole scan at bench scale. max is
    order-independent, so the value is EXACT-identical; non-finite
    components are masked out exactly like the old per-cell
    ``when(~isnan & != inf)`` guard (an all-dirty dimension still fits
    scale 0)."""
    d = dim or _dim_of_local(corpus, vec_col)

    def fn(batches):
        import numpy as np
        import pandas as pd

        m = np.full(d, -np.inf)
        got = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # via pandas so a NULL component becomes NaN (the old per-cell
            # guard ignored NULLs exactly like NaN/Inf)
            V = np.abs(
                pd.DataFrame(pdf["_v"].tolist()).to_numpy(np.float64)
            )
            V[~np.isfinite(V)] = -np.inf  # finite components only
            m = np.maximum(m, V.max(axis=0))
            got = True
        if got:
            yield pd.DataFrame({"m": [m.tolist()]})

    parts = (
        corpus.where(F.size(vec_col) == d)
        .select(F.col(vec_col).alias("_v"))
        .mapInPandas(fn, "m array<double>")
        .collect()
    )
    import numpy as np

    m = np.full(d, -np.inf)
    for r in parts:
        m = np.maximum(m, np.asarray(r["m"], dtype=np.float64))
    # an all-dirty dimension has no finite max: scale 0 (encodes to 0)
    return [(float(x) / 127.0 if np.isfinite(x) else 0.0) for x in m]


def _dim_of_local(df: DataFrame, vec_col: str) -> int:
    from .clustering import _dim_of

    return _dim_of(df, vec_col)


def _sq_dequant_expr(vec_col: str, scales: list[float]):
    """Quantize-then-dequantize in one expression: the int8 round trip
    x -> clamp(round(x / s), ±127) * s, elementwise against the scale list
    folded in as an array literal. Map-only, whole-stage-codegen-friendly."""
    lits = ", ".join(f"cast({s!r} as double)" for s in scales)
    # non-finite components quantize to 0 (they carry no usable signal and
    # NaN would otherwise poison the whole dot product / rank first)
    return F.expr(
        f"zip_with({vec_col}, array({lits}), (x, s) -> "
        f"case when s = cast(0.0 as double) then cast(0.0 as double) "
        f"when isnan(cast(x as double)) "
        f"or abs(cast(x as double)) = double('Infinity') "
        f"then cast(0.0 as double) "
        f"else greatest(cast(-127.0 as double), least(cast(127.0 as double), "
        f"round(cast(x as double) / s))) * s end)"
    )


def sq_encode(
    corpus: DataFrame,
    scales: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8 codes per vector: (id, codes array<int>) — the persisted form.
    8x smaller than float32 on disk/in shuffle; ``sq_topk`` scores straight
    off the codes (dequantizing inline), so the full-precision vectors are
    only read by the optional exact rerank."""
    lits = ", ".join(f"cast({s!r} as double)" for s in scales)
    # non-finite components -> code 0 (ANSI would raise on a NaN -> int cast)
    codes = F.expr(
        f"zip_with({vec_col}, array({lits}), (x, s) -> "
        f"case when s = cast(0.0 as double) then 0 "
        f"when isnan(cast(x as double)) "
        f"or abs(cast(x as double)) = double('Infinity') then 0 "
        f"else cast(greatest(cast(-127.0 as double), least(cast(127.0 as double), "
        f"round(cast(x as double) / s))) as int) end)"
    )
    out = corpus.where(F.size(vec_col) == len(scales)).select(
        F.col(id_col), codes.alias("codes")
    )
    return out


def _sq_matrix_shortlist(
    c: DataFrame,
    q: DataFrame,
    k_eff: int,
) -> DataFrame:
    """Matrix-scorer pair stage shared by sq_topk / sq_topk_codes (r15 opt,
    guide §4.2): the query block (bounded — the ANN query-set class, same
    bounded-collect family as centroid lists / scale vectors) is collected
    once and folded into a mapInPandas closure over the corpus side, so the
    |q|×|corpus| pair rows are never materialized in the JVM and the
    interpreted per-pair `aggregate` fold is gone from the plan. Each task
    emits only its local top-k_eff candidates per query (top-k is a
    monotone selection: the global winners survive any per-partition
    pruning under the same total order), so the window stage downstream
    ranks |q| × k_eff × partitions rows instead of |q| × |corpus|.

    BIT-IDENTICAL to the SQL-fold scorer, not merely close: the dot
    product accumulates per dimension in array order (one vectorized
    rank-1 update per dimension — the same sequence of IEEE double
    operations as `aggregate(zip_with(...))`), the cosine is the same
    single division, and a zero divisor is dropped exactly where
    try_divide returns NULL. Inputs must carry (neighbor_id, c_vec, _scn)
    on the corpus side and (query_id, q_vec, _sqn) on the query side."""
    q_rows = q.collect()
    id_type_q = dict(q.dtypes)["query_id"]
    id_type_c = dict(c.dtypes)["neighbor_id"]
    out_schema = f"query_id {id_type_q}, neighbor_id {id_type_c}, cos double"
    if not q_rows:
        return c.sparkSession.createDataFrame([], out_schema)
    import numpy as np

    Q = np.asarray([list(r["q_vec"]) for r in q_rows], dtype=np.float64)
    qn = np.asarray([r["_sqn"] for r in q_rows], dtype=np.float64)
    qids = [r["query_id"] for r in q_rows]

    def fn(batches):
        import numpy as np
        import pandas as pd

        per_q: list[list[pd.DataFrame]] = [[] for _ in qids]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["c_vec"].to_numpy())
            cn = pdf["_scn"].to_numpy(dtype=np.float64)
            nid = pdf["neighbor_id"].to_numpy()
            # dimension-order accumulation: bit-identical to the SQL fold
            dots = np.zeros((len(pdf), len(qids)), dtype=np.float64)
            for d in range(V.shape[1]):
                dots += np.outer(V[:, d], Q[:, d])
            den = np.outer(cn, qn)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / den
            for j, qid in enumerate(qids):
                keep = (den[:, j] != 0.0) & (nid != qid)
                if not keep.any():
                    continue
                cand = pd.DataFrame(
                    {"neighbor_id": nid[keep], "cos": cos[keep, j]}
                ).sort_values(
                    ["cos", "neighbor_id"], ascending=[False, True]
                ).head(k_eff)
                per_q[j].append(cand)
        for j, qid in enumerate(qids):
            if not per_q[j]:
                continue
            best = (
                pd.concat(per_q[j], ignore_index=True)
                .sort_values(["cos", "neighbor_id"], ascending=[False, True])
                .head(k_eff)
            )
            best.insert(0, "query_id", qid)
            yield best

    return c.mapInPandas(fn, out_schema)


def sq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    scales: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    scorer: str = "matrix",
) -> DataFrame:
    """Top-k cosine neighbors scored on int8-dequantized vectors.

    Both sides run through the same quantize-dequantize expression (what a
    persisted SQ8 index stores), then the brute cosine plan: broadcast
    queries x corpus scan, sequential-fold dot product, window top-k per
    query. ``rerank > 0`` keeps the top-``rerank`` SQ candidates and
    re-scores ONLY those with exact full-precision cosine (the shortlist
    join is rerank x |queries| rows — tiny), returning exact scores with
    SQ recall. Scale shape: the scan reads 8x fewer bytes than float32
    brute force; everything else is the proven cosine_topk plan.

    Reference parity: the reference has no vector surface at all (its
    compare is row-hash equality, tools/verify_replication.py:88) — this
    tier exists for the LLM-pipeline brief; semantics follow the published
    IVF-SQ8 design.

    ``scorer="matrix"`` (default, r15 opt): pair scoring via
    :func:`_sq_matrix_shortlist` — the query block rides in a mapInPandas
    closure, no |q|×|corpus| JVM pair rows, per-partition top-k pruning;
    bit-identical cosines to ``scorer="sql"`` (the dimension-order fold is
    reproduced exactly), which stays as the agreement-tested reference
    plan (pinned in tests/test_quality.py)."""
    from ..session import spread_scan

    if scorer not in ("matrix", "sql"):
        raise ValueError(f"sq_topk: unknown scorer {scorer!r}")
    dq = lambda c: _sq_dequant_expr(c, scales)  # noqa: E731
    # spread a degenerate corpus scan before the broadcast cross join —
    # it preserves the left side's partitioning, so pair scoring would
    # otherwise run on one core (r14 opt, guide §2.5; bit-identical)
    corpus = spread_scan(corpus)
    # norms are computed ONCE PER SIDE here, not per joined pair: the
    # aggregate() fold is an interpreted higher-order expression, so leaving
    # it above the cross join re-evaluates a dim-length fold |q|x|corpus|
    # times per side (r14 opt, guide §4.1 — same doubles, the per-vector
    # fold is unchanged, only where it runs moves)
    qn_in = F.sqrt(
        F.expr(
            "aggregate(transform(q_vec, x -> x * x), cast(0.0 as double),"
            " (acc, v) -> acc + v)"
        )
    )
    cn_in = F.sqrt(
        F.expr(
            "aggregate(transform(c_vec, x -> x * x), cast(0.0 as double),"
            " (acc, v) -> acc + v)"
        )
    )
    q = (
        queries.where(F.size(vec_col) == len(scales))
        .select(F.col(id_col).alias("query_id"), dq(vec_col).alias("q_vec"))
        .select("query_id", "q_vec", qn_in.alias("_sqn"))
    )
    c = (
        corpus.where(F.size(vec_col) == len(scales))
        .select(F.col(id_col).alias("neighbor_id"), dq(vec_col).alias("c_vec"))
        .select("neighbor_id", "c_vec", cn_in.alias("_scn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    k_eff = rerank if rerank > 0 else k
    if scorer == "matrix":
        scored = _sq_matrix_shortlist(c, q, k_eff)
    else:
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                # try_divide: an all-zero (or zero-quantized) vector has no
                # cosine — drop it from the ranking rather than raise/rank NaN
                "cos",
                F.try_divide(
                    _dot("q_vec", "c_vec"), F.col("_sqn") * F.col("_scn")
                ),
            )
            .filter(F.col("cos").isNotNull())
        )
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_eff)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
    if rerank <= 0:
        return short
    # exact rerank of the SQ shortlist: shortlist is rerank x |queries| rows
    qx = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    cx = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    ex = (
        short.select("query_id", "neighbor_id")
        .join(F.broadcast(qx), "query_id")
        .join(cx, "neighbor_id")
        .withColumn(
            "cos", F.try_divide(_dot("_qv", "_cv"), F.col("_qn") * F.col("_cn"))
        )
        .filter(F.col("cos").isNotNull())
    )
    return (
        ex.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def sq_topk_codes(
    queries: DataFrame,
    codes: DataFrame,
    scales: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "matrix",
) -> DataFrame:
    """``sq_topk`` scoring straight off a PERSISTED codes table
    (``sq_encode`` output: id + array<int> codes) — the at-scale shape:
    the corpus scan reads int8 codes (parquet INT32-annotated-INT8 pages,
    RLE/dictionary-packed) instead of float32 vectors, and only the
    dim-length scale list rides along as a literal. Value-identical to
    ``sq_topk`` on the same corpus (pytest-pinned): dequantization
    (code * scale) is exact double math either way. ``scorer``: same two
    tiers as sq_topk (default "matrix", r15 opt — bit-identical
    cosines)."""
    from ..session import spread_scan

    if scorer not in ("matrix", "sql"):
        raise ValueError(f"sq_topk_codes: unknown scorer {scorer!r}")
    codes = spread_scan(codes)  # see sq_topk (r14 opt, guide §2.5)
    lits = ", ".join(f"cast({s!r} as double)" for s in scales)
    dq_codes = F.expr(
        f"zip_with(codes, array({lits}), (c, s) -> cast(c as double) * s)"
    )
    q = queries.where(F.size(vec_col) == len(scales)).select(
        F.col(id_col).alias("query_id"),
        _sq_dequant_expr(vec_col, scales).alias("q_vec"),
    )
    c = codes.where(F.size("codes") == len(scales)).select(
        F.col(id_col).alias("neighbor_id"), dq_codes.alias("c_vec")
    )
    # per-side norms BELOW the cross join (same move as sq_topk, r14 opt):
    # bit-identical per-vector fold, evaluated |side| times instead of
    # |q|x|corpus| times
    qn_in = F.sqrt(
        F.expr(
            "aggregate(transform(q_vec, x -> x * x), cast(0.0 as double),"
            " (acc, v) -> acc + v)"
        )
    )
    cn_in = F.sqrt(
        F.expr(
            "aggregate(transform(c_vec, x -> x * x), cast(0.0 as double),"
            " (acc, v) -> acc + v)"
        )
    )
    q = q.select("query_id", "q_vec", qn_in.alias("_sqn"))
    c = c.select("neighbor_id", "c_vec", cn_in.alias("_scn"))
    if scorer == "matrix":
        scored = _sq_matrix_shortlist(c, q, k)
    else:
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "cos",
                F.try_divide(
                    _dot("q_vec", "c_vec"), F.col("_sqn") * F.col("_scn")
                ),
            )
            .filter(F.col("cos").isNotNull())
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
