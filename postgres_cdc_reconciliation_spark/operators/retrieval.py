"""[EXT] Lexical + hybrid retrieval over document corpora.

BM25 (Okapi) scoring and reciprocal-rank fusion — the retrieval layer a
training-data pipeline uses for quality filtering, eval-set retrieval and
contamination checks. The reference engine has no retrieval surface; this
is part of the [EXT] LLM-data-pipeline mandate (SURVEY.md §2 D3), built on
the same determinism discipline as the rest of the engine:

- tf/df/N/dl are exact BIGINTs; avgdl is ONE double division of exact ints;
- every per-term score is a fixed-order double expression rounded at 6dp
  (measured rounding-boundary margins ~1e5× the 1-ulp cross-engine ln()
  tolerance on the test corpora);
- multi-term totals and fused scores sum a FIXED, written-order expression
  (conditional-max pivot), never a row-order-dependent SUM;
- shortlists are TakeOrdered k-row frames with rounded-score + id
  tie-breaks, so the k-cut is reproducible in any engine.

Scale shape: the per-term df table broadcasts, doc lengths join keyed, the
corpus stats ride in as a broadcast 1-row cross join; RRF fusion joins
k-row shortlists — its cost is the underlying retrievals, fusion is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 for a fixed term list: one column ``s_<term>``
    per query term (0.0 when absent, rounded at 6dp) plus ``bm25`` — the
    fixed-order total. Rows: documents matching ≥1 term."""
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    # de-dup preserving order (a repeated term would add a duplicate s_<term>
    # column and double-count the total) and reject terms that can't serve as
    # column-name fragments ('.' parses as a struct accessor in F.col, '`'
    # breaks quoting) — ADVICE r4
    terms = list(dict.fromkeys(terms))
    bad = [t for t in terms if "." in t or "`" in t]
    if bad:
        raise ValueError(
            f"bm25 terms must not contain '.' or '`' (unusable as column "
            f"fragments): {bad!r}"
        )
    tok = docs.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("token")
    )
    lens = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("dl"))
    qtok = tok.filter(F.col("token").isin(list(terms)))
    tf = qtok.groupBy(id_col, "token").agg(F.count("*").cast("long").alias("tf"))
    df = qtok.groupBy("token").agg(
        F.count_distinct(id_col).cast("long").alias("df")
    )
    stats = lens.agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    s = F.round(
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(id_col, "token", s.alias("s"))
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"s_{t}")
        for t in terms
    ]
    total = None
    for t in terms:  # fixed written order — never a row-order SUM
        col = F.col(f"s_{t}")
        total = col if total is None else total + col
    return (
        scored.groupBy(id_col)
        .agg(*per_term)
        .select(id_col, *[f"s_{t}" for t in terms], total.alias("bm25"))
    )


def rrf_fuse(
    shortlists: list[DataFrame],
    id_col: str = "doc_id",
    rank_cols: list[str] | None = None,
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked shortlists: each input holds
    (id_col, <rank_col>); output carries every rank column (NULL where a
    system didn't surface the doc) and ``rrf`` = Σ 1/(k+rank) summed in
    list order (exact 1/(k+int) terms, fixed order)."""
    if not shortlists:
        raise ValueError("rrf_fuse needs at least one shortlist")
    if rank_cols is None:
        rank_cols = [
            [c for c in sl.columns if c != id_col][0] for sl in shortlists
        ]
    fused = shortlists[0].select(id_col, rank_cols[0])
    for sl, rc in zip(shortlists[1:], rank_cols[1:]):
        fused = fused.join(sl.select(id_col, rc), id_col, "full_outer")
    score = None
    for rc in rank_cols:
        term = F.coalesce(1.0 / (F.lit(k) + F.col(rc)), F.lit(0.0))
        score = term if score is None else score + term
    return fused.select(
        id_col,
        *[F.col(rc).cast("long").alias(rc) for rc in rank_cols],
        F.round(score, 6).alias("rrf"),
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int,
    shortlist: int = 20,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 top-``shortlist`` for ``terms``
    fused (RRF, k=60) with the cosine top-``shortlist`` around the
    ``query_vec_id`` embedding; returns the fused top-``k``
    (doc_id, r_bm25, r_cos, rrf_r). Assumes embedding ids share the
    document id space (vec_id == doc_id)."""
    from pyspark.sql import Window

    from .similarity import cosine_topk

    bm = bm25_scores(docs, terms, id_col=id_col, text_col=text_col).select(
        id_col, F.round("bm25", 6).alias("bm25_r")
    )
    wb = Window.orderBy(F.desc("bm25_r"), id_col)
    bl = (
        bm.orderBy(F.desc("bm25_r"), id_col)
        .limit(shortlist)  # TakeOrdered; the window ranks only these rows
        .withColumn("r_bm25", F.row_number().over(wb))
        .select(id_col, "r_bm25")
    )
    cl = cosine_topk(
        embeddings.filter(F.col(vec_id_col) == query_vec_id),
        embeddings,
        k=shortlist,
        id_col=vec_id_col,
    ).select(F.col("neighbor_id").alias(id_col), F.col("rank").alias("r_cos"))
    fused = rrf_fuse([bl, cl], id_col=id_col, rank_cols=["r_bm25", "r_cos"])
    return (
        fused.withColumnRenamed("rrf", "rrf_r")
        .orderBy(F.desc("rrf_r"), id_col)
        .limit(k)
    )


# --- persisted inverted index (the BM25 serving path) -----------------------
#
# bm25_scores re-derives tf/df/dl from the corpus on every call — right for
# one-off scoring, wrong for a serving loop over a 100 TB corpus. The
# persisted index is the standard inverted-file layout expressed as plain
# partitioned parquet:
#
#   {path}/postings/bucket=N/   (token, doc_id, tf, dl) — token-hash routed
#   {path}/meta/                n_docs, sum_dl, n_buckets (1 row)
#   {path}/_COMMIT              build commit marker
#   {path}/delta/v=K/postings,meta,_COMMIT   — incremental admits
#
# A query term touches ONLY its hash bucket's directory (Spark partition
# pruning on the literal bucket list) — per-query IO is O(matched postings),
# never the corpus. dl is denormalized into the postings so query time never
# scans a doc-length table. Admits append under delta/v=K with the marker
# last (crash-safe: an unmarked delta is invisible); corpus stats version
# with the delta so N/avgdl stay exact. Value-identity with bm25_scores on
# the same corpus is the contract (shared scoring expression, pytest-pinned,
# same relational oracle).


def _tok_postings(docs: DataFrame, id_col: str, text_col: str, n_buckets: int):
    tok = docs.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("token")
    )
    lens = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("dl"))
    tf = tok.groupBy(id_col, "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    postings = tf.join(lens, id_col).select(
        "token",
        F.col(id_col).alias("doc_id"),
        "tf",
        "dl",
        F.pmod(F.xxhash64("token"), F.lit(n_buckets)).alias("bucket"),
    )
    stats = lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    )
    return postings, stats


def _idx_fs(spark, path: str):
    from .manifest_target import _fs

    return _fs(spark, path)


def text_index_build(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    overwrite: bool = False,
) -> dict:
    """Build the persisted inverted index; returns the meta dict.

    Refuses an already-committed index unless ``overwrite=True`` (the
    semantic_index_build refit-safety convention — silently rebuilding
    under committed deltas would strand them)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = docs.sparkSession
    fs, marker = _idx_fs(spark, f"{path}/_COMMIT")
    if fs.exists(marker):
        if not overwrite:
            raise ValueError(
                f"text index already committed at {path} — pass "
                "overwrite=True to rebuild (discards existing deltas) or "
                "admit batches via text_index_admit"
            )
        root, jroot = _idx_fs(spark, path)
        root.delete(jroot, True)
    postings, stats = _tok_postings(docs, id_col, text_col, n_buckets)
    postings.write.partitionBy("bucket").mode("overwrite").parquet(
        f"{path}/postings"
    )
    stats.select(
        "n_docs", "sum_dl", F.lit(int(n_buckets)).alias("n_buckets")
    ).write.mode("overwrite").parquet(f"{path}/meta")
    fs.create(marker, True).close()
    row = spark.read.parquet(f"{path}/meta").collect()[0]
    return {k: row[k] for k in ("n_docs", "sum_dl", "n_buckets")}


def _committed_deltas(spark, path: str) -> list[int]:
    fs, jroot = _idx_fs(spark, f"{path}/delta")
    if not fs.exists(jroot):
        return []
    out = []
    for status in fs.listStatus(jroot):
        name = status.getPath().getName()
        if name.startswith("v="):
            m = spark._jvm.org.apache.hadoop.fs.Path(
                status.getPath(), "_COMMIT"
            )
            if fs.exists(m):
                out.append(int(name[2:]))
    return sorted(out)


def _idx_meta(spark, path: str) -> dict:
    fs, marker = _idx_fs(spark, f"{path}/_COMMIT")
    if not fs.exists(marker):
        raise ValueError(f"no committed text index at {path}")
    deltas = _committed_deltas(spark, path)
    src = f"{path}/delta/v={deltas[-1]}/meta" if deltas else f"{path}/meta"
    row = spark.read.parquet(src).collect()[0]
    return {
        "n_docs": int(row["n_docs"]),
        "sum_dl": int(row["sum_dl"]),
        "n_buckets": int(row["n_buckets"]),
        "deltas": deltas,
    }


def text_index_admit(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Admit NEW documents incrementally: O(batch) work — the batch's
    postings land under ``delta/v=K`` (marker last, so a crash mid-admit
    leaves an invisible delta, never a torn index) together with the
    updated corpus stats. Contract: ids must be new to the index (an
    upsert is a rebuild — same contract as semantic_index_admit); queries
    read base + committed deltas, so admitted docs serve immediately."""
    spark = batch.sparkSession
    meta = _idx_meta(spark, path)
    v = (meta["deltas"][-1] + 1) if meta["deltas"] else 0
    postings, stats = _tok_postings(
        batch, id_col, text_col, meta["n_buckets"]
    )
    postings.write.partitionBy("bucket").mode("overwrite").parquet(
        f"{path}/delta/v={v}/postings"
    )
    stats.select(
        (F.col("n_docs") + F.lit(meta["n_docs"])).alias("n_docs"),
        (F.col("sum_dl") + F.lit(meta["sum_dl"])).alias("sum_dl"),
        F.lit(meta["n_buckets"]).alias("n_buckets"),
    ).write.mode("overwrite").parquet(f"{path}/delta/v={v}/meta")
    fs, marker = _idx_fs(spark, f"{path}/delta/v={v}/_COMMIT")
    fs.create(marker, True).close()
    return _idx_meta(spark, path)


def text_index_compact(spark, src_path: str, dst_path: str) -> dict:
    """Compact an admitted index into ``dst_path`` as a fresh committed
    base: the union of base + committed delta postings rewrites as ONE
    ``postings/bucket=*`` layout and the latest corpus stats become the
    new base meta. Query-value-identical by construction — bm25_persisted
    already reads base + deltas as a union, this just materializes it.

    Why: every ``text_index_admit`` adds a ``delta/v=K`` dir, so a probed
    bucket costs one directory open PER DELTA per query; compaction
    restores O(1) dirs per probed bucket (the admit-count vs query-wall
    curve is in SCALING.md). Same no-data-loss contract as
    ``semantic_index_compact``: the destination must be a NEW (or
    uncommitted) path — callers swap paths above; a crash mid-compact
    leaves dst uncommitted and src untouched. Returns the new meta dict.
    """
    if src_path.rstrip("/") == dst_path.rstrip("/"):
        raise ValueError("compact to a NEW path, then swap — never in place")
    fs, dst_marker = _idx_fs(spark, f"{dst_path}/_COMMIT")
    if fs.exists(dst_marker):
        raise ValueError(
            f"destination {dst_path} already holds a committed index"
        )
    meta = _idx_meta(spark, src_path)
    roots = [f"{src_path}/postings"] + [
        f"{src_path}/delta/v={v}/postings" for v in meta["deltas"]
    ]
    live = []
    for r in roots:
        _, jr = _idx_fs(spark, r)
        if fs.exists(jr):
            live.append(r)
    # each root is its own partitioned table — load separately and union
    # (multiple partition-discovery roots in one read are rejected)
    merged = None
    for r in live:
        part = spark.read.parquet(r)
        merged = part if merged is None else merged.unionByName(part)
    if merged is not None:
        # bucket is the partition column of every source dir; carrying it
        # through keeps the dst partitioning byte-cheap (no re-hash)
        merged.write.partitionBy("bucket").mode("overwrite").parquet(
            f"{dst_path}/postings"
        )
    spark.createDataFrame(
        [(meta["n_docs"], meta["sum_dl"], meta["n_buckets"])],
        "n_docs long, sum_dl long, n_buckets long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{dst_path}/meta")
    fs.create(dst_marker, True).close()
    return _idx_meta(spark, dst_path)


def bm25_persisted(
    spark,
    path: str,
    terms: list[str],
    k: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 served from the persisted index — value-identical to
    ``bm25_scores`` over the same corpus (same exact-int tf/df/N/dl, same
    fixed-order rounded expression, same pivot; pytest-pinned and answered
    by the same relational oracle).

    IO shape: the query's terms hash to their buckets (one tiny driver-side
    Spark job on the literal term list), and the postings scan reads ONLY
    those ``bucket=`` directories (partition pruning — pinned via
    inputFiles in tests). df comes from the pruned postings (exact — the
    index holds every (term, doc) pair); N/avgdl come from the latest
    committed meta row. ``k`` cuts a deterministic top-k
    (rounded-score DESC, doc_id)."""
    if not terms:
        raise ValueError("bm25_persisted needs at least one query term")
    terms = list(dict.fromkeys(terms))
    bad = [t for t in terms if "." in t or "`" in t]
    if bad:
        raise ValueError(
            f"bm25 terms must not contain '.' or '`': {bad!r}"
        )
    meta = _idx_meta(spark, path)
    # bounded driver job: |terms| rows through the SAME hash as the build
    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame(
                [(t,) for t in terms], "token string"
            )
            .select(
                F.pmod(F.xxhash64("token"), F.lit(meta["n_buckets"])).alias("b")
            )
            .collect()
        }
    )
    # open ONLY the probed bucket directories (the ivf_topk_persisted
    # convention: structural pruning, not optimizer-dependent pruning —
    # a bucket no token ever hashed to simply has no directory)
    fs, _ = _idx_fs(spark, path)
    roots = [f"{path}/postings"] + [
        f"{path}/delta/v={v}/postings" for v in meta["deltas"]
    ]
    dirs = []
    for root in roots:
        for bkt in buckets:
            p = f"{root}/bucket={bkt}"
            _, jp = _idx_fs(spark, p)
            if fs.exists(jp):
                dirs.append(p)
    if not dirs:
        # no bucket dir matched any term: the empty result must still carry
        # the index's REAL schema (doc_id may be string/int/...), or the
        # wrongly-typed empty frame breaks downstream unions/joins against
        # the non-empty shape — derive it from the persisted postings
        schema = None
        for root in roots:
            _, jr = _idx_fs(spark, root)
            if fs.exists(jr):
                try:
                    schema = spark.read.parquet(root).drop("bucket").schema
                    break
                except Exception:
                    continue  # partition dir with no readable files
        if schema is None:  # index is empty of postings entirely
            schema = "token string, doc_id long, tf long, dl long"
        postings = spark.createDataFrame([], schema)
    else:
        postings = spark.read.parquet(*dirs)
    postings = postings.where(F.col("token").isin(list(terms)))
    df = postings.groupBy("token").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    n = F.lit(meta["n_docs"]).cast("long")
    # empty index: the division would constant-fold to an ANSI
    # divide-by-zero before the (necessarily empty) postings could make it
    # moot — a NULL avgdl scores zero rows, which is the right answer
    avgdl = (
        F.lit(meta["sum_dl"]).cast("double") / F.lit(meta["n_docs"]).cast("long")
        if meta["n_docs"] > 0
        else F.lit(None).cast("double")
    )
    idf = F.log(1.0 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    s = F.round(
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / avgdl))),
        6,
    )
    scored = postings.join(F.broadcast(df), "token").select(
        "doc_id", "token", s.alias("s")
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"s_{t}")
        for t in terms
    ]
    total = None
    for t in terms:  # fixed written order — never a row-order SUM
        col = F.col(f"s_{t}")
        total = col if total is None else total + col
    out = (
        scored.groupBy("doc_id")
        .agg(*per_term)
        .select("doc_id", *[f"s_{t}" for t in terms], total.alias("bm25"))
    )
    if k is not None:
        out = out.orderBy(
            F.round("bm25", 6).desc(), F.col("doc_id").asc()
        ).limit(int(k))
    return out
