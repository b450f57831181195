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
