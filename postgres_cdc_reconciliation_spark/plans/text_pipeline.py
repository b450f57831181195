"""[EXT] Text-analysis and deduplication operators for LLM data pipelines.

These have no reference citation by definition (SURVEY.md §0, BASELINE.json
extension mandate): language-ID heuristics, quality scoring, token counting,
document fingerprinting, exact + fuzzy dedup over the `documents` table.
All hot-path logic is native Spark SQL expressions (no Python UDFs); md5 is
the cross-engine deterministic hash (identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register


def _docs(spark, sf_dir):
    # spread_scan (r14 opt, guide §2.5): the testdata doc table is one
    # parquet row group → a 1-task scan, which serializes every tokenize/
    # explode-heavy text query on one core; no-op on parallel scans.
    # Value-safe for this module: the text metrics are exact-integer /
    # per-row / per-doc-ordered-window by design.
    from ..session import spread_scan

    return spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


@register(
    "q_token_count",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              length(text) AS n_chars_measured,
              regexp_matches(text, 'spark') AS mentions_spark
       FROM documents""",
    doc="[EXT] whitespace token counting + char stats",
)
def q_token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        F.col("text").rlike("spark").alias("mentions_spark"),
    )


@register(
    "q_lang_id",
    """SELECT doc_id, lang,
              len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS en_stopword_hits,
              CASE WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) >= 2
                   THEN 'en' ELSE 'other' END AS lang_guess
       FROM documents""",
    doc="[EXT] stopword-heuristic language ID (n-gram profile stand-in)",
)
def q_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    hits = F.size(
        F.filter(F.split("text", " "), lambda w: w.isin("the", "a"))
    )
    return d.select(
        "doc_id",
        "lang",
        hits.cast("long").alias("en_stopword_hits"),
        F.when(hits >= 2, "en").otherwise("other").alias("lang_guess"),
    )


@register(
    "q_quality_score",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / len(string_split(text, ' ')) AS avg_token_len,
              CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','to','and'))) AS DOUBLE)
                / len(string_split(text, ' ')) AS stopword_ratio,
              CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000
                        AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
                            / len(string_split(text, ' ')) BETWEEN 3.0 AND 9.0
                   THEN 'keep' ELSE 'drop' END AS quality_bucket
       FROM documents""",
    doc="[EXT] quality scoring: length / avg token length / stopword ratio filters",
)
def q_quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    avg_len = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_tokens
    stop_ratio = (
        F.size(
            F.filter(toks, lambda w: w.isin("the", "a", "of", "to", "and"))
        ).cast("double")
        / n_tokens
    )
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        F.when(
            n_tokens.between(10, 1000) & avg_len.between(3.0, 9.0), "keep"
        )
        .otherwise("drop")
        .alias("quality_bucket"),
    )


@register(
    "q_fingerprint",
    """SELECT doc_id,
              md5(text) AS fp_exact,
              md5(lower(trim(text))) AS fp_normalized
       FROM documents""",
    doc="[EXT] document fingerprinting (content hash, normalize-then-hash)",
)
def q_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5("text").alias("fp_exact"),
        F.md5(F.lower(F.trim("text"))).alias("fp_normalized"),
    )


@register(
    "q_dedup_exact",
    """SELECT md5(lower(trim(text))) AS fp,
              COUNT(*) AS n_dups,
              MIN(doc_id) AS canonical_doc_id
       FROM documents
       GROUP BY 1""",
    doc="[EXT] exact dedup: hash-groupBy, keep min doc_id as canonical (map-side combine; no driver collect)",
)
def q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.lower(F.trim("text"))).alias("fp"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


# --- fuzzy dedup (MinHash-LSH, n-gram Jaccard, SimHash) --------------------

_SHINGLE_CTE = """
tokd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
         ELSE []::VARCHAR[] END)) AS shingle
  FROM tokd
)"""

_MINHASH_AGGS = ",\n    ".join(
    f"MIN(CAST('0x' || substr(md5(shingle) || md5(shingle || 'x'), {8 * s + 1}, 8) AS BIGINT)) AS h{s}"
    for s in range(8)
)
_BAND_LIST = ", ".join(
    f"concat_ws('_', {b}, h{2 * b}, h{2 * b + 1})" for b in range(4)
)


@register(
    "q_dedup_minhash",
    f"""WITH {_SHINGLE_CTE},
sig AS (
  SELECT doc_id, {_MINHASH_AGGS}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST}]) AS band FROM sig
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
GROUP BY 1, 2""",
    doc="[EXT] MinHash+LSH near-dup candidates: shingle→minhash(md5)→band→bucket equality join (shuffle on band buckets, never O(n²))",
)
def q_dedup_minhash(spark, sf_dir):
    from ..operators.dedup import lsh_candidates, minhash_signatures, shingles

    d = _docs(spark, sf_dir)
    sig = minhash_signatures(shingles(d, k=3), n_hashes=8)
    return lsh_candidates(sig, n_hashes=8, band_size=2)


@register(
    "q_dedup_ngram",
    f"""WITH {_SHINGLE_CTE},
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 100),
capped AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.common,
       CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.5""",
    doc="[EXT] exact 3-gram Jaccard near-dup via inverted-index join (keyed "
    "shuffle on shingle) with a document-frequency cap of 100 bounding "
    "hot-shingle bucket skew",
)
def q_dedup_ngram(spark, sf_dir):
    from ..operators.dedup import ngram_jaccard_pairs, shingles

    d = _docs(spark, sf_dir)
    return ngram_jaccard_pairs(shingles(d, k=3), threshold=0.5, max_doc_freq=100)


@register(
    "q_dedup_ngram_prefix",
    f"""WITH {_SHINGLE_CTE},
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 100),
capped AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM capped GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.common,
       CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.5""",
    doc="[EXT] exact 3-gram Jaccard near-dup via a PREFIX-FILTERED "
    "similarity join (SSJoin/PPJoin prefix principle — Chaudhuri et al. "
    "ICDE'06, Xiao et al. WWW'08): candidates join only on each doc's "
    "|d|-ceil(t*|d|)+1 rarest shingles (lossless for Jaccard >= t), then "
    "exact verification via array_intersect on the survivors. Same "
    "oracle as q_dedup_ngram — the two plans are value-identical "
    "(tests/test_dedup_prefix_filter.py); this one is the corpus-scale "
    "shape (measured: 1.3x faster at 50k docs, slower at 5k)",
)
def q_dedup_ngram_prefix(spark, sf_dir):
    from ..operators.dedup import ngram_jaccard_pairs, shingles

    d = _docs(spark, sf_dir)
    return ngram_jaccard_pairs(
        shingles(d, k=3), threshold=0.5, max_doc_freq=100, method="prefix"
    )


_SIMHASH_SUMS = ",\n    ".join(
    f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(16)
)
_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
)


@register(
    "q_dedup_simhash",
    f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
th AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS th FROM tok
),
agg AS (
  SELECT doc_id, {_SIMHASH_SUMS}
  FROM th GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash FROM agg""",
    doc="[EXT] 16-bit SimHash signatures (frequency-weighted, one keyed shuffle with partial agg)",
)
def q_dedup_simhash(spark, sf_dir):
    from ..operators.dedup import simhash16

    return simhash16(_docs(spark, sf_dir))


# --- similarity search over embeddings -------------------------------------

_VEC_CTE = """
v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings
)"""


@register(
    "q_ann_cosine",
    f"""WITH {_VEC_CTE},
q AS (SELECT * FROM v WHERE vec_id < 16),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e) / (q.n * c.n) AS cos
  FROM q JOIN v c ON c.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= 5""",
    doc="[EXT] brute-force cosine top-k (exact baseline): broadcast queries × corpus, native array fold, window top-k",
)
def q_ann_cosine(spark, sf_dir):
    from ..operators.similarity import cosine_topk

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 16)
    top = cosine_topk(q, v, k=5)
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cos", 4).alias("cos_r"),
    )


@register(
    "q_ann_ivf",
    f"""WITH {_VEC_CTE},
q AS (SELECT * FROM v WHERE vec_id < 16),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e) / (q.n * c.n) AS cos
  FROM q JOIN v c ON c.label = q.label AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= 5""",
    doc="[EXT] IVF-style ANN: probe only the query's cluster bucket (equality join on label = shuffle pruning; the 100 TB scale path)",
)
def q_ann_ivf(spark, sf_dir):
    from ..operators.similarity import cosine_topk

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 16)
    top = cosine_topk(q, v, k=5, bucket_col="label")
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cos", 4).alias("cos_r"),
    )


# shared by q_ann_ivf_probe (in-memory) and q_ann_ivf_persisted (persisted
# index, directory-routed reads): the two operators are value-identical by
# contract, so they answer to the SAME relational mirror
_IVF_ORACLE = """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS n
           FROM embeddings),
cent AS (SELECT CAST(vec_id - 16 AS INT) AS cent_id, e AS cent
         FROM v WHERE vec_id >= 16 AND vec_id < 32),
cdist AS (
  SELECT v.vec_id, c.cent_id,
         list_sum([ (v.e[i]-c.cent[i])*(v.e[i]-c.cent[i]) for i in range(1, 65) ]) AS dist
  FROM v, cent c),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
    FROM cdist) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
    FROM cdist WHERE vec_id < 16) WHERE rn <= 4),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e) / (q.n * c.n) AS cos
  FROM probes p
  JOIN assigned a ON a.cent_id = p.cent_id
  JOIN v c ON c.vec_id = a.vec_id
  JOIN v q ON q.vec_id = p.query_id
  WHERE c.vec_id <> p.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM ranked WHERE rank <= 5"""


@register(
    "q_ann_ivf_probe",
    _IVF_ORACLE,
    doc="[EXT] multi-probe IVF ANN with a real data-derived coarse quantizer "
    "(16 deterministic seed centroids disjoint from the query set, nearest-"
    "centroid inverted lists, 4-probe candidate scan = 1/4 of the corpus). "
    "Honest recall on the unstructured gaussian testdata (its worst case): "
    "recall@5 vs exact = 0.31-0.45 at nprobe=4, 0.68-0.73 at nprobe=8; "
    "full-probe (nprobe=16) provably equals brute force (tested). Margins at "
    "sf0.001/0.01/0.1: assign argmin gap >= 5.6e-5, probe-boundary gap >= "
    "1.2e-3 — >= 4 orders above double reorder noise.",
)
def q_ann_ivf_probe(spark, sf_dir):
    from ..operators.similarity import ivf_centroids, ivf_topk_multiprobe

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(v, n_cent=16, seed_lo=16)
    q = v.filter(F.col("vec_id") < 16)
    top = ivf_topk_multiprobe(q, v, cents, k=5, nprobe=4)
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cos", 4).alias("cos_r"),
    )


# One persisted IVF index per (session, sf_dir), removed at process exit
# (the _SEMINDEX_ROOTS idiom; same quantizer as q_ann_ivf_probe).
_IVFINDEX_ROOTS: dict[tuple[int, str], str] = {}


def _rm_ivfindex_roots() -> None:
    import shutil

    for root in _IVFINDEX_ROOTS.values():
        shutil.rmtree(root, ignore_errors=True)


def _ensure_ivfindex_root(spark, sf_dir) -> str:
    import atexit
    import tempfile

    from ..operators.similarity import ivf_centroids, semantic_index_build

    cache_key = (id(spark), sf_dir)
    root = _IVFINDEX_ROOTS.get(cache_key)
    if root is None:
        if not _IVFINDEX_ROOTS:
            atexit.register(_rm_ivfindex_roots)
        root = tempfile.mkdtemp(prefix="pcr_ivfidx_") + "/idx"
        v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        raw = [
            r["cent"]
            for r in ivf_centroids(v, n_cent=16, seed_lo=16)
            .orderBy("cent_id")
            .collect()  # bounded: n_cent=16 rows
        ]
        # a dirty corpus can plant NULL/truncated/non-finite seed vectors
        # (the in-memory probe tolerates them — NULL dists never win the
        # argmin); a PERSISTED quantizer drops them instead, same
        # recall-only trade as every other dirty-row rule
        import math

        good = [
            c for c in raw
            if c is not None
            and all(x is not None and math.isfinite(x) for x in c)
        ]
        if good:
            sizes = sorted(len(c) for c in good)
            modal = max(set(sizes), key=lambda s: (sizes.count(s), -s))
            good = [c for c in good if len(c) == modal]
        semantic_index_build(v, root, centroids=good)
        _IVFINDEX_ROOTS[cache_key] = root
    return root


@register(
    "q_ann_ivf_persisted",
    _IVF_ORACLE,
    doc="[EXT] multi-probe IVF ANN served from a PERSISTED index "
    "(operators/similarity.py::semantic_index_build with the same 16 "
    "deterministic seed centroids as q_ann_ivf_probe, then "
    "ivf_topk_persisted): the corpus is assigned ONCE at build time and "
    "written PARTITIONED BY inverted list; each query batch ranks the "
    "sidecar centroids and opens ONLY its nprobe probed cluster dirs — "
    "per-call IO is probed-lists × cluster size, never the corpus (the "
    "serving shape at 100 TB; the in-memory q_ann_ivf_probe re-assigns "
    "the corpus per call). Value-identical to q_ann_ivf_probe by "
    "contract — both answer to the SAME relational oracle; the "
    "pruned-read property is pinned in tests/test_similarity_fast.py.",
)
def q_ann_ivf_persisted(spark, sf_dir):
    from ..operators.similarity import ivf_topk_persisted

    root = _ensure_ivfindex_root(spark, sf_dir)
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 16)
    top = ivf_topk_persisted(q, root, k=5, nprobe=4)
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cos", 4).alias("cos_r"),
    )


@register(
    "q_ann_pq_rerank",
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS n
           FROM embeddings),
cent AS (
  SELECT m AS sub, CAST(vec_id AS INT) AS cent_id, e[m*2+1 : m*2+2] AS cent
  FROM v, range(32) t(m) WHERE vec_id < 64),
subs AS (
  SELECT vec_id, m AS sub, e[m*2+1 : m*2+2] AS subv
  FROM v, range(32) t(m)),
scored AS (
  SELECT s.vec_id, s.sub, c.cent_id,
         list_sum([ (s.subv[i]-c.cent[i])*(s.subv[i]-c.cent[i]) for i in range(1, 3) ])
           AS dist
  FROM subs s JOIN cent c ON s.sub = c.sub),
codes AS (
  SELECT vec_id, sub, cent_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cent_id) AS rn
    FROM scored) WHERE rn = 1),
dtable AS (
  SELECT vec_id AS query_id, sub, cent_id AS code, dist AS part_dist
  FROM scored WHERE vec_id < 16),
adist AS (
  SELECT d.query_id, co.vec_id AS neighbor_id, SUM(d.part_dist) AS approx_dist
  FROM codes co JOIN dtable d ON d.sub = co.sub AND d.code = co.code
  WHERE d.query_id <> co.vec_id
  GROUP BY 1, 2),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                ORDER BY approx_dist, neighbor_id) AS arank
    FROM adist) WHERE arank <= 20),
reranked AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(q.e, c.e) / (q.n * c.n) AS cos
  FROM shortlist s
  JOIN v q ON q.vec_id = s.query_id
  JOIN v c ON c.vec_id = s.neighbor_id)
SELECT query_id, neighbor_id, rank, cos_r FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
         round(cos, 4) AS cos_r
  FROM reranked) WHERE rank <= 5""",
    doc="[EXT] the production ANN pattern: PQ ADC shortlist (top-20 from "
    "codes alone — 8x-compressed scan) then EXACT cosine rerank of only "
    "20 candidates per query. Measured: the shortlist captures 0.975+ of "
    "the exact top-5, so reranked quality ~ exact at a fraction of the "
    "scan cost. ADC rank-20/21 boundary gap >= 9.3e-5 at all sfs "
    "(engine-stable shortlist); rerank margins are the q_ann_cosine ones.",
)
def q_ann_pq_rerank(spark, sf_dir):
    from ..operators.similarity import (
        cosine_topk,
        pq_codebooks,
        pq_encode_fast,
        pq_topk,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(v, n_sub=32, d_sub=2, k_codes=64)
    # map-only numpy encoder — exact agreement with the fold encoder is
    # pytest-gated, so the oracle comparison is unaffected
    codes = pq_encode_fast(v, books, n_sub=32, d_sub=2)
    q = v.filter(F.col("vec_id") < 16)
    short = pq_topk(q, codes, books, k=20, n_sub=32, d_sub=2)
    # exact rerank restricted to shortlist pairs: join back the vectors,
    # recompute true cosine, window top-5
    from ..operators.similarity import _dot, with_norm
    from pyspark.sql import Window

    vn = with_norm(v)
    qside = vn.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    cside = vn.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    reranked = (
        short.select("query_id", "neighbor_id")
        .join(F.broadcast(qside), "query_id")
        .join(cside, "neighbor_id")
        .withColumn(
            # try_divide + drop: a zero-norm vector's 0/0 raises under ANSI
            # and ranks FIRST with ANSI off (NaN orders above every number)
            # — same contract as cosine_topk (no zero vectors in testdata,
            # so oracle values are bit-unchanged)
            "cos",
            F.try_divide(_dot("q_vec", "c_vec"), F.col("q_norm") * F.col("c_norm")),
        )
        .filter(F.col("cos").isNotNull() & ~F.isnan("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos", 4).alias("cos_r"),
        )
    )


@register(
    "q_dedup_embed",
    f"""WITH {_VEC_CTE}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e) / (a.n * b.n), 4) AS cos_r
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.35""",
    doc="[EXT] embedding-cosine near-dup pairs, blocked by cluster label (O(Σ bucket²), not O(n²)). "
    "Threshold 0.35 picked so the testdata yields non-trivial pairs at every sf "
    "(max pairwise cosine there is ~0.47; nearest pair is >5e-5 from the cut, so "
    "engine float-noise can't flip membership).",
)
def q_dedup_embed(spark, sf_dir):
    from ..operators.similarity import embedding_near_dup_pairs

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_dup_pairs(v, threshold=0.35)
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))


@register(
    "q_dedup_embed_matrix",
    f"""WITH {_VEC_CTE}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e) / (a.n * b.n), 4) AS cos_r
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.35""",
    doc="[EXT] q_dedup_embed through the PRODUCTION scorer: one BLAS gemm "
    "per blocking bucket via applyInPandas (scorer='matrix'), only "
    "surviving pairs leave the worker — same oracle as the SQL-fold twin, "
    "so the driver independently witnesses that the vectorized path and "
    "DuckDB agree. Float-safety measured: every kept cosine sits >= 2.4e-6 "
    "from its nearest 4dp rounding half-boundary and >= 4.8e-4 from the "
    "0.35 threshold at sf0.01 (engine-noise ~1e-13 — no flip possible).",
)
def q_dedup_embed_matrix(spark, sf_dir):
    from ..operators.similarity import embedding_near_dup_pairs

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_dup_pairs(v, threshold=0.35, scorer="matrix")
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))


def _rp_bucket_sql(n_planes: int = 4, dim: int = 64, offset: int = 0) -> str:
    """DuckDB expression for the sign-LSH bucket — the SAME plane literals
    the Spark operator embeds (generated from one Python source of truth)."""
    from ..operators.similarity import rp_planes

    planes = rp_planes(n_planes, dim, offset)
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ",".join(repr(x) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(e, {lit}) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _capped_embed_oracle(cap: int = 40) -> str:
    split = _rp_bucket_sql(2, 64, 1000)  # cap_hot_buckets' split-plane set
    return f"""WITH {_VEC_CTE},
b AS (SELECT vec_id, e, n, label AS bk FROM v),
hot AS (SELECT bk FROM b GROUP BY bk HAVING count(*) > {cap}),
r AS (SELECT vec_id, e, n,
        CASE WHEN bk IN (SELECT bk FROM hot)
             THEN bk::VARCHAR || '#' || ({split})::VARCHAR
             ELSE bk::VARCHAR END AS bk2
      FROM b),
still AS (SELECT bk2 FROM r GROUP BY bk2 HAVING count(*) > {cap}),
kept AS (SELECT * FROM r WHERE bk2 NOT IN (SELECT bk2 FROM still))
SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       round(list_dot_product(a.e, b2.e) / (a.n * b2.n), 4) AS cos_r
FROM kept a JOIN kept b2 ON a.bk2 = b2.bk2 AND a.vec_id < b2.vec_id
WHERE list_dot_product(a.e, b2.e) / (a.n * b2.n) >= 0.35"""


@register(
    "q_dedup_embed_capped",
    _capped_embed_oracle(),
    doc="[EXT] q_dedup_embed with the hot-bucket guard live (max_bucket_size=40): "
    "label buckets over the cap are split by 2 extra sign-LSH planes "
    "(offset-1000 set, disjoint from every blocking table's), sub-buckets "
    "still over the cap dropped — bounds the within-bucket pair join at "
    "O(buckets x cap^2) instead of O(hottest-bucket^2), the skew guard a "
    "dense embedding mode needs at 100 TB (VERDICT r6 #1; the twin of the "
    "ngram df-cap). Cap 40 < every sf0.01 label bucket (50-59 rows), so the "
    "split path is exercised at oracle scale; split-plane sign margins "
    ">= 3.0e-4 at sf0.001/0.01/0.1 — bucket keys engine-stable.",
)
def q_dedup_embed_capped(spark, sf_dir):
    from ..operators.similarity import embedding_near_dup_pairs

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_near_dup_pairs(
        v, threshold=0.35, max_bucket_size=40, dim=64, split_planes=2
    )  # plane count pinned: the oracle mirrors exactly 2 split planes
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))


@register(
    "q_dedup_embed_rp",
    f"""WITH {_VEC_CTE},
b AS (SELECT vec_id, e, n, {_rp_bucket_sql()} AS bk FROM v)
SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       round(list_dot_product(a.e, b2.e) / (a.n * b2.n), 4) AS cos_r
FROM b a JOIN b b2 ON a.bk = b2.bk AND a.vec_id < b2.vec_id
WHERE list_dot_product(a.e, b2.e) / (a.n * b2.n) >= 0.3""",
    doc="[EXT] embedding near-dup pairs blocked by random-hyperplane sign-LSH "
    "buckets computed IN the plan (no precomputed labels — the 100 TB "
    "blocking path; single table here, production unions L plane sets for "
    "recall). Sign margins in the testdata are ≥4e-5 per plane, far above "
    "fold-order float noise, so bucket ids are engine-stable. Scored via "
    "the production matrix path (one gemm per bucket) — pair sets are "
    "identical to the SQL fold and the min 4dp-rounding half-boundary "
    "margin is 7.6e-9 at sf0.1 vs ~3e-16 scorer noise, so the DuckDB "
    "oracle (SQL fold) cannot diverge.",
)
def q_dedup_embed_rp(spark, sf_dir):
    from ..operators.similarity import assign_rp_buckets, embedding_near_dup_pairs

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bucketed = assign_rp_buckets(v, dim=64, n_planes=4)
    pairs = embedding_near_dup_pairs(
        bucketed, threshold=0.3, bucket_col="rp_bucket", scorer="matrix"
    )
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))


def _rp_multi_oracle(n_tables: int = 4, n_planes: int = 4) -> str:
    bcols = ", ".join(
        f"{_rp_bucket_sql(n_planes, 64, t * n_planes)} AS bk{t}"
        for t in range(n_tables)
    )
    unions = "\nUNION\n".join(
        f"SELECT a.vec_id AS id_a, b2.vec_id AS id_b FROM b a "
        f"JOIN b b2 ON a.bk{t} = b2.bk{t} AND a.vec_id < b2.vec_id"
        for t in range(n_tables)
    )
    return f"""WITH {_VEC_CTE},
b AS (SELECT vec_id, e, n, {bcols} FROM v),
cand AS ({unions})
SELECT c.id_a, c.id_b,
       round(list_dot_product(x.e, y.e) / (x.n * y.n), 4) AS cos_r
FROM cand c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
WHERE list_dot_product(x.e, y.e) / (x.n * y.n) >= 0.3"""


@register(
    "q_dedup_embed_rp_multi",
    _rp_multi_oracle(),
    doc="[EXT] multi-table sign-LSH near-dup pairs: 4 independent 4-plane "
    "tables, candidates unioned + distinct, exact cosine verification — the "
    "production recall knob (1 table finds a pair with prob p, L tables with "
    "1-(1-p)^L). Measured on testdata at threshold 0.3: recall vs brute "
    "force 0.14 (L=1) -> 0.45-0.47 (L=4) -> 0.71-0.72 (L=8), false-positive "
    "rate 0 at every L (exact verification step). All 16 plane sign margins "
    ">= 1.9e-5 at sf0.001/0.01/0.1 — bucket ids engine-stable. Scored via "
    "the production matrix path (one gemm per bucket per table) — pair "
    "sets identical to the SQL fold, min 4dp half-boundary margin 7.6e-9 "
    "at sf0.1 vs ~3e-16 scorer noise, so the SQL-fold DuckDB oracle "
    "cannot diverge.",
)
def q_dedup_embed_rp_multi(spark, sf_dir):
    from ..operators.similarity import rp_near_dup_pairs_multi

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = rp_near_dup_pairs_multi(
        # n_planes pinned: the oracle embeds exactly these 16 plane literals.
        # Production callers take the "auto" default (count-sized planes —
        # the SQL string can't track a data-dependent plane set); the auto
        # resolution itself is driver-oracled by q_rp_plane_sizing and
        # auto≡explicit equivalence is pinned in tests/test_similarity_fast.py.
        v, dim=64, threshold=0.3, n_planes=4, n_tables=4, scorer="matrix"
    )
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))


_SIZING_N_PLANES_SQL = (
    "LEAST(24, GREATEST(1, CAST(CEIL(LOG2(GREATEST(1.0, count(*) / 64.0)))"
    " AS INT)))"
)


@register(
    "q_rp_plane_sizing",
    f"""WITH c AS (SELECT count(*) AS n, {_SIZING_N_PLANES_SQL} AS p FROM embeddings)
SELECT n AS n_rows, 64 AS target_bucket_size, p AS n_planes,
       n / POWER(2.0, p) AS expected_bucket_size
FROM c""",
    doc="[EXT] auto-sized PRIMARY blocking plane count (similarity.py::"
    "auto_n_planes via rp_plane_sizing): ceil(log2(n/target_bucket)) "
    "clamped to [1,24], from the MEASURED corpus count — the corpus-"
    "tracking default of rp_near_dup_pairs_multi (VERDICT r7 #3: a fixed "
    "plane count means candidates/table ~ n²/2^planes, ~100x growth at "
    "10x data; count-sized planes hold the expected bucket at ~target so "
    "candidates stay ~linear). The Spark side runs the REAL resolver on "
    "the real count; the oracle mirrors the arithmetic in SQL.",
)
def q_rp_plane_sizing(spark, sf_dir):
    from ..operators.similarity import rp_plane_sizing

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return rp_plane_sizing(v, target_bucket_size=64)


@register(
    "q_text_normalize",
    """SELECT doc_id,
              trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                  ' +', ' ', 'g')) AS norm
       FROM documents""",
    doc="[EXT] text normalization: lowercase, strip punctuation, collapse whitespace",
)
def q_text_normalize(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
            )
        ).alias("norm"),
    )


@register(
    "q_tokenize",
    """SELECT doc_id, x.pos, x.token
       FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 20),
            unnest(list_transform(w, (t, i) -> {'pos': i - 1, 'token': t})) AS u(x)""",
    doc="[EXT] positional tokenization (posexplode): (doc, position, token) rows",
)
def q_tokenize(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@register(
    "q_dedup_clusters",
    f"""WITH RECURSIVE {_SHINGLE_CTE.lstrip()},
sig AS (
  SELECT doc_id, {_MINHASH_AGGS}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST}]) AS band FROM sig
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS vertex, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
FROM documents d LEFT JOIN comp c ON c.vertex = d.doc_id""",
    doc="[EXT] dedup cluster assignment: LSH pairs → connected components (iterative min-label propagation; oracle = recursive-CTE transitive closure)",
)
def q_dedup_clusters(spark, sf_dir):
    from ..operators.dedup import lsh_candidates, minhash_signatures, shingles
    from ..operators.graph import dedup_clusters

    d = _docs(spark, sf_dir)
    pairs = lsh_candidates(minhash_signatures(shingles(d, k=3))).select(
        "doc_a", "doc_b"
    )
    return dedup_clusters(pairs, d, "doc_id")


@register(
    "q_corpus_curation",
    f"""WITH RECURSIVE {_SHINGLE_CTE.lstrip()},
quality AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(text, ' ')) AS avg_tok
  FROM documents
),
kept_quality AS (
  SELECT doc_id, lang, text FROM quality
  WHERE n_tokens BETWEEN 10 AND 1000 AND avg_tok BETWEEN 3.0 AND 9.0
),
exact_canon AS (
  SELECT MIN(doc_id) AS doc_id FROM kept_quality
  GROUP BY md5(lower(trim(text)))
),
exact_kept AS (
  SELECT k.doc_id, k.lang FROM kept_quality k JOIN exact_canon e USING (doc_id)
),
sig AS (
  SELECT doc_id, {_MINHASH_AGGS}
  FROM sh WHERE doc_id IN (SELECT doc_id FROM exact_kept) GROUP BY doc_id
),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST}]) AS band FROM sig
),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS vertex, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
final AS (
  SELECT k.doc_id, k.lang,
         COALESCE(c.component, k.doc_id) AS canonical
  FROM exact_kept k LEFT JOIN comp c ON c.vertex = k.doc_id
)
SELECT lang,
       COUNT(*) AS docs_in,
       COUNT(*) FILTER (WHERE doc_id = canonical) AS docs_kept
FROM final GROUP BY lang""",
    doc="[EXT] end-to-end corpus curation: quality filter → exact dedup → MinHash-LSH fuzzy dedup → connected components → canonical survivors per language — the complete training-data pipeline in one plan",
)
def q_corpus_curation(spark, sf_dir):
    from ..operators.dedup import lsh_candidates, minhash_signatures, shingles
    from ..operators.graph import dedup_clusters

    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    avg_tok = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_tokens
    kept_quality = d.filter(
        n_tokens.between(10, 1000) & avg_tok.between(3.0, 9.0)
    ).select("doc_id", "lang", "text")

    exact_canon = (
        kept_quality.groupBy(F.md5(F.lower(F.trim("text"))).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_kept = kept_quality.join(exact_canon, "doc_id", "left_semi").select(
        "doc_id", "lang", "text"
    )
    # the curated subset is reused 3x (LSH pair generation, the cluster
    # vertex set, the final canonical join) — materialize the quality
    # filter + exact-dedup stage once instead of recomputing it per
    # consumer (same pattern as q_triangle_count's edge list; blocks are
    # freed by the ContextCleaner when the plan is GC'd). At corpus scale
    # this is the survivor set — the stage output a real pipeline would
    # write out anyway.
    exact_kept = exact_kept.localCheckpoint()

    pairs = lsh_candidates(
        minhash_signatures(shingles(exact_kept, k=3))
    ).select("doc_a", "doc_b")
    clusters = dedup_clusters(pairs, exact_kept, "doc_id")
    final = exact_kept.select("doc_id", "lang").join(clusters, "doc_id")
    return final.groupBy("lang").agg(
        F.count("*").alias("docs_in"),
        F.count(F.when(F.col("doc_id") == F.col("canonical_id"), 1)).alias(
            "docs_kept"
        ),
    )


# --- repetition-based quality rules + vocabulary statistics ----------------


@register(
    "q_repetition",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         CAST(list_max(list_transform(list_distinct(w),
              tk -> len(list_filter(w, x -> x = tk)))) AS BIGINT) AS mode_freq,
         CAST(len(w) - 1 AS BIGINT) AS n_2grams,
         CAST(len(list_distinct([array_to_string(w[i:i+1], ' ')
              for i in range(1, len(w))])) AS BIGINT) AS n_distinct_2grams
  FROM t)
SELECT doc_id, n_tokens,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
       CAST(mode_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mode_token_share,
       1.0 - CAST(n_distinct_2grams AS DOUBLE) / CAST(n_2grams AS DOUBLE)
         AS dup_2gram_share,
       (n_distinct * 100 >= n_tokens * 32
        AND mode_freq * 100 <= n_tokens * 15
        AND (n_2grams - n_distinct_2grams) * 10 <= n_2grams) AS keep
FROM m""",
    doc="[EXT] Gopher-style repetition quality rules adapted to token stats: "
    "type-token ratio, mode-token share, duplicate-2-gram share. The keep "
    "flag is pure integer arithmetic (nd*100 >= n*32 etc.) so no float "
    "boundary can diverge between engines; ratios are single int/int IEEE "
    "divisions. Map-only plan: every metric is partition-local array math "
    "(no explode, no shuffle) — at 100 TB this runs at scan speed. "
    "mode_freq is the longest equal run of sort_array(w) — O(n log n) per "
    "doc; the old transform(distinct, tk -> count-matches) form was "
    "O(n_distinct x n_tokens), ~1e10 comparisons inside ONE row's "
    "expression eval for a single 100k-token document (VERDICT r12 #2).",
)
def q_repetition(spark, sf_dir):
    d = _docs(spark, sf_dir)
    w = F.split("text", " ")
    t = d.select(
        "doc_id",
        w.alias("w"),
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
    ).withColumn(
        "mode_freq",
        # max token multiplicity == longest equal run after sorting: one
        # O(n log n) sort + one O(n) fold, instead of a quadratic
        # count-per-distinct-token. `<=>` (null-safe equal) makes the
        # first-element compare against the NULL seed well-defined; split()
        # never yields NULL elements, so runs are over real tokens only.
        F.expr(
            "aggregate("
            " sort_array(w),"
            " struct(cast(null as string) as prev,"
            "        cast(0 as bigint) as run,"
            "        cast(0 as bigint) as best),"
            " (acc, x) -> struct("
            "   x as prev,"
            "   if(acc.prev <=> x, acc.run + 1, cast(1 as bigint)) as run,"
            "   greatest(acc.best,"
            "     if(acc.prev <=> x, acc.run + 1, cast(1 as bigint))) as best),"
            " acc -> acc.best)"
        ).cast("long"),
    ).withColumn(
        "n_2grams", (F.col("n_tokens") - 1).cast("long")
    ).withColumn(
        "n_distinct_2grams",
        F.size(
            F.array_distinct(
                # CASE guard (the shingles() discipline): a 1-token doc
                # makes sequence(0, -1) DESCEND to [0, -1] and slice(w, 0,
                # 2) raise — real corpora have empty/one-word docs
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN"
                    " transform(sequence(0, size(w) - 2),"
                    " i -> concat_ws(' ', slice(w, i + 1, 2)))"
                    " ELSE array() END"
                )
            )
        ).cast("long"),
    )
    return t.select(
        "doc_id",
        "n_tokens",
        (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")).alias(
            "type_token_ratio"
        ),
        (F.col("mode_freq").cast("double") / F.col("n_tokens").cast("double")).alias(
            "mode_token_share"
        ),
        (
            # try_divide: a 1-token doc has zero 2-grams — 0/0 raises under
            # ANSI; NULL share is right (no 2-grams to be duplicated). No
            # such docs exist in testdata, so oracle values are unchanged.
            F.lit(1.0)
            - F.try_divide(
                F.col("n_distinct_2grams").cast("double"),
                F.col("n_2grams").cast("double"),
            )
        ).alias("dup_2gram_share"),
        (
            (F.col("n_distinct") * 100 >= F.col("n_tokens") * 32)
            & (F.col("mode_freq") * 100 <= F.col("n_tokens") * 15)
            & ((F.col("n_2grams") - F.col("n_distinct_2grams")) * 10 <= F.col("n_2grams"))
        ).alias("keep"),
    )


@register(
    "q_vocab_coverage",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token),
ranked AS (
  SELECT token, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
         CAST(sum(freq) OVER (ORDER BY freq DESC, token
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_freq,
         CAST(sum(freq) OVER () AS BIGINT) AS total_tokens
  FROM freq)
SELECT token, freq, rank,
       CAST(cum_freq AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS cum_share
FROM ranked""",
    doc="[EXT] corpus vocabulary statistics: global token frequencies, "
    "frequency rank (ties broken by token), cumulative coverage share — the "
    "table a tokenizer-training step reads. Scale shape (VERDICT r12 #1): "
    "the old single global Window.orderBy pushed the ENTIRE vocabulary "
    "through one task — fatal at 100 TB of web text, where distinct "
    "whitespace tokens (URLs, hashes, typos) run to billions. Now a "
    "range-bucketed two-pass prefix sum: a value-derived bucket id over "
    "deterministically-sampled boundary LITERALS (operators/recon.py::"
    "range_pid_expr, r15) keeps partitions globally ordered; pass 1 is "
    "one bounded job collecting per-bucket (count, sum) subtotals — one "
    "row PER BUCKET, never per token; the driver folds them into rank/"
    "cumulative offsets broadcast back; pass 2 windows WITHIN each "
    "bucket and adds the offsets. No single-partition Exchange anywhere "
    "(pinned in tests/test_plan_audit.py), and no pinned data: both "
    "passes recompute identical buckets from the literals (cache is a "
    "hint, executor-loss-safe).",
)
def q_vocab_coverage(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:  # e.g. "auto" on vendor runtimes
        n_parts = max(2, spark.sparkContext.defaultParallelism)
    # boundary-consistency contract (r15 redesign — the
    # _with_global_positions pattern, operators/recon.py, VERDICT r14
    # #5): the bucket id is a pure ROW-VALUE expression over boundary
    # LITERALS (deterministic driver-side sample), so both passes — and
    # any recomputation after eviction or executor loss — derive
    # identical buckets from scratch. No pinned data: the r14
    # localCheckpoint held the vocabulary in non-replicated executor
    # blocks (executor loss kills the query at scale); the persist here
    # is a pure hint (one vocabulary materialization instead of three
    # aggregation scans).
    from ..operators.cache_scope import scoped_persist
    from ..operators.recon import range_boundaries, range_pid_expr

    keys = [("freq", False), ("token", True)]
    freq = scoped_persist(freq)
    ranged = freq.withColumn(
        "_pid",
        range_pid_expr(freq, keys, range_boundaries(freq, keys, n_parts)),
    )
    # per-bucket subtotals and their prefix offsets computed INSIDE the
    # plan (r15, the _with_global_positions pattern): the subtotal agg is
    # ≤ n_parts rows, each bucket's (rank, cumulative) offset is the sum
    # over the buckets before it (≤ n_parts² self-join, AQE-broadcast),
    # and the grand total rides in as a 1-row cross join — the whole
    # query is ONE job, no driver collect round-trips.
    sub = ranged.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.sum("freq").alias("_sum")
    )
    prev = sub.select(
        F.col("_pid").alias("_ppid"),
        F.col("_cnt").alias("_pcnt"),
        F.col("_sum").alias("_psum"),
    )
    before = F.col("_ppid") < F.col("_pid")
    # the all-pairs product also carries the GRAND total (sum of every
    # bucket's _psum per _pid group) — a global agg would plan an
    # Exchange SinglePartition, which this query's plan contract forbids
    offs = (
        sub.crossJoin(F.broadcast(prev))
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum(F.when(before, F.col("_pcnt"))), F.lit(0))
            .cast("long")
            .alias("_rank_off"),
            F.coalesce(F.sum(F.when(before, F.col("_psum"))), F.lit(0))
            .cast("long")
            .alias("_cum_off"),
            F.sum("_psum").cast("long").alias("_total"),
        )
    )
    # pass 2: window per BUCKET (hash shuffle on _pid keeps each bucket's
    # rows in one task), then shift by the broadcast offsets —
    # value-identical to the global window
    w_local = Window.partitionBy("_pid").orderBy(F.desc("freq"), F.asc("token"))
    w_cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ranged.join(F.broadcast(offs), "_pid")
        .select(
            "token",
            "freq",
            (F.row_number().over(w_local) + F.col("_rank_off"))
            .cast("long")
            .alias("rank"),
            (
                (F.sum("freq").over(w_cum) + F.col("_cum_off")).cast("double")
                / F.col("_total").cast("double")
            ).alias("cum_share"),
        )
    )


@register(
    "q_ann_pq",
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
cent AS (
  SELECT m AS sub, CAST(vec_id AS INT) AS cent_id, e[m*2+1 : m*2+2] AS cent
  FROM v, range(32) t(m) WHERE vec_id < 64),
subs AS (
  SELECT vec_id, m AS sub, e[m*2+1 : m*2+2] AS subv
  FROM v, range(32) t(m)),
scored AS (
  SELECT s.vec_id, s.sub, c.cent_id,
         list_sum([ (s.subv[i]-c.cent[i])*(s.subv[i]-c.cent[i]) for i in range(1, 3) ])
           AS dist
  FROM subs s JOIN cent c ON s.sub = c.sub),
codes AS (
  SELECT vec_id, sub, cent_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cent_id) AS rn
    FROM scored) WHERE rn = 1),
dtable AS (
  SELECT vec_id AS query_id, sub, cent_id AS code, dist AS part_dist
  FROM scored WHERE vec_id < 16),
adist AS (
  SELECT d.query_id, co.vec_id AS neighbor_id, SUM(d.part_dist) AS approx_dist
  FROM codes co JOIN dtable d ON d.sub = co.sub AND d.code = co.code
  WHERE d.query_id <> co.vec_id
  GROUP BY 1, 2)
SELECT query_id, neighbor_id, rank, adist_r FROM (
  SELECT query_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY approx_dist, neighbor_id) AS BIGINT) AS rank,
         round(approx_dist, 4) AS adist_r
  FROM adist) WHERE rank <= 5""",
    doc="[EXT] product-quantization ANN (third tier after brute/IVF): "
    "32 subspaces x 64 deterministic centroids (smallest-id seed vectors), "
    "min_by hash-agg encoding, ADC top-k from codes alone — at 100 TB the "
    "query scan reads 32 small ints per vector (8x compression) and only "
    "codebooks stay in memory. Parameters swept on testdata: recall@5=0.66 "
    "vs exact L2, shortlist@20 captures 0.975 of the exact top-5 (rerank "
    "path); chance floor is 0.04. Margins checked at sf0.001/0.01: argmin "
    "gap >= 1.9e-8, rank gap >= 2.3e-6, 4dp rounding margin >= 7.5e-9 in "
    "distance units — all >= 3500x double reorder noise (~2e-12)."
)
def q_ann_pq(spark, sf_dir):
    from ..operators.similarity import pq_codebooks, pq_encode_fast, pq_topk

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(v, n_sub=32, d_sub=2, k_codes=64)
    # map-only numpy encoder — exact agreement with the fold encoder is
    # pytest-gated, so the oracle comparison is unaffected
    codes = pq_encode_fast(v, books, n_sub=32, d_sub=2)
    q = v.filter(F.col("vec_id") < 16)
    top = pq_topk(q, codes, books, k=5, n_sub=32, d_sub=2)
    return top.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("approx_dist", 4).alias("adist_r"),
    )


@register(
    "q_edit_distance",
    f"""WITH {_SHINGLE_CTE},
sig AS (
  SELECT doc_id, {_MINHASH_AGGS}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST}]) AS band FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
       CAST(levenshtein(x.text, y.text) AS DOUBLE)
         / greatest(length(x.text), length(y.text)) AS edit_ratio
FROM cand c
JOIN documents x ON x.doc_id = c.doc_a
JOIN documents y ON y.doc_id = c.doc_b""",
    doc="[EXT] edit-distance verification of LSH candidates: MinHash bands "
    "generate candidates (never O(n^2)), levenshtein scores ONLY those "
    "pairs — the standard verify step when near-dup needs character-level "
    "confirmation. Integer DP distance, identical in both engines; ratio "
    "is one IEEE division.",
)
def q_edit_distance(spark, sf_dir):
    from ..operators.dedup import lsh_candidates, minhash_signatures, shingles

    d = _docs(spark, sf_dir)
    sig = minhash_signatures(shingles(d, k=3), n_hashes=8)
    cand = lsh_candidates(sig, n_hashes=8, band_size=2).select("doc_a", "doc_b")
    x = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    y = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    dist = F.levenshtein("_ta", "_tb")
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.cast("long").alias("edit_dist"),
            (
                dist.cast("double")
                / F.greatest(F.length("_ta"), F.length("_tb"))
            ).alias("edit_ratio"),
        )
    )


@register(
    "q_token_rarity",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(v.freq) AS BIGINT) AS freq_sum,
       CAST(sum(v.freq) AS DOUBLE) / count(*) AS mean_token_freq,
       CAST(min(v.freq) AS BIGINT) AS rarest_freq
FROM tok t JOIN vocab v USING (token)
GROUP BY t.doc_id""",
    doc="[EXT] token-rarity scoring (unigram-LM stand-in with exact math): "
    "corpus token frequencies (one keyed agg, broadcast-sized vocab) joined "
    "back to each doc's tokens — mean corpus frequency and rarest token per "
    "doc. All sums are exact BIGINTs; DOUBLE appears only as one final "
    "division, so the hash check is engine-stable.",
)
def q_token_rarity(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").cast("long").alias("freq"))
    return (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("freq").cast("long").alias("freq_sum"),
            (F.sum("freq").cast("double") / F.count("*")).alias("mean_token_freq"),
            F.min("freq").cast("long").alias("rarest_freq"),
        )
    )


@register(
    "q_kmeans",
    """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(0 AS BIGINT) AS n_misassigned,
       TRUE AS inertia_improved, TRUE AS inertia_nonneg
FROM embeddings""",
    doc="[EXT] distributed Lloyd's k-means over the embedding corpus "
    "(deterministic farthest-first seeding, 3 refinement iterations), "
    "oracle-able by construction (VERDICT r4 #3): exact centroid bits "
    "aren't cross-engine-stable (distributed fp mean), so the result "
    "surfaces invariants the oracle verifies exactly instead — "
    "n_vectors (exact corpus count), n_misassigned = points whose "
    "assigned centroid is NOT their nearest final centroid, recomputed "
    "through an INDEPENDENT numeric path (expanded ||v||²-2v·c+||c||² "
    "identity vs the assigner's Σ(a-b)² HOF; must be 0), and "
    "inertia_improved/inertia_nonneg (Lloyd's objective at the final "
    "centroids ≤ at the seeds, ≥ 0). A broken E-step, M-step, or "
    "seeding flips one of them. Cluster cardinalities + numpy "
    "agreement + planted-cluster recovery stay pytest-verified "
    "(tests/test_clustering.py). Each iteration is one scan + one "
    "keyed shuffle of <= k x partitions partial rows (map-side "
    "combined dim-wise avg), the cost model that holds at 100 TB.",
)
def q_kmeans(spark, sf_dir):
    from ..operators.clustering import (
        _dim_of,
        _well_formed,
        kmeans_fit,
        kmeans_init_farthest,
        _nearest_expr,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # infer the dimensionality ONCE and share it with the seeder and the
    # fit (r15, guide §1.2 — each otherwise runs its own inference scan)
    dim = _dim_of(emb, "embedding")
    seeds = kmeans_init_farthest(emb, 4, dim=dim)
    cents, _iters = kmeans_fit(emb, k=4, max_iter=3, seeds=seeds, dim=dim)

    # assigner's path (Σ(a-b)² aggregate HOF, ties to smallest cent_id) and
    # an independent expanded-identity path in ONE frame. The two inertia
    # invariants ride in the SAME single aggregation pass (r14 opt, guide
    # §1.2): the old shape ran kmeans_inertia twice — two extra full scans
    # + driver actions per call — to produce two booleans the final agg can
    # compute itself (well-formed-filtered conditional sums, identical
    # values; the improved flag keeps its 1e-9 relative guard).
    v = (
        emb.select(
            F.expr("transform(embedding, x -> cast(x as double))").alias("_v"),
            _well_formed("embedding", len(cents[0])).alias("_wf"),
        )
        .withColumn("_m", _nearest_expr(cents))
        .withColumn("_ms", _nearest_expr(seeds))
    )
    vnorm = F.expr("aggregate(transform(_v, x -> x * x), 0D, (a, x) -> a + x)")
    dists = []
    for c in cents:
        lit = "array({})".format(",".join(f"{x!r}D" for x in c))
        dot = F.expr(
            f"aggregate(zip_with(_v, {lit}, (a, b) -> a * b), "
            f"0D, (acc, x) -> acc + x)"
        )
        dists.append(vnorm - 2.0 * dot + F.lit(sum(x * x for x in c)))
    mind = F.least(*dists)
    # fp tolerance scaled to the cancellation magnitude of the expanded
    # identity (norms), not the distance itself
    bad = (
        F.col("_m.dist") > mind + F.lit(1e-9) * (vnorm + F.lit(1.0))
    ).cast("long")

    return v.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum(bad).cast("long").alias("n_misassigned"),
        F.sum(F.when(F.col("_wf"), F.col("_m.dist"))).alias("_if"),
        F.sum(F.when(F.col("_wf"), F.col("_ms.dist"))).alias("_is"),
    ).select(
        "n_vectors",
        "n_misassigned",
        # coalesce(True): with ZERO well-formed vectors both conditional
        # sums are NULL and the invariants are vacuously true — the flags
        # must be defined booleans, never NULL (ADVICE r14). No-op when
        # any well-formed vector exists (driver data always has them).
        F.coalesce(
            F.col("_if") <= F.col("_is") * F.lit(1.0 + 1e-9), F.lit(True)
        ).alias("inertia_improved"),
        F.coalesce(F.col("_if") >= F.lit(0.0), F.lit(True)).alias(
            "inertia_nonneg"
        ),
    )


@register(
    "q_tfidf",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, token),
df AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY token),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
       round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf_r
FROM tf JOIN df USING (token) CROSS JOIN n
WHERE tf.tf >= 2""",
    doc="[EXT] TF-IDF term weighting (repeated terms, tf >= 2): corpus "
    "document frequencies (one keyed agg, broadcast-sized vocab) joined "
    "back to per-doc term frequencies; score = tf * ln(N/df). tf/df/N are "
    "exact BIGINTs, the score is one ln + one multiply (no summation "
    "order), rounded to 6dp with a boundary margin >= 3e-10 at "
    "sf0.001/0.01/0.1 — >= 1e4 x the 1-ulp cross-engine ln() tolerance. "
    "Scale shape: tf filter applies before the df join, the df table is "
    "broadcast, N rides in as a 1-row cross join — map-side after two "
    "keyed aggs, no window sort.",
)
def q_tfidf(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
        .filter(F.col("tf") >= 2)
    )
    df = tok.groupBy("token").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    n = d.agg(F.count("*").cast("long").alias("n"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf_r"),
        )
    )


# Shared BM25 CTE chain (Okapi, k1=1.2 b=0.75, fixed 3-term query) — used by
# q_bm25 and the q_hybrid_rrf fusion oracle.
_BM25_CTES = """tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
lens AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ('spark', 'vector', 'query')
  GROUP BY doc_id, token),
df AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok WHERE token IN ('spark', 'vector', 'query')
  GROUP BY token),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM lens),
bm_scored AS (
  SELECT tf.doc_id, tf.token,
         round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * (lens.dl / stats.avgdl))),
               6) AS s
  FROM tf
  JOIN df USING (token)
  JOIN lens USING (doc_id)
  CROSS JOIN stats),
bm AS (
  SELECT doc_id,
         COALESCE(max(CASE WHEN token = 'spark' THEN s END), 0.0) AS s_spark,
         COALESCE(max(CASE WHEN token = 'vector' THEN s END), 0.0) AS s_vector,
         COALESCE(max(CASE WHEN token = 'query' THEN s END), 0.0) AS s_query,
         round(COALESCE(max(CASE WHEN token = 'spark' THEN s END), 0.0)
               + COALESCE(max(CASE WHEN token = 'vector' THEN s END), 0.0)
               + COALESCE(max(CASE WHEN token = 'query' THEN s END), 0.0), 6)
           AS bm25_r
  FROM bm_scored GROUP BY doc_id)"""


@register(
    "q_bm25",
    f"""WITH {_BM25_CTES}
SELECT doc_id, s_spark, s_vector, s_query, bm25_r FROM bm""",
    doc="[EXT] BM25 document scoring (Okapi, k1=1.2 b=0.75) for a fixed "
    "3-term query — the classic retrieval scorer a training-data pipeline "
    "uses for quality filtering and eval-set retrieval. Cross-engine "
    "determinism: tf/df/N/dl are exact BIGINTs; avgdl is one exact-int "
    "division; each per-term score is a fixed-order double expression "
    "rounded to 6dp; the doc total sums the three ROUNDED per-term scores "
    "in fixed written order via conditional-max pivot (never a "
    "row-order-dependent SUM). Scale shape: the tiny per-term df table "
    "broadcasts, doc lengths join keyed, the corpus-wide stats ride in as "
    "a broadcast 1-row cross join — two keyed aggs + map-side math, no "
    "window, no sort.",
)
def q_bm25(spark, sf_dir):
    from ..operators.retrieval import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), ["spark", "vector", "query"]).select(
        "doc_id",
        "s_spark",
        "s_vector",
        "s_query",
        F.round("bm25", 6).alias("bm25_r"),
    )


@register(
    "q_hybrid_rrf",
    f"""WITH {_BM25_CTES},
{_VEC_CTE.strip()},
bl AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25_r DESC, doc_id) AS r_bm25
  FROM bm QUALIFY r_bm25 <= 20),
qv AS (SELECT e, n FROM v WHERE vec_id = 0),
cs AS (
  SELECT c.vec_id AS doc_id,
         list_dot_product(qv.e, c.e) / (qv.n * c.n) AS cos
  FROM v c CROSS JOIN qv WHERE c.vec_id <> 0),
cl AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r_cos
  FROM cs QUALIFY r_cos <= 20),
fused AS (
  SELECT COALESCE(bl.doc_id, cl.doc_id) AS doc_id,
         CAST(bl.r_bm25 AS BIGINT) AS r_bm25,
         CAST(cl.r_cos AS BIGINT) AS r_cos,
         round(COALESCE(1.0 / (60 + bl.r_bm25), 0.0)
               + COALESCE(1.0 / (60 + cl.r_cos), 0.0), 6) AS rrf_r
  FROM bl FULL JOIN cl USING (doc_id))
SELECT doc_id, r_bm25, r_cos, rrf_r
FROM fused ORDER BY rrf_r DESC, doc_id LIMIT 10""",
    doc="[EXT] hybrid retrieval with reciprocal-rank fusion: the BM25 "
    "top-20 (lexical) and the embedding-cosine top-20 for a fixed query "
    "vector (vec_id 0, self excluded) fuse via RRF(60) — "
    "1/(60+rank) summed over the two systems, the standard "
    "training-data-pipeline recipe for eval-set retrieval and "
    "contamination checks that neither pure-lexical nor pure-dense "
    "search covers. Determinism: BM25 ranks order by the 6dp-rounded "
    "score + doc_id; cosine ranks use the raw fold (bit-stable across "
    "engines, same convention as q_ann_cosine since r1) + doc_id; RRF "
    "adds two exact 1/(60+int) terms in fixed written order, rounds, "
    "and the final top-10 cut orders by the ROUNDED score + doc_id. "
    "Scale shape: each system produces a k-row shortlist (TakeOrdered, "
    "no global sort materialization); fusion joins two 20-row frames — "
    "cost is the two underlying retrievals, fusion is free.",
)
def q_hybrid_rrf(spark, sf_dir):
    from ..operators.retrieval import hybrid_rrf_topk

    return hybrid_rrf_topk(
        _docs(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        ["spark", "vector", "query"],
        query_vec_id=0,
        shortlist=20,
        k=10,
    )


@register(
    "q_dedup_incremental",
    f"""WITH {_SHINGLE_CTE},
sig AS (
  SELECT doc_id, {_MINHASH_AGGS}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT doc_id, unnest([{_BAND_LIST}]) AS band FROM sig
),
probe AS (SELECT * FROM banded WHERE doc_id % 4 = 1),
corp AS (SELECT * FROM banded WHERE doc_id % 4 <> 1),
hits AS (
  SELECT p.doc_id AS new_id, i.doc_id AS match_id, 'corpus' AS match_src
  FROM probe p JOIN corp i USING (band) WHERE p.doc_id <> i.doc_id
  UNION ALL
  SELECT a.doc_id AS new_id, b.doc_id AS match_id, 'batch' AS match_src
  FROM probe a JOIN probe b USING (band) WHERE a.doc_id < b.doc_id)
SELECT new_id, match_id, match_src,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM hits GROUP BY 1, 2, 3""",
    doc="[EXT] incremental LSH dedup — the O(delta) ingest shape: a batch "
    "(docs with doc_id%4=1) probes the persisted (band, id) corpus index "
    "instead of rescanning the corpus, plus an intra-batch self-join. "
    "Cost O(|batch| + matched buckets) per ingest; the index grows "
    "append-only. Non-vacuous both ways at sf0.001/0.01 (corpus hits 16/11, "
    "batch hits 1/4). operators/dedup.py::lsh_band_index / "
    "incremental_near_dups.",
)
def q_dedup_incremental(spark, sf_dir):
    from ..operators.dedup import incremental_near_dups, lsh_band_index

    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 4 != 1)
    batch = d.filter(F.col("doc_id") % 4 == 1)
    index = lsh_band_index(corpus)
    return incremental_near_dups(batch, index).select(
        "new_id",
        "match_id",
        "match_src",
        F.col("n_shared_bands").cast("long").alias("n_shared_bands"),
    )


def _pagerank_oracle_sql(iters: int = 8, damping: float = 0.85) -> str:
    """Fixed-iteration power method unrolled as chained CTEs (the SQL
    reproduction of operators/graph.py::pagerank with tol=0, byte-for-byte
    semantics: uniform init, dangling mass redistributed uniformly each
    round). Rounding to 8dp happens BEFORE the top-20 ordering on both
    sides, so cross-engine fp noise (~1e-13 from different summation
    order) cannot flip the rank ordering or the LIMIT cut."""
    # AS MATERIALIZED on every chained CTE: each r{i} is referenced three
    # times by round i+1 (dangling sum, contribution join, carry-forward);
    # without materialization the inlined expansion re-evaluates the whole
    # prefix per reference (~3^iters blowup — measured minutes vs <1s).
    ctes = [
        """e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u,
                        CAST(l_partkey AS BIGINT) + 1000000 AS v FROM lineitem),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n
       FROM (SELECT u AS vertex FROM e UNION SELECT v FROM e)),
verts AS MATERIALIZED (SELECT u AS vertex FROM e UNION SELECT v FROM e),
deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM e GROUP BY u),
w AS MATERIALIZED (SELECT e.u, e.v, 1.0 / deg.deg AS w FROM e JOIN deg USING (u)),
r0 AS MATERIALIZED (SELECT vertex, 1.0 / nn.n AS pr FROM verts CROSS JOIN nn)"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (SELECT COALESCE(SUM(pr), 0) AS dang FROM r{p}
        WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.u = r{p}.vertex)),
c{i} AS MATERIALIZED (SELECT w.v AS vertex, SUM(w.w * r{p}.pr) AS c
        FROM w JOIN r{p} ON w.u = r{p}.vertex GROUP BY w.v),
r{i} AS MATERIALIZED (SELECT verts.vertex,
               (1 - {damping}) / nn.n
               + {damping} * (COALESCE(c{i}.c, 0) + d{i}.dang / nn.n) AS pr
        FROM verts CROSS JOIN nn CROSS JOIN d{i}
        LEFT JOIN c{i} USING (vertex))"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vertex, round(pr, 8) AS rank_r FROM r{iters}
ORDER BY rank_r DESC, vertex LIMIT 20"""
    )


@register(
    "q_pagerank",
    _pagerank_oracle_sql(iters=8),
    doc="[EXT] PageRank over the supplier->part supply graph (distinct "
    "(l_suppkey -> l_partkey) edges from lineitem; parts are sinks whose "
    "mass redistributes through the dangling term). Power iteration, "
    "exactly 8 rounds (tol=0 so the driver loop never early-exits and the "
    "unrolled-CTE DuckDB oracle sees the identical computation): each "
    "round is one edges-by-ranks join + keyed sum, lineage truncated via "
    "localCheckpoint. Ranks are rounded to 8dp BEFORE the top-20 ordering "
    "so fp summation-order noise can't flip the cut. Numpy-agreement, "
    "mass conservation and dangling handling tested in "
    "tests/test_pagerank.py.",
)
def q_pagerank(spark, sf_dir):
    from ..operators.graph import pagerank

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey").cast("long") + F.lit(1_000_000)).alias("dst"),
    )
    return (
        pagerank(edges, max_iter=8, tol=0.0)
        .select("vertex", F.round("rank", 8).alias("rank_r"))
        .orderBy(F.desc("rank_r"), "vertex")
        .limit(20)
    )


@register(
    "q_unigram_logprob",
    """WITH tokd AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (
  SELECT doc_id, u.pos, u.token FROM tokd,
  unnest([{'pos': i, 'token': w[i]} for i in range(1, len(w)+1)]) AS t(u)),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok),
lp AS (
  SELECT tok.doc_id, tok.pos,
         ln(CAST(vocab.freq AS DOUBLE) / tot.t) AS logp
  FROM tok JOIN vocab USING (token) CROSS JOIN tot),
cum AS (
  SELECT doc_id, pos,
         sum(logp) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM lp),
fin AS (
  SELECT doc_id, max_by(c, pos) AS total, CAST(count(*) AS BIGINT) AS n
  FROM cum GROUP BY doc_id)
SELECT doc_id, n AS n_tokens,
       round(total, 4) AS logprob_r,
       round(total / n, 6) AS mean_logprob_r
FROM fin""",
    doc="[EXT] unigram-LM document scoring (the CCNet-style LM quality "
    "filter with an exactly-reproducible model): corpus unigram "
    "frequencies as the LM, per-doc sum/mean of ln p(token). Cross-engine "
    "determinism: each ln has exact BIGINT inputs; the per-doc sum runs "
    "in a position-ordered running frame (sequential accumulation, "
    "identical order both engines) with the doc total read via "
    "max_by(cum, pos); rounding margins measured >= 5.6e-11 at "
    "sf0.001/0.01/0.1 — ~4e3 x the accumulated fp noise of a ~40-term "
    "sum. Scale shape: vocab agg + broadcast-back join + one keyed window "
    "per doc; no driver state.",
)
def q_unigram_logprob(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    vocab = tok.groupBy("token").agg(F.count("*").cast("long").alias("freq"))
    tot = tok.agg(F.count("*").cast("long").alias("t"))
    lp = (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "pos",
            F.log(F.col("freq").cast("double") / F.col("t")).alias("logp"),
        )
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = lp.select("doc_id", "pos", F.sum("logp").over(w_run).alias("c"))
    return (
        cum.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.max_by("c", "pos").alias("total"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("total", 4).alias("logprob_r"),
            F.round(F.col("total") / F.col("n_tokens"), 6).alias("mean_logprob_r"),
        )
    )


@register(
    "q_perplexity_buckets",
    """WITH tokd AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (
  SELECT doc_id, u.pos, u.token FROM tokd,
  unnest([{'pos': i, 'token': w[i]} for i in range(1, len(w)+1)]) AS t(u)),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok),
lp AS (
  SELECT tok.doc_id, tok.pos,
         ln(CAST(vocab.freq AS DOUBLE) / tot.t) AS logp
  FROM tok JOIN vocab USING (token) CROSS JOIN tot),
cum AS (
  SELECT doc_id, pos,
         sum(logp) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM lp),
fin AS (
  SELECT doc_id, max_by(c, pos) AS total, CAST(count(*) AS BIGINT) AS n
  FROM cum GROUP BY doc_id),
scored AS (
  SELECT d.doc_id, d.lang, fin.n AS n_tokens,
         round(fin.total / fin.n, 6) AS mean_logprob_r
  FROM fin JOIN documents d USING (doc_id)),
b AS (
  SELECT doc_id, lang, n_tokens, mean_logprob_r,
         CAST(ntile(3) OVER (PARTITION BY lang
                             ORDER BY mean_logprob_r DESC, doc_id) AS BIGINT)
           AS tercile
  FROM scored)
SELECT doc_id, lang, n_tokens, mean_logprob_r, tercile,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM b""",
    doc="[EXT] CCNet-style perplexity bucketing (Wenzek et al., LREC 2020 — "
    "public): per-doc unigram-LM mean logprob (exactly the q_unigram_logprob "
    "running-frame idiom, so the doubles are sequence-deterministic), then "
    "per-language terciles — head (best-scoring third under the LM), middle, "
    "tail — the quality tiers CCNet keeps/samples/drops. Ordering uses the "
    "ROUNDED score (margins proven for q_unigram_logprob) with doc_id "
    "tie-break, so ntile is fully deterministic cross-engine. Scale: vocab "
    "agg + broadcast join + one window per doc + one window per language; "
    "the per-lang sort distributes by partition key.",
)
def q_perplexity_buckets(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    vocab = tok.groupBy("token").agg(F.count("*").cast("long").alias("freq"))
    tot = tok.agg(F.count("*").cast("long").alias("t"))
    lp = (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "pos",
            F.log(F.col("freq").cast("double") / F.col("t")).alias("logp"),
        )
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fin = (
        lp.select("doc_id", "pos", F.sum("logp").over(w_run).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.max_by("c", "pos").alias("total"),
        )
    )
    scored = fin.join(d.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(F.col("total") / F.col("n_tokens"), 6).alias("mean_logprob_r"),
    )
    w_lang = Window.partitionBy("lang").orderBy(
        F.desc("mean_logprob_r"), "doc_id"
    )
    tercile = F.ntile(3).over(w_lang).cast("long")
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "mean_logprob_r",
        tercile.alias("tercile"),
        F.when(tercile == 1, "head")
        .when(tercile == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


@register(
    "q_semantic_dedup",
    """SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(0 AS BIGINT) AS n_pruned_without_witness,
       CAST(0 AS BIGINT) AS n_kept_with_witness,
       TRUE AS prune_nonvacuous
FROM embeddings""",
    doc="[EXT] SemDeDup semantic dedup (operators/similarity.py::"
    "semantic_dedup; Abbas et al. 2023, arXiv:2303.09540): k-means the "
    "embeddings (k = ceil(n/target_cluster_size) — per-cluster pair cost "
    "constant in n), then within each cluster prune vectors with a "
    "smaller-id neighbor at cosine >= 0.3. Oracle-able by construction "
    "(the q_kmeans precedent — distributed fp centroids aren't bit-"
    "stable): the result surfaces invariants verified through an "
    "INDEPENDENT numeric path (numpy pandas-UDF cosine vs the operator's "
    "SQL fold): n_vectors (exact corpus count), pruned-without-witness "
    "and kept-with-witness counts (each with a 1e-9 boundary band so "
    "scorer noise can't flip a count; both must be 0 — a broken "
    "cluster-join, prune rule, or tie-break flips one), and "
    "prune_nonvacuous (both kept and pruned non-empty at this sf/"
    "threshold, so the zeros aren't trivial). Cluster-quality and "
    "capped-mode semantics are pytest-witnessed (tests/"
    "test_semantic_dedup.py).",
)
def q_semantic_dedup(spark, sf_dir):
    from ..operators.similarity import semantic_dedup

    thr = 0.3
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = semantic_dedup(
        emb, threshold=thr, target_cluster_size=128
    ).localCheckpoint()  # feeds the witness join twice (r6 rule)
    t = res.select("vec_id", "cent_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )

    # independent scorer: per-cluster numpy GEMM inside ONE applyInPandas
    # pass, NOT the SQL fold the operator used. r14 opt (guide §4.2/§2.3):
    # the old shape exploded every within-cluster pair (a⋈b on cent_id) and
    # shipped BOTH 64-dim embeddings per pair through the Arrow boundary —
    # O(Σ cluster²) vector transfers — where the gemm ships each vector
    # once (O(n)) and scores the cluster's pair matrix in native BLAS.
    # Numerically this is the same double-precision dot/(|a||b|) the einsum
    # scorer produced (BLAS vs einsum accumulation differ ~1e-16); the
    # query's 1e-9 boundary bands absorb scorer noise by design, so the
    # violation counts are unchanged. Zero-norm members keep the SQL-max
    # NaN semantics: NaN cosines propagate into _best (NaN outranks any
    # double in Spark's max), never silently drop.
    import numpy as np
    import pandas as pd

    def _best_witness(pdf: pd.DataFrame) -> pd.DataFrame:
        # members arrive well-formed (semantic_dedup only emits assigned,
        # well-formed vectors), so the cluster matrix stacks uniformly
        pdf = pdf.sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        dots = mat @ mat.T
        norms = np.linalg.norm(mat, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / np.outer(norms, norms)
        # witness of column j = max cos over STRICTLY smaller ids (i < j)
        cos[np.tril_indices(len(ids))] = -np.inf
        with np.errstate(invalid="ignore"):
            best = np.max(cos, axis=0)
        has_witness = ~(best == -np.inf)  # j=0 has none; NaN passes through
        return pd.DataFrame(
            {"_b": ids[has_witness], "_best": best[has_witness]}
        )

    wit = t.groupBy("cent_id").applyInPandas(
        _best_witness, "_b bigint, _best double"
    )
    per = res.join(wit, res["vec_id"] == wit["_b"], "left")
    pruned_bad = (
        ~F.col("keep")
        & (F.col("_best").isNull() | (F.col("_best") < thr - 1e-9))
    ).cast("long")
    kept_bad = (
        F.col("keep") & (F.col("_best") >= thr + 1e-9)
    ).cast("long")
    return per.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum(pruned_bad).cast("long").alias("n_pruned_without_witness"),
        F.sum(kept_bad).cast("long").alias("n_kept_with_witness"),
        (
            (F.sum((~F.col("keep")).cast("long")) > 0)
            & (F.sum(F.col("keep").cast("long")) > 0)
        ).alias("prune_nonvacuous"),
    )


# One persisted semantic index per (session, sf_dir), removed at process
# exit (the lakehouse _CDF_ROOTS idiom — the bench's reps must not refit
# k-means per run).
_SEMINDEX_ROOTS: dict[tuple[int, str], str] = {}


def _rm_semindex_roots() -> None:
    import shutil

    for root in _SEMINDEX_ROOTS.values():
        shutil.rmtree(root, ignore_errors=True)


def _ensure_semindex_root(spark, sf_dir) -> str:
    """Build (once per session × sf_dir) the persisted semantic-dedup
    index over the corpus slice (vec_id % 4 != 1) of embeddings."""
    import atexit
    import tempfile

    from ..operators.similarity import semantic_index_build

    cache_key = (id(spark), sf_dir)
    root = _SEMINDEX_ROOTS.get(cache_key)
    if root is None:
        if not _SEMINDEX_ROOTS:
            atexit.register(_rm_semindex_roots)
        root = tempfile.mkdtemp(prefix="pcr_semindex_") + "/idx"
        corpus = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .filter(F.col("vec_id") % 4 != 1)
        )
        semantic_index_build(corpus, root, target_cluster_size=128, max_iter=3)
        _SEMINDEX_ROOTS[cache_key] = root
    return root


@register(
    "q_semantic_dedup_incremental",
    """SELECT CAST(count(*) AS BIGINT) AS n_batch,
       CAST(0 AS BIGINT) AS n_pruned_without_witness,
       CAST(0 AS BIGINT) AS n_kept_with_witness,
       CAST(0 AS BIGINT) AS n_src_misordered,
       TRUE AS prune_nonvacuous
FROM embeddings WHERE vec_id % 4 = 1""",
    doc="[EXT] incremental SemDeDup — the O(delta) semantic-ingest shape "
    "(operators/similarity.py::semantic_index_build / "
    "semantic_dedup_incremental): the corpus slice (vec_id%4≠1) is "
    "k-means-fit once and persisted PARTITIONED BY cluster id with the "
    "centroids in a sidecar; the batch (vec_id%4=1) assigns to the "
    "persisted centroids and reads ONLY its touched cluster dirs — cost "
    "O(|batch| × cluster size), never O(corpus), the semantic analog of "
    "q_dedup_incremental's band-index probe. Oracle-able by construction "
    "(the q_semantic_dedup invariant pattern): an INDEPENDENT numpy "
    "pandas-UDF cosine re-scores every verdict — pruned rows must hold a "
    "witness of their claimed class (corpus member, or smaller-id batch "
    "sibling) in their cluster at cos >= thr-1e-9; kept rows must hold "
    "none at thr+1e-9; match_src='batch' rows must lack a strong corpus "
    "witness (corpus evidence outranks batch). All three violation "
    "counts must be 0; prune_nonvacuous pins corpus-pruned, batch-pruned "
    "and kept all non-empty at this sf/threshold so the zeros aren't "
    "trivial. Partition-pruned IO and novel-cluster semantics are "
    "pytest-witnessed (tests/test_semantic_dedup.py).",
)
def q_semantic_dedup_incremental(spark, sf_dir):
    from ..operators.similarity import semantic_dedup_incremental

    thr = 0.3
    root = _ensure_semindex_root(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = emb.filter(F.col("vec_id") % 4 == 1)
    res = semantic_dedup_incremental(
        batch, root, threshold=thr
    ).localCheckpoint()  # feeds the witness join + the final agg (r6 rule)
    t = res.select("vec_id", "cent_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    members = spark.read.parquet(root).select(
        "cent_id", F.col("embedding").alias("_ec")
    )

    # independent scorer: BOTH witness classes (corpus member / smaller-id
    # batch sibling) from ONE cogrouped numpy-GEMM pass per cluster — NOT
    # the operator's SQL fold. r14 opt (guide §4.2/§2.3): the old shape ran
    # two pair joins that shipped both 64-dim embeddings per candidate pair
    # through the Arrow boundary (O(|batch| x cluster) + O(batch-pair)
    # vector transfers, two shuffles + two groupBy-max + two left joins);
    # the cogroup ships each vector once and scores in BLAS. A missing
    # witness is encoded -inf, which fails every >= test exactly like the
    # old left-join NULL; NaN (zero-norm) keeps its Spark max semantics
    # (NaN outranks all doubles). The 1e-9 bands absorb gemm-vs-einsum
    # accumulation noise (~1e-16) by design.
    import numpy as np
    import pandas as pd

    def _witnesses(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                {
                    "_p": pd.Series(dtype="int64"),
                    "_best_c": pd.Series(dtype="float64"),
                    "_best_b": pd.Series(dtype="float64"),
                }
            )
        left = left.sort_values("vec_id", kind="mergesort").reset_index(
            drop=True
        )
        ids = left["vec_id"].to_numpy()
        bm = np.stack(left["embedding"].to_numpy()).astype(np.float64)
        bn = np.linalg.norm(bm, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            if len(right):
                cm = np.stack(right["_ec"].to_numpy()).astype(np.float64)
                cn = np.linalg.norm(cm, axis=1)
                cos_c = (bm @ cm.T) / np.outer(bn, cn)
                best_c = np.max(cos_c, axis=1)
            else:
                best_c = np.full(len(ids), -np.inf)
            cos_b = (bm @ bm.T) / np.outer(bn, bn)
        cos_b[np.tril_indices(len(ids))] = -np.inf
        with np.errstate(invalid="ignore"):
            best_b = np.max(cos_b, axis=0)
        return pd.DataFrame({"_p": ids, "_best_c": best_c, "_best_b": best_b})

    wit = (
        t.groupBy("cent_id")
        .cogroup(members.groupBy("cent_id"))
        .applyInPandas(_witnesses, "_p bigint, _best_c double, _best_b double")
    )
    per = res.join(wit, res["vec_id"] == wit["_p"], "left").drop("_p")
    has_c = F.col("_best_c").isNotNull() & (F.col("_best_c") >= thr - 1e-9)
    has_b = F.col("_best_b").isNotNull() & (F.col("_best_b") >= thr - 1e-9)
    strong_c = F.col("_best_c").isNotNull() & (F.col("_best_c") >= thr + 1e-9)
    strong_b = F.col("_best_b").isNotNull() & (F.col("_best_b") >= thr + 1e-9)
    pruned_bad = (
        ((F.col("match_src") == "corpus") & ~has_c)
        | ((F.col("match_src") == "batch") & ~has_b)
    ).cast("long")
    kept_bad = (F.col("keep") & (strong_c | strong_b)).cast("long")
    misordered = ((F.col("match_src") == "batch") & strong_c).cast("long")
    return per.agg(
        F.count("*").cast("long").alias("n_batch"),
        F.sum(pruned_bad).cast("long").alias("n_pruned_without_witness"),
        F.sum(kept_bad).cast("long").alias("n_kept_with_witness"),
        F.sum(misordered).cast("long").alias("n_src_misordered"),
        (
            (F.sum((F.col("match_src") == "corpus").cast("long")) > 0)
            & (F.sum((F.col("match_src") == "batch").cast("long")) > 0)
            & (F.sum(F.col("keep").cast("long")) > 0)
        ).alias("prune_nonvacuous"),
    )


@register(
    "q_dup_spans",
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       ), grams AS (
         SELECT doc_id, CAST(i AS BIGINT) AS pos,
                array_to_string(tk[i+1:i+8], ' ') AS gram
         FROM toks, UNNEST(range(CAST(len(tk) - 8 + 1 AS BIGINT))) AS u(i)
       ), dup AS (
         SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
       ), hits AS (
         SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
       ), cov AS (
         SELECT doc_id,
                greatest(0, pos + 8 - greatest(pos,
                  coalesce(max(pos + 8) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos)
                )) AS inc
         FROM hits
       ), per AS (
         SELECT doc_id, sum(inc) AS dup_tokens FROM cov GROUP BY doc_id
       )
       SELECT t.doc_id,
              CAST(len(t.tk) AS BIGINT) AS n_tokens,
              CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
              CAST(coalesce(p.dup_tokens, 0) AS DOUBLE)
                / CAST(len(t.tk) AS DOUBLE) AS dup_fraction
       FROM toks t LEFT JOIN per p USING (doc_id)""",
    doc="[EXT] exact duplicated-SPAN coverage per document "
    "(operators/dedup.py::duplicate_span_stats): fraction of each doc's "
    "tokens inside an 8-token window occurring >=2 times corpus-wide — "
    "the span-level dedup tier (boilerplate/license/templated text that "
    "doc-level MinHash cannot see). Positional k-grams -> ONE keyed "
    "count shuffle -> join-back of the duplicated tail -> per-doc "
    "interval union via a running-max window. Linear in corpus tokens; "
    "max_gram_freq caps stopword-run hot grams at scale. The "
    "BIGINT/BIGINT -> DOUBLE division is IEEE-identical cross-engine.",
)
def q_dup_spans(spark, sf_dir):
    from ..operators.dedup import duplicate_span_stats

    return duplicate_span_stats(_docs(spark, sf_dir), k=8)


@register(
    "q_dup_strip",
    """WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       ), grams AS (
         SELECT doc_id, CAST(i AS BIGINT) AS pos,
                array_to_string(tk[i+1:i+8], ' ') AS gram
         FROM toks, UNNEST(range(CAST(len(tk) - 8 + 1 AS BIGINT))) AS u(i)
       ), dup AS (
         SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
       ), hits AS (
         SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
       ), cov AS (
         SELECT DISTINCT doc_id, pos + j AS pos
         FROM hits, UNNEST(range(8)) AS v(j)
       ), tp AS (
         SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[i+1] AS tok
         FROM toks, UNNEST(range(CAST(len(tk) AS BIGINT))) AS u(i)
       ), kept AS (
         SELECT t.doc_id, t.pos, t.tok
         FROM tp t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
         WHERE c.pos IS NULL
       ), rebuilt AS (
         SELECT doc_id, count(*) AS kept_tokens,
                string_agg(tok, ' ' ORDER BY pos) AS clean_text
         FROM kept GROUP BY doc_id
       )
       SELECT t.doc_id,
              CAST(len(t.tk) AS BIGINT) AS n_tokens,
              CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
              coalesce(r.clean_text, '') AS clean_text
       FROM toks t LEFT JOIN rebuilt r USING (doc_id)""",
    doc="[EXT] duplicated-span REMOVAL (operators/dedup.py::"
    "strip_duplicate_spans): the cleaning transform paired with "
    "q_dup_spans — every token inside an 8-token window occurring >=2 "
    "times corpus-wide is cut, and each doc is rebuilt in token order "
    "(the published substring-dedup result as a corpus transform, not "
    "just a measurement; kept_tokens + dup_tokens == n_tokens by "
    "construction). Plan: the shared positional-k-gram hits -> explode "
    "each hit into its k covered positions + distinct -> anti-join the "
    "(doc, pos, token) corpus -> ordered per-doc rebuild via "
    "array_sort(collect_list(struct)). All-JVM, linear in corpus "
    "tokens; max_gram_freq stays available as the recall-only hot-gram "
    "cap at scale.",
)
def q_dup_strip(spark, sf_dir):
    from ..operators.dedup import strip_duplicate_spans

    return strip_duplicate_spans(_docs(spark, sf_dir), k=8)


_TEXTIDX_ROOTS: dict = {}


def _rm_textidx_roots():
    import shutil

    for root in _TEXTIDX_ROOTS.values():
        shutil.rmtree(root.rsplit("/", 1)[0], ignore_errors=True)


def _ensure_textidx_root(spark, sf_dir) -> str:
    import atexit
    import tempfile

    from ..operators.retrieval import text_index_build

    cache_key = (id(spark), sf_dir)
    root = _TEXTIDX_ROOTS.get(cache_key)
    if root is None:
        if not _TEXTIDX_ROOTS:
            atexit.register(_rm_textidx_roots)
        root = tempfile.mkdtemp(prefix="pcr_textidx_") + "/idx"
        text_index_build(_docs(spark, sf_dir), root, n_buckets=16)
        _TEXTIDX_ROOTS[cache_key] = root
    return root


@register(
    "q_bm25_persisted",
    f"""WITH {_BM25_CTES}
SELECT doc_id, s_spark, s_vector, s_query, bm25_r FROM bm""",
    doc="[EXT] BM25 served from a PERSISTED inverted index "
    "(operators/retrieval.py::text_index_build/bm25_persisted): postings "
    "(token, doc_id, tf, dl — doc length denormalized in) are written "
    "ONCE partitioned by token-hash bucket; a query opens ONLY its "
    "terms' bucket directories (structural pruning, pinned via "
    "inputFiles in tests/test_text_index.py), reads exact tf/df from "
    "the matched postings and N/avgdl from the committed meta row — "
    "per-query IO is O(matched postings), never the corpus (the serving "
    "shape at 100 TB; q_bm25 re-derives everything per call). "
    "Incremental admits land under delta/v=K with a _COMMIT marker "
    "(torn admits invisible; incremental == rebuild pytest-pinned). "
    "Value-identical to q_bm25 by contract — both answer to the SAME "
    "relational oracle.",
)
def q_bm25_persisted(spark, sf_dir):
    from ..operators.retrieval import bm25_persisted

    root = _ensure_textidx_root(spark, sf_dir)
    return bm25_persisted(spark, root, ["spark", "vector", "query"]).select(
        "doc_id",
        "s_spark",
        "s_vector",
        "s_query",
        F.round("bm25", 6).alias("bm25_r"),
    )
