"""[EXT] Driver-facing queries for the training-data curation operators
(`operators/curation.py`): deterministic hash splits, train/eval
decontamination, and concat-and-chunk sequence packing.

No reference citation by definition (SURVEY.md §0 extension mandate). All
logic is native Spark SQL expressions; md5 is the cross-engine hash so each
query is DuckDB-oracle-checkable bit-for-bit.

Determinism notes (registry conventions):
- split assignment is md5-derived, never RNG — identical in both engines;
- contamination threshold 0.5 was margin-checked against testdata: the
  nearest overlap_share is >0.13 from the cut at sf0.001 AND sf0.01, and
  the flag is non-vacuous (docs on both sides) at both sfs;
- overlap_share is a ratio of two exact BIGINTs surfaced as DOUBLE — one
  IEEE division, no summation-order nondeterminism;
- pack_chunks orders by the globally-unique doc_id within each group, so
  the running sum is fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register
from ..operators.curation import (
    contamination_report,
    hash_split,
    leakage_safe_split,
    pack_chunks,
)


def _docs(spark, sf_dir):
    # spread_scan (r14 opt, guide §2.5) — see plans/text_pipeline._docs
    from ..session import spread_scan

    return spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


# DuckDB equivalent of operators.curation.hash_bucket (salt "split-v1:").
_SPLIT_BUCKET_SQL = (
    "CAST(CAST('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8) "
    "AS BIGINT) % 100 AS BIGINT)"
)

_SPLIT_CTE = f"""
split_assign AS (
  SELECT *, {_SPLIT_BUCKET_SQL} AS split_bucket FROM documents
)"""


@register(
    "q_hash_split",
    f"""WITH {_SPLIT_CTE}
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 80 THEN 'train'
            WHEN split_bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM split_assign""",
    doc="[EXT] deterministic md5 train/val/test split — map-only, no shuffle, "
    "stable under corpus growth (new docs never move existing ones)",
)
def q_hash_split(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return hash_split(d).select("doc_id", "split_bucket", "split")


@register(
    "q_split_leakage_safe",
    """WITH norm AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g'))) AS fp
  FROM documents),
grp AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS group_id FROM norm),
b AS (SELECT doc_id, group_id,
             CAST(CAST('0x' || substr(md5('gsplit-v1:' || CAST(group_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS BIGINT) AS split_bucket
      FROM grp)
SELECT doc_id, group_id, split_bucket,
       CASE WHEN split_bucket < 80 THEN 'train'
            WHEN split_bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b""",
    doc="[EXT] leakage-safe split (operators/curation.py::leakage_safe_split): "
    "the split hash is taken over the canonical id of each exact-duplicate "
    "class (min doc_id per normalized-text fingerprint), so duplicates can "
    "never straddle the train/eval boundary — the leak q_hash_split alone "
    "permits. One fingerprint-partitioned window (the exact-dedup shuffle "
    "class); group-atomicity is pinned by a pytest property on planted dups.",
)
def q_split_leakage_safe(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return leakage_safe_split(d).select(
        "doc_id", "group_id", "split_bucket", "split"
    )


_SHINGLE_BODY = """(
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3
         THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
         ELSE []::VARCHAR[] END)) AS shingle
  FROM {tok_src})"""


@register(
    "q_contamination",
    f"""WITH {_SPLIT_CTE},
train AS (SELECT * FROM split_assign WHERE split_bucket < 80),
eval AS (SELECT * FROM split_assign WHERE split_bucket >= 90),
tok_tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM train),
tok_ev AS (SELECT doc_id, string_split(text, ' ') AS w FROM eval),
sh_tr AS {_SHINGLE_BODY.format(tok_src="tok_tr")},
sh_ev AS (SELECT DISTINCT shingle FROM {_SHINGLE_BODY.format(tok_src="tok_ev")} s),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
          FROM sh_tr GROUP BY doc_id),
hits AS (SELECT sh_tr.doc_id, CAST(count(*) AS BIGINT) AS _hits
         FROM sh_tr JOIN sh_ev USING (shingle) GROUP BY sh_tr.doc_id)
SELECT sizes.doc_id,
       CAST(COALESCE(_hits, 0) AS BIGINT) AS n_shared_shingles,
       n_shingles,
       CAST(COALESCE(_hits, 0) AS DOUBLE) / CAST(n_shingles AS DOUBLE)
         AS overlap_share,
       (CAST(COALESCE(_hits, 0) AS DOUBLE) / CAST(n_shingles AS DOUBLE)) >= 0.5
         AS contaminated
FROM sizes LEFT JOIN hits ON sizes.doc_id = hits.doc_id""",
    doc="[EXT] train/eval decontamination: per-train-doc k-gram overlap with "
    "the broadcast eval shingle set; threshold 0.5 margin-checked (>0.13 at "
    "sf0.001/sf0.01, non-vacuous both sides)",
)
def q_contamination(spark, sf_dir):
    d = hash_split(_docs(spark, sf_dir))
    train = d.filter(F.col("split") == "train")
    ev = d.filter(F.col("split") == "test")
    return contamination_report(train, ev, k=3, threshold=0.5)


@register(
    "q_semantic_contamination",
    """WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings),
t AS (SELECT * FROM v WHERE vec_id % 4 <> 1),
ev AS (SELECT * FROM v WHERE vec_id % 4 = 1),
hits AS (
  SELECT t.vec_id, CAST(count(*) AS BIGINT) AS _n,
         max(list_dot_product(t.e, ev.e) / (t.n * ev.n)) AS _max
  FROM t JOIN ev ON list_dot_product(t.e, ev.e) / (t.n * ev.n) >= 0.35
  GROUP BY t.vec_id)
SELECT t.vec_id,
       CAST(COALESCE(_n, 0) AS BIGINT) AS n_eval_hits,
       round(_max, 4) AS max_cos_r,
       COALESCE(_n, 0) > 0 AS contaminated
FROM t LEFT JOIN hits USING (vec_id)""",
    doc="[EXT] SEMANTIC train/eval decontamination "
    "(operators/curation.py::semantic_contamination_report): per-train-"
    "vector overlap with the eval slice (vec_id%4=1 — the incremental-"
    "dedup batch convention) in embedding space, catching paraphrase-"
    "level leaks k-gram overlap can't see. Eval side ships whole to "
    "every executor (MBs of benchmarks vs TBs of corpus); the PRODUCTION "
    "scorer drives this query: one Arrow-batched BLAS gemm per corpus "
    "batch against the eval matrix — map-only, zero corpus shuffle "
    "(8.4x the in-plan fold at sf0.1: 7.7 s -> 0.92 s; the fold is the "
    "agreement-tested reference path, tests/test_curation.py). "
    "Cosine semantics follow the bit-stable q_ann_cosine fold; max_cos_r rounds "
    "AFTER all comparisons. Margins measured at sf0.001/0.01: nearest "
    "pair >= 3.8e-5 from the 0.35 cut, every per-row max >= 1.8e-7 from "
    "its 4dp rounding half-boundary (engine noise ~1e-13); non-vacuous "
    "both sides (78/375 and 81/375 train rows contaminated).",
)
def q_semantic_contamination(spark, sf_dir):
    from ..operators.curation import semantic_contamination_report

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_contamination_report(
        v.filter(F.col("vec_id") % 4 != 1),
        v.filter(F.col("vec_id") % 4 == 1),
        threshold=0.35,
    )


@register(
    "q_pack_chunks",
    """WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
w AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tokens_before
  FROM t)
SELECT doc_id, source, n_tokens,
       CAST(tokens_before // 512 AS BIGINT) AS chunk_id,
       CAST(tokens_before % 512 AS BIGINT) AS chunk_offset
FROM w""",
    doc="[EXT] concat-and-chunk sequence packing: running-sum window per "
    "source group, cut every 512 tokens; parallelism = group count",
)
def q_pack_chunks(spark, sf_dir):
    return pack_chunks(_docs(spark, sf_dir), budget=512, group_col="source")


@register(
    "q_hot_ngrams",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 5
         THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w) - 3)]
         ELSE []::VARCHAR[] END)) AS ngram
  FROM t)
SELECT ngram, CAST(count(*) AS BIGINT) AS doc_freq
FROM sh GROUP BY ngram HAVING count(*) >= 3""",
    doc="[EXT] cross-document repeated 5-grams (memorization-risk scan): "
    "per-doc distinct shingles -> one keyed count agg (map-side combine), "
    "min_df filter right after the agg. Non-vacuous: 74-91 hot 5-grams in "
    "testdata at sf0.001/sf0.01.",
)
def q_hot_ngrams(spark, sf_dir):
    from ..operators.curation import hot_ngrams

    return hot_ngrams(_docs(spark, sf_dir), n=5, min_df=3)


@register(
    "q_quality_budget",
    """WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                  w -> w IN ('the','a','of','to','and'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents),
ranked AS (
  SELECT *, CAST(SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY stop_ratio DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_tokens
  FROM scored)
SELECT doc_id, lang, n_tokens, stop_ratio, cum_tokens
FROM ranked WHERE cum_tokens <= 2000""",
    doc="[EXT] token-budget corpus selection: per-language quality ranking "
    "(stopword ratio = one IEEE division of exact ints, ties on unique id) "
    "+ running token sum, keep while within the 2000-token quota — the "
    "'fill the mixture' curation step. Non-vacuity checked: every lang "
    "keeps some docs and drops some at both sfs.",
)
def q_quality_budget(spark, sf_dir):
    from ..operators.curation import quality_budget_select

    return quality_budget_select(_docs(spark, sf_dir), budget=2000)


# Testdata documents are synthetic word-salad with no PII, so the query
# plants deterministic PII (email/phone/IP derived from doc_id) in-plan in
# BOTH engines before redacting — the redaction regexes must genuinely find
# and mask 3 items per row for the hash to match (non-vacuity by design:
# every row has n_emails = n_phones = n_ips = 1).
_PII_PLANT_SQL = """SELECT doc_id,
         substr(text, 1, 80) || ' reach me at user' || CAST(doc_id AS VARCHAR)
         || '@mail.example.com or +1 555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
           AS text
  FROM documents"""


@register(
    "q_pii_redact",
    """WITH planted AS (
  {plant})
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
           '(?:\\+?1[ -])?555-[0-9]{{4}}', '<PHONE>', 'g'),
           '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g')
         AS redacted,
       CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text,
           '(?:\\+?1[ -])?555-[0-9]{{4}}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text,
           '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS BIGINT) AS n_ips
FROM planted""".format(plant=_PII_PLANT_SQL),
    doc="[EXT] PII redaction (email/phone/IPv4 masking + audit counts) over "
    "deterministically planted PII. Map-only chained regexp_replace — scan-"
    "speed at 100 TB, zero shuffle. Regexes restricted to the Java-regex ∩ "
    "RE2 common subset (no lookaround/backreferences).",
)
def q_pii_redact(spark, sf_dir):
    from ..operators.curation import redact_pii

    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return redact_pii(planted)


@register(
    "q_chunk_overlap",
    """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, w, n_tokens,
         unnest(range(0, n_tokens, 24)) AS st
  FROM t)
SELECT doc_id,
       CAST(st // 24 AS BIGINT) AS chunk_id,
       CAST(st AS BIGINT) AS chunk_start,
       CAST(least(32, n_tokens - st) AS BIGINT) AS chunk_len,
       array_to_string(w[st + 1 : st + 32], ' ') AS chunk_text,
       n_tokens
FROM s""",
    doc="[EXT] sliding-window chunking (32-token chunks, stride 24, tail "
    "kept) — the RAG/embedding-ingest layout. Per-row sequence+posexplode+"
    "slice: no shuffle, embarrassingly parallel; DuckDB range() is end-"
    "exclusive and Spark sequence() end-inclusive, so the Spark bound is "
    "n_tokens-1. Non-vacuous: docs span 1-4 chunks at every sf.",
)
def q_chunk_overlap(spark, sf_dir):
    from ..operators.curation import chunk_with_overlap

    return chunk_with_overlap(_docs(spark, sf_dir), chunk_tokens=32, stride=24)


@register(
    "q_corpus_mix",
    """WITH per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM per),
w AS (
  SELECT lang, cnt, sqrt(CAST(cnt AS DOUBLE)) AS sq,
         sum(sqrt(CAST(cnt AS DOUBLE))) OVER (
           ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM per),
t AS (SELECT lang, cnt, sq, max(cum) OVER () AS stot FROM w)
SELECT lang, cnt,
       round(CAST(cnt AS DOUBLE) / n, 6) AS nat_share,
       round(sq / stot, 6) AS mix_weight,
       CAST(floor(sq / stot * 100000) AS BIGINT) AS target_per_100k
FROM t CROSS JOIN tot
ORDER BY lang""",
    doc="[EXT] temperature-resampled corpus mixing (alpha=0.5 a la "
    "multilingual-LM sampling): per-language counts -> weight_i = "
    "sqrt(c_i) / sum_j sqrt(c_j), flattening the natural distribution "
    "toward low-resource languages. One keyed agg (|languages| groups) + "
    "window math on the broadcast-sized result — at 100 TB only the "
    "group-by scans data. Cross-engine determinism: sqrt is IEEE "
    "correctly-rounded; the sqrt-sum uses an ORDER BY lang running frame "
    "(sequential accumulation, identical order in both engines) and the "
    "total is max(cum) (order-free); margins to the 6dp rounding / floor "
    "boundaries are >= 7e-8 at sf0.001/0.01/0.1 (vs ~1e-15 fp noise).",
)
def q_corpus_mix(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    per = d.groupBy("lang").agg(F.count("*").cast("long").alias("cnt"))
    w_run = Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    sq = F.sqrt(F.col("cnt").cast("double"))
    t = per.select(
        "lang",
        "cnt",
        sq.alias("sq"),
        F.sum(sq).over(w_run).alias("cum"),
    ).select(
        "lang", "cnt", "sq", F.max("cum").over(w_all).alias("stot"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    return t.select(
        "lang",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias("nat_share"),
        F.round(F.col("sq") / F.col("stot"), 6).alias("mix_weight"),
        F.floor(F.col("sq") / F.col("stot") * 100000)
        .cast("long")
        .alias("target_per_100k"),
    ).orderBy("lang")


@register(
    "q_stratified_sample",
    """SELECT doc_id, lang, CAST(rk AS BIGINT) AS sample_rank
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
WHERE rk <= 20
ORDER BY lang, sample_rank""",
    doc="[EXT] stratified sampling: exactly 20 docs per language, chosen "
    "by deterministic pseudo-random order (md5 of the id — seeded-uniform "
    "and engine-identical, vs RNG which the oracle could never replay). "
    "One keyed shuffle on lang + per-group local sort (the standard "
    "distributed top-n-per-group); the md5 order is computed on the fly, "
    "so no stored random column is needed. Complements q_hash_sample "
    "(bernoulli-style rate sampling) with exact per-stratum counts — the "
    "shape used for eval-set carving and per-language budget fills.",
)
def q_stratified_sample(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("sample_rank"))
        .orderBy("lang", "sample_rank")
    )


@register(
    "q_weighted_sample",
    """WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         (CAST(CAST('0x' || substr(md5('wsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 4294967296 AS DOUBLE) + 1)
           / 4294967298 AS u
  FROM documents),
keyed AS (
  SELECT doc_id, dl, round(ln(u) / dl, 9) AS key_r FROM base)
SELECT doc_id, dl, key_r
FROM keyed ORDER BY key_r DESC, doc_id LIMIT 100""",
    doc="[EXT] deterministic weighted sampling (Efraimidis-Spirakis A-Res "
    "order): weight = token count, u = md5-hash uniform in (0,1) (exact "
    "integer arithmetic -> one exact double division), key = ln(u)/w — "
    "the top-k by key IS a weighted sample without replacement, "
    "reproducible under reruns/backfills in any engine (the weighted "
    "counterpart of q_hash_sample; the sampling step every "
    "quality-weighted corpus selection needs). Determinism: keys rounded "
    "at 9dp before the ordering (1-ulp cross-engine ln noise ~1e-16 "
    "cannot flip the cut), doc_id tie-break. Map-only per-row keys + one "
    "TakeOrdered — no shuffle beyond the top-k merge.",
)
def q_weighted_sample(spark, sf_dir):
    d = _docs(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsample-v1:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = ((h % F.lit(4294967296)).cast("double") + 1) / F.lit(4294967298)
    return (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("dl"),
            u.alias("u"),
        )
        .select(
            "doc_id",
            "dl",
            F.round(F.log(F.col("u")) / F.col("dl"), 9).alias("key_r"),
        )
        .orderBy(F.desc("key_r"), "doc_id")
        .limit(100)
    )


_SHARD_BUCKET_SQL = (
    "CAST(CAST('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)), 1, 8) "
    "AS BIGINT) % 16 AS BIGINT)"
)


@register(
    "q_training_shards",
    f"""WITH s AS (
  SELECT {_SHARD_BUCKET_SQL} AS shard_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents),
per AS (
  SELECT shard_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         CAST(sum(n_chars) AS BIGINT) AS shard_chars
  FROM s GROUP BY shard_id)
SELECT shard_id, n_docs, shard_tokens, shard_chars,
       CAST(shard_tokens AS DOUBLE) / CAST(sum(shard_tokens) OVER () AS DOUBLE)
         AS token_share
FROM per""",
    doc="[EXT] training-shard balance plan (operators/curation.py::"
    "shard_stats): md5-deterministic shard routing (the dataloader-facing "
    "final layout — write_training_shards emits one file per shard in id "
    "order) with per-shard doc/token/char counts and token share. The "
    "skew check run BEFORE committing a 100 TB reshard: one map-side-"
    "combinable agg; the share window runs on the n_shards-row aggregate. "
    "token_share is one IEEE division of exact BIGINTs.",
)
def q_training_shards(spark, sf_dir):
    from ..operators.curation import shard_stats

    return shard_stats(_docs(spark, sf_dir), n_shards=16)
