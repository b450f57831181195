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
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


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
        F.size(F.split("text", " ")).alias("n_tokens"),
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
        hits.alias("en_stopword_hits"),
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
        n_tokens.alias("n_tokens"),
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
