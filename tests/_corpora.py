"""Shared builders for the dirty-corpus variants used by the robustness
sweeps (tests/test_dirty_inputs.py, tests/test_numeric_dirty_inputs.py,
tests/test_skew_inputs.py) and by the scripts that measure against the
same corpora (scripts/skew_probe_r7.py,
scripts/dirty_determinism_sweep_r7.py).

One definition per dirt class — the round-7 review caught the
copy-pasted builders drifting (a script's numdirty copy had silently
dropped four of the test fixture's mutations, overstating the sweep's
coverage), so the transforms live here and everywhere else imports them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

NAN = float("nan")
INF = float("inf")

_PASSTHROUGH = "region nation customer supplier part".split()
ALL_TABLES = _PASSTHROUGH + [
    "lineitem",
    "orders",
    "events",
    "documents",
    "embeddings",
]


def _copy(spark, src: str, dst: str, tables) -> None:
    for t in tables:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )


def build_dirty_text(spark, src: str, dst: str) -> str:
    """~3/17 of documents NULL/empty/whitespace text, ~2/23 of embeddings
    NULL/empty arrays; every other table copied verbatim."""
    _copy(spark, src, dst, _PASSTHROUGH + ["lineitem", "orders", "events"])
    spark.read.parquet(f"{src}/documents.parquet").withColumn(
        "text",
        F.when(F.col("doc_id") % 17 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 17 == 1, F.lit(""))
        .when(F.col("doc_id") % 17 == 2, F.lit("   "))
        .otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    spark.read.parquet(f"{src}/embeddings.parquet").withColumn(
        "embedding",
        F.when(F.col("vec_id") % 23 == 20, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 23 == 21, F.expr("array()").cast("array<float>"))
        .otherwise(F.col("embedding")),
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    return dst


def build_numeric_dirty(spark, src: str, dst: str) -> str:
    """NaN / ±Inf / NULL / negative / 1e300-magnitude doubles in every
    measure column, non-finite components inside embedding vectors,
    malformed JSON props, one far-future timestamp outlier, and negative/
    NULL n_chars."""
    _copy(spark, src, dst, _PASSTHROUGH)
    (
        spark.read.parquet(f"{src}/lineitem.parquet")
        .withColumn(
            "l_quantity",
            F.when(F.col("l_orderkey") % 37 == 0, F.lit(None).cast("double"))
            .when(F.col("l_orderkey") % 37 == 1, F.lit(NAN))
            .when(F.col("l_orderkey") % 37 == 2, F.lit(INF))
            .when(F.col("l_orderkey") % 37 == 3, F.lit(-1.0))
            .otherwise(F.col("l_quantity")),
        )
        .withColumn(
            "l_extendedprice",
            F.when(F.col("l_orderkey") % 37 == 4, F.lit(-INF))
            .when(F.col("l_orderkey") % 37 == 5, F.lit(1e300))
            .otherwise(F.col("l_extendedprice")),
        )
        .withColumn(
            "l_discount",
            F.when(F.col("l_orderkey") % 37 == 6, F.lit(1.0))
            .when(F.col("l_orderkey") % 37 == 7, F.lit(NAN))
            .otherwise(F.col("l_discount")),
        )
        .withColumn(
            "l_tax",
            F.when(F.col("l_orderkey") % 37 == 8, F.lit(None).cast("double"))
            .otherwise(F.col("l_tax")),
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/lineitem.parquet")
    )
    spark.read.parquet(f"{src}/orders.parquet").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 23 == 0, F.lit(NAN))
        .when(F.col("o_orderkey") % 23 == 1, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice")),
    ).write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    (
        spark.read.parquet(f"{src}/events.parquet")
        .withColumn(
            "value",
            F.when(F.col("event_id") % 13 == 0, F.lit(NAN))
            .when(F.col("event_id") % 13 == 1, F.lit(INF))
            .when(F.col("event_id") % 13 == 2, F.lit(-INF))
            .when(F.col("event_id") % 13 == 3, F.lit(1e308))
            .when(F.col("event_id") % 13 == 4, F.lit(None).cast("double"))
            .otherwise(F.col("value")),
        )
        .withColumn(
            "props",
            F.when(F.col("event_id") % 17 == 0, F.lit('{"broken'))
            .when(F.col("event_id") % 17 == 1, F.lit(""))
            .otherwise(F.col("props")),
        )
        .withColumn(
            # ONE far-future outlier: anything building a min→max grid over
            # event time must not try to materialize 74 years of buckets
            "ts",
            F.when(
                F.col("event_id") == 17,
                F.to_timestamp(F.lit("2100-01-01 00:00:00")),
            ).otherwise(F.col("ts")),
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/events.parquet")
    )
    spark.read.parquet(f"{src}/embeddings.parquet").withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % 31 == 0,
            F.concat(
                F.array(F.lit(NAN).cast("float")),
                F.slice(F.col("embedding"), 2, 10000),
            ),
        )
        .when(
            F.col("vec_id") % 31 == 1,
            F.concat(
                F.array(F.lit(INF).cast("float")),
                F.slice(F.col("embedding"), 2, 10000),
            ),
        )
        .otherwise(F.col("embedding")),
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    spark.read.parquet(f"{src}/documents.parquet").withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 19 == 0, F.lit(-1).cast("long"))
        .when(F.col("doc_id") % 19 == 1, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars")),
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    return dst


def build_skew(spark, src: str, dst: str) -> str:
    """Heavy skew planted into every join/group/blocking key: ~30% of
    lineitem on one l_orderkey, ~30% of orders on one o_custkey, ~30% of
    documents with IDENTICAL text, ~30% of embeddings with an IDENTICAL
    vector, ~40% of events on one user_id. events is written LAST — done-
    sentinel checks in callers must key on it."""
    _copy(spark, src, dst, _PASSTHROUGH)
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    hot_order = li.agg(F.min("l_orderkey")).first()[0]
    li.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(hot_order)).otherwise(
            F.col("l_orderkey")
        ),
    ).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    od = spark.read.parquet(f"{src}/orders.parquet")
    hot_cust = od.agg(F.min("o_custkey")).first()[0]
    od.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 < 3, F.lit(hot_cust)).otherwise(
            F.col("o_custkey")
        ),
    ).write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    mode_text = docs.orderBy("doc_id").select("text").first()[0]
    docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3, F.lit(mode_text)).otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    mode_vec = emb.orderBy("vec_id").select(F.col("embedding").alias("_mv")).limit(1)
    emb.crossJoin(F.broadcast(mode_vec)).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 < 3, F.col("_mv")).otherwise(F.col("embedding")),
    ).drop("_mv").write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    ev = spark.read.parquet(f"{src}/events.parquet")
    hot_user = ev.agg(F.min("user_id")).first()[0]
    ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 4, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")
    return dst


def build_unicode_text(spark, src: str, dst: str) -> str:
    """Non-ASCII and outlier-length text: CJK (no whitespace — a whole
    sentence becomes one 'token'), emoji + combining marks, RTL script,
    zero-width joiners embedded in ASCII, and ONE ~300KB mega-document
    (explode/shingle paths must price it per row, not per partition).
    Everything else copied verbatim."""
    _copy(
        spark,
        src,
        dst,
        _PASSTHROUGH + ["lineitem", "orders", "events", "embeddings"],
    )
    cjk = "订单处理系统在高负载下保持一致性。数据湖的清单提交协议与参考实现等价。"
    emoji = "data 🚀🚀 pipeline 👩‍💻 with déjà-vu café naïve résumé ✨"
    rtl = "نظام معالجة الطلبات يحافظ على الاتساق تحت الحمل العالي"
    zwj = "or​der pro‍cess​ing with zero​width chars"
    mega = ("the quick brown fox jumps over the lazy dog " * 7000).strip()
    spark.read.parquet(f"{src}/documents.parquet").withColumn(
        "text",
        F.when(F.col("doc_id") % 13 == 0, F.lit(cjk))
        .when(F.col("doc_id") % 13 == 1, F.lit(emoji))
        .when(F.col("doc_id") % 13 == 2, F.lit(rtl))
        .when(F.col("doc_id") % 13 == 3, F.lit(zwj))
        .when(F.col("doc_id") == 4, F.lit(mega))
        .otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    return dst
