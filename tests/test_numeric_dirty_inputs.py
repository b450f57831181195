"""Whole-registry numeric-dirt sweep.

The round-7 dirty-row sweep (tests/test_dirty_inputs.py) covered NULL/empty
TEXT and embeddings; this one covers the numeric half of real-corpus dirt:
NaN / ±Inf / NULL / negative / extreme-magnitude doubles in every measure
column, NaN-and-Inf COMPONENTS inside otherwise well-formed embedding
vectors, malformed JSON in ``events.props``, and one far-future timestamp
outlier (the classic grid-explosion hazard for anything that builds a
min→max time range). Every registered query must complete — a dirty value
may propagate (NaN in, NaN out) but must never kill the job or blow up an
intermediate.

Spark-specific hazards this is aimed at: NaN sorts ABOVE every double in
ORDER BY/windows (unlike the SQL NULL rules), ±Inf arithmetic produces
NaN on subtraction, ANSI mode raises on some NaN→int casts, and
``sequence()`` on an outlier-stretched range tries to materialize the
whole span.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.plans.registry import all_queries

NAN = float("nan")
INF = float("inf")


@pytest.fixture(scope="session")
def numdirty_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("numdirty_sf")
    for t in "region nation customer supplier part".split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li = (
        li.withColumn(
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
    )
    li.write.mode("overwrite").parquet(str(root / "lineitem.parquet"))

    od = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 23 == 0, F.lit(NAN))
        .when(F.col("o_orderkey") % 23 == 1, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice")),
    )
    od.write.mode("overwrite").parquet(str(root / "orders.parquet"))

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
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
    )
    ev.write.mode("overwrite").parquet(str(root / "events.parquet"))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
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
    )
    emb.write.mode("overwrite").parquet(str(root / "embeddings.parquet"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 19 == 0, F.lit(-1).cast("long"))
        .when(F.col("doc_id") % 19 == 1, F.lit(None).cast("long"))
        .otherwise(F.col("n_chars")),
    )
    docs.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_numeric_dirty_input(name, spark, numdirty_dir):
    rows = all_queries()[name].fn(spark, numdirty_dir).collect()
    assert rows is not None
