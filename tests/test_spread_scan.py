"""session.spread_scan — the degenerate-scan fan-out guard (r14 opt).

Contract: a source carrying fewer partitions than half the session's
default parallelism is round-robin repartitioned to the default
parallelism; an already-parallel source is returned UNTOUCHED (the
at-scale no-op that keeps the helper free on healthy many-file tables).
Values are bit-identical either way — only row→task placement changes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.session import spread_scan


def test_single_partition_source_fans_out(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert df.rdd.getNumPartitions() == 1  # the single-row-group shape
    out = spread_scan(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # bit-identical rows, only placement changed
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b


def test_parallel_source_is_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(10_000, numPartitions=max(2, target))
    out = spread_scan(df)
    assert out is df  # no repartition node added


def test_halfway_threshold(spark):
    target = spark.sparkContext.defaultParallelism
    if target < 4:
        return  # threshold indistinguishable below 4 cores
    # ceil-half: for odd targets, floor-half * 2 < target would still fan
    # out (ADVICE r14) — the left-alone case needs cur * 2 >= target
    half = (target + 1) // 2
    # >= half the parallelism: left alone
    ok = spark.range(1000, numPartitions=half)
    assert spread_scan(ok) is ok
    # < half: fanned out
    low = spark.range(1000, numPartitions=max(1, half - 1))
    assert spread_scan(low).rdd.getNumPartitions() == target


def test_fanout_is_deterministic(spark):
    # sort-before-repartition (SPARK-23207) makes the round-robin
    # assignment reproducible: two evaluations place identical row sets
    # in identical partitions
    df = spark.range(5_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    ).coalesce(1)
    out = spread_scan(df)
    def layout(d):
        return sorted(
            (pid, tuple(sorted(rows)))
            for pid, rows in d.rdd.mapPartitionsWithIndex(
                lambda i, it: [(i, [tuple(r) for r in it])]
            ).collect()
        )
    assert layout(out) == layout(out)
