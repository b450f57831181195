"""SparkSession factory with scale-ready defaults.

Defaults are tuned so the same code runs on local[32] for tests and on a
multi-executor cluster unchanged:
- AQE on (runtime coalesce, skew-join splitting, dynamic broadcast),
- UTC session timezone (testdata parquet is TIMESTAMP_NTZ; keeps oracle
  comparisons timezone-free),
- Arrow transfers on (pandas UDF hot paths),
- shuffle partitions sized by env (driver sets SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "postgres-cdc-reconciliation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextmanager
def interactive_profile(spark: SparkSession, shuffle_partitions: int = 8):
    """Session profile for catalog-scale point queries (replication status,
    health reports): metadata inputs are KBs, so AQE's per-stage re-planning
    jobs and wide shuffle fan-out contribute only scheduler latency — no
    runtime re-optimization ever pays for itself at this size. Turning AQE
    off and pinning a small shuffle width cuts the interactive path's
    per-query job count; both confs are restored on exit so analytical
    queries in the same session keep the scale defaults.

    Caveat: session confs are global — an analytical query planned by a
    CONCURRENT thread inside this window is planned at the interactive
    profile (slower, never wrong: these are planner knobs, not write
    semantics — contrast the per-write partitionOverwriteMode option the
    quarantine sink uses for exactly that reason). Serialize interactive
    windows with concurrent analytical planning, or use separate
    sessions."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def spread_scan(df):
    """Fan a degenerately-partitioned source out to the session's default
    parallelism before expensive per-row work (r14 opt, guide §2.5 "input
    skew": one huge unsplittable file → repartition immediately after the
    read).

    A single-row-group parquet file — this testdata's shape, and any
    unsplittable or over-compacted input — plans as ONE scan task, so
    explode/HOF/Arrow-UDF map stages downstream run on one core no matter
    how wide the cluster is. No-op when the scan already carries at least
    half the default parallelism, so on a healthy many-file table this
    adds nothing (the 100 TB case pays zero). The round-robin repartition
    is deterministic (sort-before-repartition, SPARK-23207) and row-local:
    per-row results are bit-identical, only row→task placement changes.
    Callers whose downstream merges DOUBLE partial aggregates must confirm
    merge-order tolerance before adopting (exact-integer/decimal and
    per-row/min/max paths are unconditionally safe)."""
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur * 2 >= target:
        return df
    return df.repartition(target)


def pandas_parallelism(spark: SparkSession) -> int:
    """Partition count for applyInPandas stages whose cost is per-group
    Python/Arrow overhead rather than bytes (DTW DP, per-bucket gemm):
    AQE's byte-based coalescing sees a few MB of shuffle and folds the
    stage to ONE partition, serializing the Python work — repartition by
    the group key with this explicit count to keep the stage parallel."""
    try:
        return max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return spark.sparkContext.defaultParallelism
