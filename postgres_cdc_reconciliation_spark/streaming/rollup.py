"""[EXT] Incremental time-bucket rollup — a continuous aggregate the stream
maintains (hypertable-rollup analog).

Each micro-batch computes its partial per-bucket aggregates and MERGES them
into the persisted rollup by (bucket, key): counts and sums add, so the
merge is associative and idempotent-safe under replays when paired with the
batch-id high-water mark. This is the streaming counterpart of a
materialized GROUP BY date_trunc(...) — query latency O(buckets), not
O(events), no matter how much history accumulates.

Sums are kept as DECIMAL(20,2) end-to-end (exact, mergeable); the merge is
an outer join + add — one keyed shuffle of bucket-cardinality rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial(batch: DataFrame, ts_col: str, key_cols: list[str], value_col: str, bucket: str) -> DataFrame:
    return (
        batch.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"), *key_cols
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).try_cast("decimal(20,2)")).alias("total"),
        )
    )


def merge_rollup(
    existing: DataFrame | None, partial: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Merge a micro-batch's partial aggregates into the rollup state."""
    if existing is None:
        return partial
    keys = ["bucket_start", *key_cols]
    e = existing.select(
        *keys,
        F.col("n_events").alias("e_n"),
        F.col("total").alias("e_t"),
    )
    p = partial.select(
        *keys,
        F.col("n_events").alias("p_n"),
        F.col("total").alias("p_t"),
    )
    return (
        e.join(p, keys, "full_outer")
        .select(
            *keys,
            (F.coalesce("e_n", F.lit(0)) + F.coalesce("p_n", F.lit(0))).alias(
                "n_events"
            ),
            (
                F.coalesce(F.col("e_t"), F.lit(0).cast("decimal(20,2)"))
                + F.coalesce(F.col("p_t"), F.lit(0).cast("decimal(20,2)"))
            )
            .cast("decimal(20,2)")
            .alias("total"),
        )
    )


def _fs(spark, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def committed_versions(spark, rollup_path: str) -> list[int]:
    """Batch-ids of rollup snapshots whose write fully committed (_SUCCESS)."""
    fs, jpath = _fs(spark, rollup_path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("v="):
            success = spark._jvm.org.apache.hadoop.fs.Path(
                status.getPath(), "_SUCCESS"
            )
            if fs.exists(success):
                out.append(int(name[2:]))
    return sorted(out)


def current_rollup(spark, rollup_path: str) -> DataFrame | None:
    """The latest committed rollup snapshot (None before the first commit)."""
    versions = committed_versions(spark, rollup_path)
    if not versions:
        return None
    return spark.read.parquet(f"{rollup_path}/v={versions[-1]}")


def rollup_stream(
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    bucket: str = "hour",
    keep_versions: int = 2,
):
    """foreachBatch writer maintaining the rollup table incrementally.

    Replay safety (foreachBatch is at-least-once): each micro-batch commits a
    full rollup snapshot at ``{rollup_path}/v={batch_id}`` — the _SUCCESS
    marker is the commit record, and the max committed version is the
    high-water mark. A replayed batch (batch_id <= high-water) is skipped, so
    its partial aggregates can never double-merge. A crash mid-write leaves
    an uncommitted v-dir that the replay simply overwrites from the previous
    committed version — the merge input is always a *committed* snapshot,
    never a partial write. Old versions are pruned after commit
    (``keep_versions``); snapshots are bucket-cardinality-sized, so a
    version's cost is O(buckets), not O(events).
    """
    key_cols = key_cols or []
    spark = events.sparkSession
    # key identity: rollup rows are keyed by the bucket-truncated ts and
    # key_cols over value_col — a restart with a different granularity
    # (hour -> day) or value column would merge differently-keyed partials
    # into one table silently (r13 guard; see streaming/state_guard.py)
    from .state_guard import check_or_stamp_params

    check_or_stamp_params(
        spark,
        rollup_path,
        {
            "kind": "rollup",
            "ts_col": ts_col,
            "key_cols": list(key_cols),
            "value_col": value_col,
            "bucket": bucket,
        },
        has_state=bool(committed_versions(spark, rollup_path)),
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = committed_versions(spark, rollup_path)
        if versions and batch_id <= versions[-1]:
            return  # at-least-once replay of an already-merged batch
        existing = (
            spark.read.parquet(f"{rollup_path}/v={versions[-1]}")
            if versions
            else None
        )
        partial = _partial(batch_df, ts_col, key_cols, value_col, bucket)
        merged = merge_rollup(existing, partial, key_cols)
        merged.write.mode("overwrite").parquet(f"{rollup_path}/v={batch_id}")
        # prune: keep the newest `keep_versions` committed snapshots
        fs, _ = _fs(spark, rollup_path)
        for v in committed_versions(spark, rollup_path)[:-keep_versions]:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(f"{rollup_path}/v={v}"), True
            )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
