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
            F.sum(F.col(value_col).cast("decimal(20,2)")).alias("total"),
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


def rollup_stream(
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    bucket: str = "hour",
):
    """foreachBatch writer maintaining the rollup table incrementally."""
    key_cols = key_cols or []
    spark = events.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = _partial(batch_df, ts_col, key_cols, value_col, bucket)
        try:
            existing = spark.read.parquet(rollup_path)
        except Exception:
            existing = None
        merged = merge_rollup(existing, partial, key_cols)
        merged.write.mode("overwrite").parquet(rollup_path + "_next")
        spark.read.parquet(rollup_path + "_next").write.mode("overwrite").parquet(
            rollup_path
        )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
