"""Completeness frontier — the engine's confirmed_flush_lsn (T5/T6/F11).

The reference reads replication progress from the slot's
confirmed_flush_lsn (check_batch_replication_status.sql:74-82) and decides
"batch complete ⟺ frontier ≥ batch completion LSN". Our engine owns that
signal: every applied micro-batch appends its max applied LSN per table to a
small frontier table; the status operators read MAX(applied_lsn) as the
frontier. This is an *event-progress* watermark (monotone high-water mark),
not Spark's lateness watermark — a plain aggregate, no custom operator.

Append-only + max() read = safe under retries (re-appending an old frontier
never moves the max backwards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lsn import long_to_lsn, lsn_to_long


def append_frontier(applied: DataFrame, frontier_path: str, batch_id: int) -> None:
    """Record max applied LSN of a micro-batch (per source table if tagged)."""
    row = applied.agg(
        F.max(lsn_to_long("source_lsn")).alias("applied_lsn_long"),
        F.count("*").alias("n_events"),
    ).withColumn("micro_batch_id", F.lit(batch_id))
    row.write.mode("append").parquet(frontier_path)


def current_frontier(spark, frontier_path: str) -> DataFrame:
    """The frontier: max applied LSN across all recorded micro-batches."""
    f = spark.read.parquet(frontier_path)
    return f.agg(
        F.max("applied_lsn_long").alias("frontier_lsn_long")
    ).withColumn("frontier_lsn", long_to_lsn("frontier_lsn_long"))
