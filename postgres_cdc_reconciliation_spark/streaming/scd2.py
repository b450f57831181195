"""[EXT] Streaming SCD type-2 history maintenance.

The batch operator (operators/temporal.py::scd2_build) turns a changelog
into a version-history table; this module keeps that history CONTINUOUSLY
up to date from the CDC stream — the history-table sibling of the live-
snapshot apply path (operators/apply.py::apply_stream, S7/T2): the same
Debezium feed, but instead of last-writer-wins it closes the open version
and appends a new one per change.

Layout & cost model (shared with the apply target): the history is stored
PK-hash-bucketed (``_bucket = pmod(xxhash64(key), n)``); a micro-batch
reads (partition-pruned) and dynamic-overwrites only the buckets its keys
hash into — per-batch IO is O(delta x bucket_size), never O(history).
Unlike the apply target, history buckets only ever GROW (a delete closes a
version, it never removes rows), so the deleted-bucket-dir cleanup the
apply path needs does not arise here.

Crash/replay safety: the merge itself carries a per-key seq guard
(scd2_merge_batch step 1) — re-delivered events whose seq is already
recorded in the history are dropped, so an at-least-once replay rewrites
the touched buckets with byte-identical content. The merged frame is
localCheckpoint-ed before the overwrite so the write never reads the files
it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.apply import (
    DEFAULT_TARGET_BUCKETS,
    _has_data_files,
    _path_exists,
    bucket_expr,
    write_bucketed_target,
)
from ..operators.temporal import scd2_build, scd2_merge_batch


def read_history(spark, history_path: str) -> DataFrame:
    """The current SCD2 history, hiding the internal bucket column."""
    df = spark.read.parquet(history_path)
    return df.drop("_bucket") if "_bucket" in df.columns else df


def scd2_stream(
    changelog: DataFrame,
    history_path: str,
    checkpoint_dir: str,
    key: str,
    seq: str,
    attrs: list[str],
    op_col: str = "op",
    delete_op: str = "d",
    n_buckets: int = DEFAULT_TARGET_BUCKETS,
):
    """foreachBatch writer maintaining an SCD2 history table from a stream.

    Returns an un-started ``DataStreamWriter`` (call ``.start()`` /
    ``.trigger(...)`` yourself, same contract as apply_stream).
    """
    spark = changelog.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dynamic = False
        # dataless-but-existing dir (empty-seed bootstrap, pre-created
        # path) is a first batch, not a schema-inference crash — positive
        # emptiness check, listing failures stay loud (apply._has_data_files)
        if _path_exists(spark, history_path) and _has_data_files(
            spark, history_path
        ):
            raw = spark.read.parquet(history_path)
            if "_bucket" in raw.columns:
                # history pruning recomputes bucket ids from the caller's
                # n_buckets; a mismatched count (missed versions →
                # double-append, ADVICE r5) is caught loudly by
                # write_bucketed_target's pre-write validation before
                # anything lands on disk — one sidecar read per batch
                delta_buckets = [
                    r[0]
                    for r in batch_df.select(
                        bucket_expr([key], n_buckets).alias("_bucket")
                    )
                    .distinct()
                    .collect()
                ]  # bounded by n_buckets — ints, never rows
                hist = raw.filter(F.col("_bucket").isin(delta_buckets)).drop(
                    "_bucket"
                )
                dynamic = True
            else:  # legacy unpartitioned history: one-time O(history) migrate
                hist = raw
            new_hist = scd2_merge_batch(
                hist, batch_df, key, seq, attrs, op_col, delete_op
            )
        else:  # first batch bootstraps the history
            new_hist = scd2_build(batch_df, key, seq, attrs, op_col, delete_op)
        new_hist = new_hist.localCheckpoint(eager=True)
        write_bucketed_target(
            new_hist, history_path, [key], n_buckets, dynamic=dynamic
        )

    return (
        changelog.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
