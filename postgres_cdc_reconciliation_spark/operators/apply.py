"""CDC upsert/delete apply — the sink-side core operator (S7/T2/T3).

The reference delegates this to the Debezium JDBC sink
(jdbc-sink-connector-config.json:10-17: insert.mode=upsert,
primary.key.mode=record_key, delete.enabled=true): for each primary key the
LAST change event wins, and a delete removes the row.

Spark-first design:

- ``latest_per_key``: one hash aggregation with ``max_by(struct(*), lsn)`` —
  map-side partial aggregation collapses each key to its newest event
  *before* the shuffle, so shuffle volume is O(distinct keys in the batch),
  not O(events). This beats the row_number()-window formulation (full
  sort-per-partition, no partial agg) — the difference between one combine
  shuffle and a sort at 100 TB.
- ``apply_batch``: merge the deduped delta into the target by PK —
  upserts + delete handling in one join. Idempotent: re-applying the same
  batch yields the same target (exactly-once effect under retries, T2).
- ``apply_stream``: foreachBatch wrapper for Structured Streaming.

At cluster scale the target should be a transactional table format
(Delta/Iceberg MERGE); on plain parquet we express the merge as
anti-join + union, partitioned by the PK hash so successive batches
co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lsn import lsn_to_long


def latest_per_key(
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "source_lsn",
    lsn_is_text: bool = True,
) -> DataFrame:
    """Collapse a micro-batch to the newest event per key (last-writer-wins).

    max_by over a struct of all columns keyed by the BIGINT LSN; ties are
    impossible (LSN strictly increases per key — Debezium per-key ordering,
    SURVEY.md §7 delta 6).
    """
    lsn_long = (
        lsn_to_long(lsn_col) if lsn_is_text else F.col(lsn_col).cast("long")
    )
    payload = F.struct(*[F.col(c) for c in events.columns])
    agg = events.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(payload, lsn_long).alias("_latest")
    )
    return agg.select("_latest.*")


def apply_batch(
    target: DataFrame,
    events: DataFrame,
    key_cols: list[str],
    lsn_col: str = "source_lsn",
    op_col: str = "op",
    drop_cols: tuple[str, ...] = ("op", "source_lsn", "ts_ms", "__deleted"),
) -> DataFrame:
    """Apply unwrapped change events to a target snapshot.

    Semantics (jdbc-sink-connector-config.json:10-17): per key take the
    newest event; 'd' removes the row, anything else upserts the after-image.
    Returns the new target snapshot (anti-join out touched keys, union in
    survivors).
    """
    latest = latest_per_key(events, key_cols, lsn_col=lsn_col)
    touched_keys = latest.select(*key_cols)
    upserts = latest.filter(F.col(op_col) != "d").drop(*drop_cols)
    untouched = target.join(touched_keys, key_cols, "left_anti")
    return untouched.unionByName(upserts.select(*target.columns))


def apply_stream(
    parsed_unwrapped: DataFrame,
    target_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    frontier_path: str | None = None,
):
    """Continuous apply: foreachBatch merge + frontier advance (T2+T5).

    Each micro-batch: dedupe to latest-per-key, merge into the parquet
    target, then append the new frontier (max applied LSN) — the engine's
    analog of confirmed_flush_lsn (check_batch_replication_status.sql:74-77).
    The control write happens after the data write (commit-marker ordering,
    data_generator.py:96-121 analog); replaying a batch is idempotent.
    """
    from ..streaming.frontier import append_frontier

    spark = parsed_unwrapped.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            target = spark.read.parquet(target_path)
            new_target = apply_batch(target, batch_df, key_cols)
        except Exception:  # first batch: no target yet
            new_target = apply_batch(
                batch_df.limit(0).drop("op", "source_lsn", "ts_ms", "__deleted"),
                batch_df,
                key_cols,
            )
        new_target.write.mode("overwrite").parquet(target_path + "_next")
        spark.read.parquet(target_path + "_next").write.mode("overwrite").parquet(
            target_path
        )
        if frontier_path is not None:
            append_frontier(batch_df, frontier_path, batch_id)

    return (
        parsed_unwrapped.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
