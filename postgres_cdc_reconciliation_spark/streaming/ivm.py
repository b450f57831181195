"""[EXT] Streaming incremental view maintenance: one CDC stream keeps a
bucketed base TARGET and a derived AGGREGATE VIEW current together, each
micro-batch doing O(touched) work for both.

``operators/ivm.py`` gives the batch algebra (retract the touched keys'
old contribution, add the after-images, merge per-group deltas);
``apply_stream`` keeps the base current but leaves every derived rollup
to full recompute. This module closes the loop: the continuous-query
surface Materialize/Flink sell, re-expressed on Spark micro-batches —
the dashboard aggregate is ALWAYS current and nobody re-aggregates the
base, at any base size.

Ordering is the whole design (view BEFORE base):

1. read the batch's before-rows from the CURRENT base snapshot via the
   manifest target's bucket point-read (O(touched buckets), never
   O(base));
2. maintain + commit the VIEW snapshot at ``{view_path}/v={batch_id}``
   (``_COMMIT`` marker, batch-id high-water replay guard — the
   rollup_stream protocol; snapshots are O(groups), tiny);
3. merge the batch into the base via the manifest commit
   (``commit_delta`` — snapshot-isolated, torn attempts invisible).

Crash matrix (foreachBatch is at-least-once):
- crash before the view commit → replay redoes both from the unchanged
  base: same before-rows, same view, same merge;
- crash between view commit and base commit → replay skips the view
  (high-water) and merges the base from its pre-batch snapshot;
- crash after both → replay skips the view and re-merges the base,
  which converges (``apply_batch`` is latest-per-key idempotent —
  re-merging a batch the base already holds changes nothing).
Had the BASE committed first, the middle crash would strand the view: a
replay would read before-rows that already contain the batch and
retract contributions that were never added. View-first makes every
window safe.

Exactness carries over from the batch operators: feed DECIMAL sums and
the maintained view equals ``build_agg_view`` over the applied base
EXACTLY at every commit, in any batch split (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.apply import apply_batch, bucket_expr, latest_per_key
from ..operators.ivm import build_agg_view, maintain_agg_view
from .rollup import _fs

_AUDIT = ("op", "source_lsn", "ts_ms", "__deleted")


def _committed(spark, path: str) -> list[int]:
    """Batch-ids of view snapshots whose _COMMIT marker exists."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("v="):
            marker = spark._jvm.org.apache.hadoop.fs.Path(
                status.getPath(), "_COMMIT"
            )
            if fs.exists(marker):
                out.append(int(name[2:]))
    return sorted(out)


def current_view(spark, view_path: str) -> DataFrame | None:
    """Latest committed view snapshot — None before the first commit."""
    versions = _committed(spark, view_path)
    if not versions:
        return None
    return spark.read.parquet(f"{view_path}/v={versions[-1]}/view")


def agg_view_stream(
    events: DataFrame,
    target_path: str,
    view_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    group_col: str,
    sum_cols: list[str],
    n_buckets: int = 8,
    keep_versions: int = 2,
):
    """foreachBatch writer maintaining a manifest base target AND its
    aggregate view from one CDC stream — view committed first, base
    second (see module docstring for why that order closes every crash
    window). Read the view with :func:`current_view`, the base with
    ``manifest_target.read_snapshot``."""
    from ..operators.manifest_target import commit_delta, read_buckets

    spark = events.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        latest = latest_per_key(batch_df, key_cols)
        delta_buckets = [
            r[0]
            for r in latest.select(
                bucket_expr(key_cols, n_buckets).alias("_bucket")
            )
            .distinct()
            .collect()  # bounded: <= n_buckets ids
        ]
        payload_empty = batch_df.limit(0).drop(*_AUDIT)
        before = read_buckets(spark, target_path, delta_buckets)
        if before is None:  # first batch, or all touched buckets empty
            before = payload_empty
        # ---- view first (O(groups) snapshot under the commit marker) ----
        versions = _committed(spark, view_path)
        if not versions or batch_id > versions[-1]:
            view_prev = (
                spark.read.parquet(f"{view_path}/v={versions[-1]}/view")
                if versions
                else build_agg_view(payload_empty, group_col, sum_cols)
            )
            new_view = maintain_agg_view(
                view_prev,
                before,
                batch_df,
                key_cols,
                group_col,
                sum_cols,
            ).localCheckpoint(eager=True)  # bounded: O(live groups)
            new_view.write.mode("overwrite").parquet(
                f"{view_path}/v={batch_id}/view"
            )
            fs, _ = _fs(spark, view_path)
            _, marker = _fs(spark, f"{view_path}/v={batch_id}/_COMMIT")
            fs.create(marker, True).close()
            for v in _committed(spark, view_path)[:-keep_versions]:
                fs.delete(
                    spark._jvm.org.apache.hadoop.fs.Path(
                        f"{view_path}/v={v}"
                    ),
                    True,
                )
        # ---- then the base (manifest snapshot commit, idempotent) ----
        merged = apply_batch(before, batch_df, key_cols).localCheckpoint(
            eager=True
        )
        commit_delta(merged, target_path, key_cols, delta_buckets, n_buckets)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def join_view_stream(
    events: DataFrame,
    dim: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    on: str,
    how: str = "inner",
    n_buckets: int = 8,
):
    """foreachBatch writer maintaining a DENORMALIZED join view (fact x
    dim, keyed by the fact key) as a bucketed manifest target — the
    streaming twin of ``operators/ivm.py::maintain_join_view``, and the
    continuously-current wide table a dashboard reads instead of paying
    the join per query.

    Per micro-batch: latest-per-key, enrich the after-images against the
    BROADCAST dim (dims are small next to a 100 TB fact — the dimension
    contract), then merge into the view's touched buckets via the same
    ``apply_batch`` + ``commit_delta`` path the base target uses. Inner
    semantics make an upsert whose new foreign key misses the dim a
    DELETE (the row leaves the view — fk-retargeting handled); left keeps
    it with NULL dim columns. Unlike ``agg_view_stream`` there is no
    second artifact to order against: the manifest commit IS the view's
    replay guard (a re-delivered batch re-merges idempotently).

    Dim-side churn is the documented rebuild case (every fact row citing
    a changed dim key is affected — rebuild scoped to those keys); this
    maintains the FACT-side churn CDC feeds actually carry."""
    from ..operators.manifest_target import commit_delta, read_buckets

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    spark = events.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        latest = latest_per_key(batch_df, key_cols)
        audit = [c for c in _AUDIT if c in batch_df.columns]
        upserts = latest.filter(F.col("op") != "d")
        deletes = latest.filter(F.col("op") == "d").select(
            *key_cols, *audit
        )
        probe = dim.withColumn("_dim_hit", F.lit(True))
        enriched = upserts.join(F.broadcast(probe), on, "left")
        if how == "inner":
            # an upsert whose fk found no dim row LEAVES the view
            enriched = enriched.withColumn(
                "op",
                F.when(F.col("_dim_hit").isNull(), F.lit("d")).otherwise(
                    F.col("op")
                ),
            )
        enriched = enriched.drop("_dim_hit")
        merged_events = enriched.unionByName(
            deletes, allowMissingColumns=True
        )
        delta_buckets = [
            r[0]
            for r in latest.select(
                bucket_expr(key_cols, n_buckets).alias("_bucket")
            )
            .distinct()
            .collect()  # bounded: <= n_buckets ids
        ]
        before = read_buckets(spark, view_path, delta_buckets)
        if before is None:
            before = enriched.limit(0).drop(*audit)
        merged = apply_batch(
            before, merged_events, key_cols
        ).localCheckpoint(eager=True)
        commit_delta(merged, view_path, key_cols, delta_buckets, n_buckets)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
