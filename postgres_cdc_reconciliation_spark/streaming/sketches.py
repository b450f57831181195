"""[EXT] Incremental heavy hitters — a count-min sketch the stream
maintains (the frequency twin of rollup_stream's continuous aggregate).

Each micro-batch builds its CMS partial (``sketches.cms_build`` — one
partially-aggregated keyed shuffle over the batch) and MERGES it into the
persisted sketch (``cms_merge`` is cell-wise sum: associative, commutative,
and replay-safe under the batch-id high-water mark, exactly the
rollup_stream commit protocol). State is BOUNDED at any stream length:

- the sketch: depth x width cells, regardless of events seen;
- the candidate set: values whose CMS estimate reaches ``min_fraction`` of
  the running total. A candidate is (re)admitted whenever it occurs in a
  batch and its merged estimate crosses the threshold, and pruned when the
  growing threshold passes its frozen estimate. No true heavy hitter is
  ever lost: estimates only grow on occurrence, the threshold only grows
  with N, so a value pruned while below threshold that never re-occurs can
  never become a hitter — and one that re-occurs is re-evaluated that
  batch (the same one-sided guarantee as the batch operator,
  operators/sketches.py::heavy_hitters).

Query latency is O(candidates), not O(events) — the streaming answer to
"top talkers over an unbounded CDC feed" that an exact groupBy cannot give
without unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import cms_build, cms_estimate, cms_merge
from .rollup import _fs


def _committed(spark, path: str) -> list[int]:
    """Batch-ids of snapshots whose _COMMIT marker exists (both the sketch
    and hitters writes finished before the marker was created)."""
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


def current_sketch(spark, path: str) -> DataFrame | None:
    """Latest committed sketch (r, cell, cnt) — None before first commit."""
    versions = _committed(spark, path)
    if not versions:
        return None
    return spark.read.parquet(f"{path}/v={versions[-1]}/sketch")


def current_heavy_hitters(spark, path: str) -> DataFrame | None:
    """Latest committed hitters (value, est, est_fraction) — None before
    the first commit."""
    versions = _committed(spark, path)
    if not versions:
        return None
    return spark.read.parquet(f"{path}/v={versions[-1]}/hitters")


def cms_stream(
    events: DataFrame,
    path: str,
    checkpoint_dir: str,
    value_col: str,
    min_fraction: float = 0.01,
    width: int = 2048,
    depth: int = 4,
    keep_versions: int = 2,
):
    """foreachBatch writer maintaining the sketch + hitters incrementally.

    Replay safety (foreachBatch is at-least-once): each micro-batch
    commits a full snapshot at ``{path}/v={batch_id}`` — sketch and
    hitters parquet dirs, then a ``_COMMIT`` marker as the commit record.
    A replayed batch (batch_id <= high-water) is skipped, so its partial
    can never double-merge; a crash mid-write leaves an unmarked v-dir the
    replay overwrites from the previous COMMITTED snapshot. Snapshots are
    sketch-sized (depth x width + candidates), so versioning cost is flat
    in stream length.
    """
    if not 0 < min_fraction <= 1:
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    spark = events.sparkSession
    # layout identity: CMS cells are addressed by (width, depth) and fed
    # from value_col — merging a restart's differently-laid-out partial
    # into persisted cells silently corrupts every frequency (r13, the
    # generic form of the r12 suite-fingerprint guard). min_fraction is
    # NOT frozen: it is an admission threshold over the (sound) merged
    # sketch, re-tunable between runs.
    from .state_guard import check_or_stamp_params

    check_or_stamp_params(
        spark,
        path,
        {"kind": "cms", "width": width, "depth": depth, "value_col": value_col},
        has_state=bool(_committed(spark, path)),
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = _committed(spark, path)
        if versions and batch_id <= versions[-1]:
            return  # at-least-once replay of an already-merged batch
        partial = cms_build(batch_df, value_col, width, depth)
        if versions:
            prev = spark.read.parquet(f"{path}/v={versions[-1]}/sketch")
            merged = cms_merge(prev, partial)
        else:
            merged = partial
        merged = merged.localCheckpoint()  # bounded: <= depth x width rows
        # exact running total from the sketch itself: every occurrence
        # increments exactly one cell of hash row 0
        n = (
            merged.where(F.col("r") == 0)
            .agg(F.sum("cnt").alias("n"))
            .collect()[0]["n"]
        ) or 0
        cand = batch_df.select(F.col(value_col)).where(
            F.col(value_col).isNotNull()
        ).distinct()
        if versions:
            prev_h = spark.read.parquet(
                f"{path}/v={versions[-1]}/hitters"
            ).select(value_col)
            cand = cand.unionByName(prev_h).distinct()
        est = cms_estimate(merged, cand, value_col, width, depth)
        hitters = est.where(
            F.col("est") >= F.lit(float(min_fraction)) * F.lit(float(n))
        ).select(
            value_col,
            "est",
            (F.col("est").cast("double") / F.lit(float(max(n, 1)))).alias(
                "est_fraction"
            ),
        )
        merged.write.mode("overwrite").parquet(f"{path}/v={batch_id}/sketch")
        hitters.write.mode("overwrite").parquet(
            f"{path}/v={batch_id}/hitters"
        )
        fs, _ = _fs(spark, path)
        _, marker = _fs(spark, f"{path}/v={batch_id}/_COMMIT")
        fs.create(marker, True).close()
        for v in _committed(spark, path)[:-keep_versions]:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}"), True
            )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def current_kmv(spark, path: str) -> DataFrame | None:
    """Latest committed KMV sketch (h) — None before the first commit."""
    versions = _committed(spark, path)
    if not versions:
        return None
    return spark.read.parquet(f"{path}/v={versions[-1]}/sketch")


def kmv_stream(
    events: DataFrame,
    path: str,
    checkpoint_dir: str,
    value_col: str,
    k: int = 256,
    salt: str = "kmv-v1",
    keep_versions: int = 2,
):
    """foreachBatch writer maintaining a KMV bottom-k distinct sketch over
    an unbounded stream — the distinct-count twin of :func:`cms_stream`,
    with one stronger property: KMV merges are EXACT and deterministic
    (bottom-k of the union), so the streamed sketch equals a whole-corpus
    batch build hash-for-hash at every commit, in any batch arrival order
    (pytest-pinned). An exact streaming distinct needs unbounded state;
    this holds <=k rows regardless of stream length and answers with
    ~1/sqrt(k-2) relative error (``operators.sketches.kmv_distinct``).

    Same replay contract as :func:`cms_stream` (at-least-once foreachBatch):
    full snapshot per micro-batch at ``{path}/v={batch_id}`` with a
    ``_COMMIT`` marker, batch-id high-water replay guard (a re-delivered
    batch merges idempotently anyway — bottom-k-of-union is idempotent —
    but skipping keeps replays IO-free), versions pruned to the last
    ``keep_versions``. Snapshots are <=k rows, so versioning cost is flat
    in stream length."""
    from ..operators.sketches import kmv_build, kmv_merge

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    spark = events.sparkSession
    # hash-space identity: a restart with a different salt unions
    # incomparable hashes (silent distinct-count corruption); a different
    # k changes which bottom-k survive. Frozen on first build (r13).
    from .state_guard import check_or_stamp_params

    check_or_stamp_params(
        spark,
        path,
        {"kind": "kmv", "k": k, "salt": salt, "value_col": value_col},
        has_state=bool(_committed(spark, path)),
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        versions = _committed(spark, path)
        if versions and batch_id <= versions[-1]:
            return  # at-least-once replay of an already-merged batch
        partial = kmv_build(batch_df, value_col, k=k, salt=salt)
        if versions:
            prev = spark.read.parquet(f"{path}/v={versions[-1]}/sketch")
            merged = kmv_merge(prev, partial, k=k)
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(f"{path}/v={batch_id}/sketch")
        fs, _ = _fs(spark, path)
        _, marker = _fs(spark, f"{path}/v={batch_id}/_COMMIT")
        fs.create(marker, True).close()
        for v in _committed(spark, path)[:-keep_versions]:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}"), True
            )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
