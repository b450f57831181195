"""[EXT] Streaming incremental SEMANTIC dedup — embedding-space near-dup
verdicts at ingest time.

The semantic sibling of streaming/dedup.py: each micro-batch of vectors
assigns to the PERSISTED k-means centroids (the index sidecar), compares
only against members of its touched cluster dirs — a directory-listing-
pruned read, never a corpus rescan — then admits its own KEPT rows as a
new ``batch=N`` partition. Per-batch cost is O(|batch| × cluster size),
constant as the corpus grows (the same measured-flat shape as the LSH
band index, SCALING.md).

Replay safety mirrors streaming/dedup.py exactly:

- both writes land in ``.../batch=<id>/`` dirs in overwrite mode, so an
  at-least-once replay rewrites the same content into the same paths —
  idempotent by construction;
- the probe EXCLUDES the index's own ``batch=<id>`` partition (at
  directory-listing time, ``semantic_dedup_incremental(exclude_batch=)``)
  so a replayed batch doesn't match its own previous admission;
- the seed corpus must live at ``batch=-1``
  (:func:`operators.similarity.semantic_index_build` writes it there) —
  micro-batch ids start at 0, and a seed at batch=0 would be invisible
  to the first micro-batch under the exclusion rule (the round-4 probe
  lesson, see streaming/dedup.py).

Snapshot-then-stream (T4): ``semantic_index_build(corpus, index_path)``
first, then attach this stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.similarity import (
    _read_semindex_doc,
    semantic_dedup_incremental,
    semantic_index_admit,
)


def semantic_dedup_stream(
    vectors: DataFrame,
    index_path: str,
    verdicts_path: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    max_cluster_members: int | None = None,
):
    """writeStream wiring: returns a DataStreamWriter; call .start().

    Requires a seeded index at ``index_path`` (semantic_index_build).
    Output: ``{verdicts_path}/batch=N`` parquet of (id, cent_id, keep,
    match_src ∈ corpus|batch|NULL) per micro-batch; the index gains a
    ``batch=N`` partition holding the kept rows."""
    spark = vectors.sparkSession
    doc = _read_semindex_doc(spark, index_path)  # fail loud before start()
    id_col = doc["id_col"]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = semantic_dedup_incremental(
            batch_df, index_path, threshold=threshold,
            exclude_batch=batch_id,
            max_cluster_members=max_cluster_members,
        ).localCheckpoint()  # one computation for verdict write + admission
        verdicts.write.mode("overwrite").parquet(
            f"{verdicts_path}/batch={batch_id}"
        )
        # admission reuses the verdict's cluster assignment (cent_id
        # carried through the join) — no re-assignment pass
        kept = batch_df.join(
            verdicts.filter("keep").select(id_col, "cent_id"), id_col
        )
        semantic_index_admit(kept, index_path, batch_id)

    return (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
