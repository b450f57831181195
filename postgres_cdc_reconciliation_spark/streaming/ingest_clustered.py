"""[EXT] Exactly-once streamed appends into a plain clustered parquet dir,
with the skipping sidecars maintained per batch.

The growing-table ingest loop the layout tier was missing: zone/bloom/NDV
sidecars have O(new files) append modes (operators/layout.py) and the
pruned readers never skip unstamped files, but SOMETHING has to land each
micro-batch as cluster-sorted files and stamp them — otherwise a streamed
table degrades to many never-stamped files that every pruned read must
open. This writer closes the loop:

per micro-batch (at-least-once foreachBatch, single-writer dirs — the
repo-wide sidecar contract):

1. **replay guard** — a ``_pcr_appends.json`` journal records the
   committed batch-id high-water; a re-delivered batch (id <= high-water)
   is a no-op.
2. **stage + deterministic rename** — the batch is written cluster-sorted
   to a stage dir, then each part file renames to
   ``b{batch_id}-{i}.parquet``. Names are deterministic, so a crash-replay
   OVERWRITES its own partials instead of duplicating them (the same
   recomputed rows land under the same names).
3. **stamp** — every configured sidecar appends entries for exactly the
   new files (zones from footers, blooms/NDV from one column-pruned read
   of the new files only); missing sidecars are seeded with a rebuild.
4. **journal** — the high-water advances via tmp+rename last, so a torn
   run replays idempotently from step 2.

Readers stay correct at every instant: between rename and stamp the new
files are unstamped, and the pruned readers read unstamped files
unconditionally (the missing-evidence rule); after the stamp they prune.
Compaction (``operators.layout.compact_clustered``) periodically restores
range-disjointness — the stream appends cluster-SORTED files, but each
batch spans its own value range, so file ranges overlap across batches
and zone prunes degrade gradually until compaction.

Reference analog: none — the reference applies CDC into Postgres tables
and lets the database maintain its own storage; this is the [EXT]
lakehouse surface (SURVEY §2 D3/T13 neighborhood).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from .rollup import _fs

#: journal sidecar: {"high_water": <last committed batch id>}
_APPENDS_JOURNAL = "_pcr_appends.json"


def _read_journal(spark, path: str) -> int:
    fs, jpath = _fs(spark, f"{path}/{_APPENDS_JOURNAL}")
    if not fs.exists(jpath):
        return -1
    stream = fs.open(jpath)
    try:
        return json.loads(bytes(stream.readAllBytes()).decode("utf-8"))[
            "high_water"
        ]
    finally:
        stream.close()


def _write_journal(spark, path: str, batch_id: int) -> None:
    fs, tmp = _fs(spark, f"{path}/.{_APPENDS_JOURNAL}.tmp")
    _, final = _fs(spark, f"{path}/{_APPENDS_JOURNAL}")
    out = fs.create(tmp, True)
    try:
        out.write(
            bytearray(json.dumps({"high_water": batch_id}).encode("utf-8"))
        )
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)


def clustered_append_stream(
    events: DataFrame,
    path: str,
    checkpoint_dir: str,
    cluster_col: str,
    zone_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    ndv_cols: list[str] | None = None,
    files_per_batch: int = 1,
    bloom_fpp: float = 0.01,
    ndv_k: int = 64,
):
    """foreachBatch writer appending each micro-batch as cluster-sorted,
    deterministically-named parquet files and stamping the configured
    sidecars in O(new files) — see the module docstring for the
    exactly-once protocol. Returns the writeStream builder (caller picks
    trigger/start), matching the other streaming maintainers here."""
    if files_per_batch < 1:
        raise ValueError(
            f"files_per_batch must be >= 1, got {files_per_batch}"
        )
    spark = events.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= _read_journal(spark, path):
            return  # at-least-once replay of a committed batch
        from ..operators.layout import stamp_bloom, stamp_ndv, stamp_zonemap

        stage = f"{path}/.stage-b{batch_id}"
        (
            batch_df.coalesce(files_per_batch)
            .sortWithinPartitions(cluster_col)
            .write.mode("overwrite")
            .parquet(stage)
        )
        fs, sdir = _fs(spark, stage)
        parts = sorted(
            str(st.getPath())
            for st in fs.listStatus(sdir)
            if st.getPath().getName().endswith(".parquet")
        )
        for i, src in enumerate(parts):
            _, s = _fs(spark, src)
            _, d = _fs(spark, f"{path}/b{batch_id}-{i:05d}.parquet")
            fs.delete(d, False)  # crash-replay overwrites its own partial
            fs.rename(s, d)
        fs.delete(sdir, True)

        def _stamp(fn, cols, **kw):
            if not cols:
                return
            try:
                fn(spark, path, list(cols), mode="append", **kw)
            except FileNotFoundError:  # first batch seeds the sidecar
                fn(spark, path, list(cols), **kw)

        if zone_cols:
            try:
                stamp_zonemap(spark, path, list(zone_cols), mode="append")
            except FileNotFoundError:  # seed records the cluster column
                stamp_zonemap(
                    spark, path, list(zone_cols), cluster_col=cluster_col
                )
        _stamp(stamp_bloom, bloom_cols, fpp=bloom_fpp)
        _stamp(stamp_ndv, ndv_cols, k=ndv_k)
        _write_journal(spark, path, batch_id)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
