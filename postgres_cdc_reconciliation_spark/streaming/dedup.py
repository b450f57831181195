"""[EXT] Streaming incremental dedup — near-dup detection at ingest time.

Each micro-batch of documents probes the persisted LSH band index (built
by all previous batches), emits its near-dup hits, and admits its own
band rows into the index. Per-batch cost is O(|batch| + matched buckets)
— the corpus is never rescanned, so the stream's cost per document is
constant as the corpus grows (measured flat under a 10× corpus,
SCALING.md).

Replay safety without a high-water mark: both writes land in
``.../batch=<id>/`` subdirectories in overwrite mode, so an at-least-once
replay of a micro-batch rewrites the exact same content into the exact
same paths — idempotent by construction (same reasoning as the ingest
bracketing retry, ingest.py). A crash mid-write leaves a partial
batch dir that the replay overwrites. The index reader discovers
``batch=*`` partitions; admitted bands are append-only across batches.

The probe reads the index as committed *before* this batch (its own
batch= dir is excluded), so hit sets are stable under replay too.

Bootstrapping (snapshot-then-stream, T4): an index seeded from an existing
corpus BEFORE attaching the stream must live in a ``batch=<negative>``
partition (e.g. ``batch=-1``). Stream micro-batch ids start at 0, and the
replay-exclusion filter drops the partition matching the CURRENT batch id —
a seed written at ``batch=0`` would be silently invisible to the stream's
first micro-batch (found by the round-4 scaling probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.apply import _path_exists
from ..operators.dedup import lsh_band_index, near_dups_from_bands


def read_index(spark, index_path: str) -> DataFrame | None:
    """The committed band index (all batch= partitions), or None if no
    batch has been admitted yet. Presence is decided by batch= partition
    dirs, not the root dir: the parameter stamp (_params.json, r13)
    creates the root before the first admission, and a parquet read of a
    stamp-only dir would fail schema inference."""
    if not _path_exists(spark, index_path):
        return None
    jpath = spark._jvm.org.apache.hadoop.fs.Path(index_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not any(
        st.getPath().getName().startswith("batch=")
        for st in fs.listStatus(jpath)
    ):
        return None
    return spark.read.parquet(index_path)


def _band_params(
    id_col: str, text_col: str, k: int, n_hashes: int, band_size: int
) -> dict:
    return {
        "kind": "lsh_bands",
        "k": k,
        "n_hashes": n_hashes,
        "band_size": band_size,
        "id_col": id_col,
        "text_col": text_col,
    }


def _has_band_state(spark, index_path: str) -> bool:
    """ANY ``batch=`` partition — including a ``batch=-1`` bootstrap seed —
    is parameter-addressed state (ADVICE r13 #4: a seed banded under a
    different scheme is exactly the cross-scheme recall-zero failure the
    stamp guard exists for, so a seed must never be exempt)."""
    if not _path_exists(spark, index_path):
        return False
    jp = spark._jvm.org.apache.hadoop.fs.Path(index_path)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    return any(
        st.getPath().getName().startswith("batch=")
        for st in fs.listStatus(jp)
    )


def seed_band_index(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
) -> None:
    """Snapshot-then-stream bootstrap (T4): band an existing corpus into
    the reserved ``batch=-1`` partition AND stamp the banding parameters,
    so the seed and every stream that later attaches are verifiably under
    ONE scheme. This is the supported way to seed — a hand-written
    ``batch=-1`` dir carries no stamp, and ``dedup_stream`` refuses
    unstamped state rather than silently adopting it (ADVICE r13 #4).

    Re-seeding an already-stamped index verifies the parameters first
    (mismatch fails loudly before any write). Only ``batch=-1`` is
    overwritten; stream-admitted partitions are untouched."""
    from ..operators.dedup import lsh_band_index
    from .state_guard import check_or_stamp_params

    spark = corpus.sparkSession
    check_or_stamp_params(
        spark,
        index_path,
        _band_params(id_col, text_col, k, n_hashes, band_size),
        # state without a stamp is exactly what seeding must not paper
        # over: fail loudly, pointing at stamp_params for pre-guard dirs
        has_state=_has_band_state(spark, index_path),
    )
    lsh_band_index(corpus, id_col, text_col, k, n_hashes, band_size).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/batch=-1")


def dedup_stream(
    docs: DataFrame,
    index_path: str,
    hits_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
):
    """writeStream wiring: returns a DataStreamWriter; call .start().

    Output: ``{hits_path}/batch=N`` parquet of (new_id, match_id,
    match_src, n_shared_bands) per micro-batch; ``{index_path}/batch=N``
    the admitted band rows."""
    spark = docs.sparkSession
    # banding identity: band strings are a function of (k, n_hashes,
    # band_size) over text_col — a restart with a different scheme probes
    # old band rows that can never match (every cross-scheme near-dup
    # silently missed, a recall-zero failure with no error anywhere).
    # Frozen on first build (r13 guard; see streaming/state_guard.py).
    # ANY batch= partition counts as state requiring a stamp — including
    # a batch=-1 bootstrap seed (ADVICE r13 #4: a seed banded under a
    # different scheme is exactly the cross-scheme recall-zero failure
    # this guard exists for). seed_band_index writes the stamp with the
    # seed; a hand-written unstamped seed dir needs explicit
    # stamp_params() vouching.
    from .state_guard import check_or_stamp_params

    check_or_stamp_params(
        spark,
        index_path,
        _band_params(id_col, text_col, k, n_hashes, band_size),
        has_state=_has_band_state(spark, index_path),
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bands = lsh_band_index(
            batch_df, id_col, text_col, k, n_hashes, band_size
        ).localCheckpoint()  # one computation for probe + admission
        index = read_index(spark, index_path)
        if index is not None:
            # exclude this batch's own partition: under replay the index
            # already contains batch=N, and probing against it would turn
            # every doc into a self-neighborhood duplicate of itself
            index = index.filter(F.col("batch") != batch_id).select(
                id_col, "band"
            )
            if index.isEmpty():
                index = None
        probe = bands
        if index is not None:
            hits = near_dups_from_bands(probe, index, id_col)
        else:
            # first batch: intra-batch pairs only
            a, b = probe.alias("a"), probe.alias("b")
            hits = (
                a.join(b, "band")
                .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                .select(
                    F.col(f"a.{id_col}").alias("new_id"),
                    F.col(f"b.{id_col}").alias("match_id"),
                    F.lit("batch").alias("match_src"),
                )
                .groupBy("new_id", "match_id", "match_src")
                .agg(F.count("*").alias("n_shared_bands"))
            )
        hits.write.mode("overwrite").parquet(f"{hits_path}/batch={batch_id}")
        bands.write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")

    return (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
