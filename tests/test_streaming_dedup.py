"""Streaming incremental dedup: per-micro-batch index probe + admission,
replay idempotence via per-batch overwrite dirs."""

import json
import os

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.streaming.dedup import (
    dedup_stream,
    read_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)


def _write_batch(src, name, rows, mtime):
    p = src / name
    with open(p, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(p, (mtime, mtime))  # pin micro-batch order (file source = mtime)


def test_stream_dedup_probe_and_admit(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(
        src,
        "b1.json",
        [(1, BASE), (2, "unrelated text about catalyst plan pruning here")],
        1_000,
    )
    _write_batch(
        src,
        "b2.json",
        [(10, BASE + " tonight"), (11, "novel content with no twin at all")],
        2_000,
    )

    index_path = str(tmp_path / "index")
    hits_path = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        dedup_stream(stream, index_path, hits_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    hits = spark.read.parquet(hits_path)
    pairs = {
        (r["new_id"], r["match_id"], r["match_src"]) for r in hits.collect()
    }
    # batch 2's doc 10 matched corpus doc 1 admitted by batch 1
    assert (10, 1, "corpus") in pairs
    # nothing matched the unrelated docs
    assert all(m != 2 for _, m, _ in pairs)

    # both batches admitted into the index
    idx = read_index(spark, index_path)
    assert set(
        r["batch"] for r in idx.select("batch").distinct().collect()
    ) == {0, 1}
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} == {
        1,
        2,
        10,
        11,
    }


def test_stream_dedup_intra_batch_pairs_after_batch0(spark, tmp_path):
    """Two near-dup docs arriving inside the SAME later micro-batch (N>0)
    must be paired with each other, not only against the committed index."""
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(
        src,
        "b1.json",
        [(1, "unrelated seed text about catalyst plan pruning here")],
        1_000,
    )
    # batch 1: twins of each other, no twin in the committed index
    _write_batch(
        src, "b2.json", [(20, BASE), (21, BASE + " tonight")], 2_000
    )

    index_path = str(tmp_path / "index")
    hits_path = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        dedup_stream(stream, index_path, hits_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    pairs = {
        (r["new_id"], r["match_id"], r["match_src"])
        for r in spark.read.parquet(hits_path).collect()
    }
    assert (20, 21, "batch") in pairs
    # and the seed doc matched nothing
    assert all(1 not in (n, m) for n, m, _ in pairs)


def test_stream_dedup_bootstrap_seed_index_visible_to_batch0(spark, tmp_path):
    """Snapshot-then-stream (T4) bootstrap: an index seeded from an existing
    corpus at batch=-1 must be probed by the stream's FIRST micro-batch.
    (A seed at batch=0 would collide with micro-batch id 0 and be silently
    excluded by the replay filter — the documented reserved-id convention.)"""
    from postgres_cdc_reconciliation_spark.streaming.dedup import (
        seed_band_index,
    )

    corpus = spark.createDataFrame(
        [(100, BASE), (101, "unrelated corpus text about shuffle planning")],
        "doc_id bigint, text string",
    )
    index_path = str(tmp_path / "index")
    # the supported seeding path: writes batch=-1 AND the parameter stamp
    seed_band_index(corpus, index_path)

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b1.json", [(1, BASE + " tonight")], 1_000)
    stream = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    q = (
        dedup_stream(
            stream, index_path, str(tmp_path / "hits"), str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    pairs = {
        (r["new_id"], r["match_id"], r["match_src"])
        for r in spark.read.parquet(str(tmp_path / "hits")).collect()
    }
    assert (1, 100, "corpus") in pairs


def test_stream_dedup_replay_idempotent(spark, tmp_path):
    """Re-running the same batch (fresh checkpoint, same input) rewrites the
    same batch dirs — no duplicate hits, no duplicate index rows."""
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b1.json", [(1, BASE), (2, BASE + " tonight")], 1_000)

    index_path = str(tmp_path / "index")
    hits_path = str(tmp_path / "hits")

    def run(ckpt):
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        q = (
            dedup_stream(stream, index_path, hits_path, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run(str(tmp_path / "ckpt1"))
    first_hits = sorted(
        (r["new_id"], r["match_id"])
        for r in spark.read.parquet(hits_path).collect()
    )
    first_idx = spark.read.parquet(index_path).count()
    # simulate at-least-once replay of batch 0: fresh checkpoint, same data
    run(str(tmp_path / "ckpt2"))
    assert (
        sorted(
            (r["new_id"], r["match_id"])
            for r in spark.read.parquet(hits_path).collect()
        )
        == first_hits
    )
    assert spark.read.parquet(index_path).count() == first_idx
    assert first_hits == [(1, 2)]


def test_banding_params_frozen_across_restarts(spark, tmp_path):
    """r13 guard: a restart presenting a different banding scheme against
    an admitted index is rejected at build time — cross-scheme band rows
    can never match, so every cross-batch near-dup would be silently
    missed (recall-zero, no error anywhere). Same scheme restarts fine."""
    import pytest

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b1.json", [(1, BASE)], 1_000)
    stream = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    index_path = str(tmp_path / "index")
    q = dedup_stream(
        stream, index_path, str(tmp_path / "hits"), str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)
    # same scheme: allowed
    dedup_stream(stream, index_path, str(tmp_path / "hits"),
                 str(tmp_path / "ckpt2"))
    # different band_size: rejected loudly
    with pytest.raises(ValueError, match="different\\s+parameters"):
        dedup_stream(stream, index_path, str(tmp_path / "hits"),
                     str(tmp_path / "ckpt3"), band_size=4)


def test_unstamped_seed_blocks_stream_until_vouched(spark, tmp_path):
    """ADVICE r13 #4: an index holding ONLY a hand-written batch=-1 seed
    (no parameter stamp) must NOT be silently stamped with a new stream's
    scheme — a seed banded under different (k, n_hashes, band_size) would
    then silently miss every seeded near-dup. The stream refuses until the
    operator vouches via stamp_params; seed_band_index is the supported
    path that stamps for you (and rejects cross-scheme re-seeding)."""
    import pytest

    from postgres_cdc_reconciliation_spark.operators.dedup import (
        lsh_band_index,
    )
    from postgres_cdc_reconciliation_spark.streaming.dedup import (
        seed_band_index,
    )
    from postgres_cdc_reconciliation_spark.streaming.state_guard import (
        stamp_params,
    )

    corpus = spark.createDataFrame(
        [(100, BASE)], "doc_id bigint, text string"
    )
    index_path = str(tmp_path / "index")
    # hand-written seed, no stamp — e.g. banded under band_size=4
    lsh_band_index(corpus, band_size=4).write.parquet(f"{index_path}/batch=-1")

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b1.json", [(1, BASE)], 1_000)
    stream = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    with pytest.raises(ValueError, match="no\\s+parameter\\s+stamp"):
        dedup_stream(
            stream, index_path, str(tmp_path / "hits"), str(tmp_path / "ckpt")
        )
    # cross-scheme re-seed over unstamped state is rejected the same way
    with pytest.raises(ValueError, match="no\\s+parameter\\s+stamp"):
        seed_band_index(corpus, index_path)
    # operator vouches for the ACTUAL seed scheme -> a matching stream runs,
    # a mismatched one still fails loudly
    stamp_params(
        spark, index_path,
        {"kind": "lsh_bands", "k": 3, "n_hashes": 8, "band_size": 4,
         "id_col": "doc_id", "text_col": "text"},
    )
    with pytest.raises(ValueError, match="different\\s+parameters"):
        dedup_stream(
            stream, index_path, str(tmp_path / "hits"), str(tmp_path / "ckpt")
        )
    q = dedup_stream(
        stream, index_path, str(tmp_path / "hits"), str(tmp_path / "ckpt"),
        band_size=4,
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)
    pairs = {
        (r["new_id"], r["match_id"])
        for r in spark.read.parquet(str(tmp_path / "hits")).collect()
    }
    assert (1, 100) in pairs
