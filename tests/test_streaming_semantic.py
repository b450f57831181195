"""Streaming incremental SEMANTIC dedup: per-micro-batch centroid-routed
probe + kept-row admission, replay idempotence via per-batch overwrite
dirs (the streaming/dedup.py contract, embedding-space edition)."""

import json
import os

from postgres_cdc_reconciliation_spark.streaming.semantic import (
    semantic_dedup_stream,
)

E1 = [1.0, 0.0, 0.0, 0.0]
E2 = [0.0, 1.0, 0.0, 0.0]
E3 = [0.0, 0.0, 1.0, 0.0]
E4 = [0.0, 0.0, 0.0, 1.0]


def _write_batch(src, name, rows, mtime):
    p = src / name
    with open(p, "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")
    os.utime(p, (mtime, mtime))  # pin micro-batch order (file source = mtime)


def _seed_index(spark, tmp_path, rows, **kw):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_build,
    )

    idx = str(tmp_path / "semidx")
    semantic_index_build(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"),
        idx,
        **kw,
    )
    return idx


def _run(spark, src, idx, out, ckpt):
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        semantic_dedup_stream(stream, idx, out, ckpt, threshold=0.9)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_semantic_probe_and_admit(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 0: dup of seed (pruned corpus) + novel (kept, admitted)
    _write_batch(src, "b0.json",
                 [(10, [0.001, 0.999, 0.0, 0.0]), (11, E3)], 1_000)
    # batch 1: dup of batch 0's ADMITTED novel → corpus; fresh novel kept;
    # plus an intra-batch pair (21 dups 20 within the same micro-batch)
    _write_batch(src, "b1.json",
                 [(20, E4), (21, [0.0, 0.0, 0.001, 0.999]),
                  (22, [0.0, 0.0, 0.999, 0.001])], 2_000)

    idx = _seed_index(spark, tmp_path, [(0, E1), (1, E2)], k=2, max_iter=2)
    out = str(tmp_path / "verdicts")
    _run(spark, src, idx, out, str(tmp_path / "ckpt"))

    v = {r["vec_id"]: (r["keep"], r["match_src"])
         for r in spark.read.parquet(out).collect()}
    assert v[10] == (False, "corpus")   # seed dup
    assert v[11] == (True, None)        # novel, admitted
    assert v[22] == (False, "corpus")   # dup of 11's admission
    assert v[20] == (True, None)        # novel
    # 21 dups BOTH batch-sibling 20 and... only 20 — batch evidence
    assert v[21] == (False, "batch")

    # admissions: kept rows only, under their batch partitions
    idx_df = spark.read.parquet(idx)
    admitted = {(r["vec_id"], r["batch"])
                for r in idx_df.filter("batch >= 0").collect()}
    assert admitted == {(11, 0), (20, 1)}


def test_stream_semantic_replay_idempotent(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b0.json",
                 [(10, E3), (11, [0.0, 0.0, 0.999, 0.001])], 1_000)

    idx = _seed_index(spark, tmp_path, [(0, E1)], k=1, max_iter=1)
    out = str(tmp_path / "verdicts")
    _run(spark, src, idx, out, str(tmp_path / "ckpt"))
    first = sorted((r["vec_id"], r["keep"], r["match_src"])
                   for r in spark.read.parquet(out).collect())
    first_idx_n = spark.read.parquet(idx).count()

    # simulate at-least-once replay: fresh checkpoint, same data — the
    # exclusion rule must keep 10 from matching its own prior admission
    _run(spark, src, idx, out, str(tmp_path / "ckpt2"))
    assert sorted((r["vec_id"], r["keep"], r["match_src"])
                  for r in spark.read.parquet(out).collect()) == first
    assert spark.read.parquet(idx).count() == first_idx_n
    assert first == [(10, True, None), (11, False, "batch")]
