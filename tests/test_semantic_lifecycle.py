"""End-to-end persisted-vector-index lifecycle through the Engine facade:
seed (fit+persist) → streamed probe+admit micro-batches → footer stats →
compact → identical probes and ANN search on the compacted index. Each
piece is unit-tested elsewhere; this pins that they COMPOSE on one index."""

import json
import os

from postgres_cdc_reconciliation_spark.engine import Engine
from postgres_cdc_reconciliation_spark.streaming.semantic import (
    semantic_dedup_stream,
)

E = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]


def _write_batch(src, name, rows, mtime):
    p = src / name
    with open(p, "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")
    os.utime(p, (mtime, mtime))


def test_full_index_lifecycle(spark, tmp_path):
    eng = Engine(spark)
    seed = spark.createDataFrame(
        [(i, E[i % 4]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "idx")
    k = eng.semantic_index(seed, idx, target_cluster_size=4)
    assert k == 4

    # two streamed micro-batches: one corpus dup (pruned), one novel kept
    # + its own later dup (pruned as corpus once admitted)
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b0.json",
                 [(100, [0.999, 0.001, 0.0, 0.0]),
                  (101, [0.5, 0.5, 0.5, 0.5])], 1_000)
    _write_batch(src, "b1.json",
                 [(200, [0.5, 0.5, 0.499, 0.501])], 2_000)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = str(tmp_path / "verdicts")
    q = (semantic_dedup_stream(stream, idx, out, str(tmp_path / "ckpt"),
                               threshold=0.95)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    v = {r["vec_id"]: (r["keep"], r["match_src"])
         for r in spark.read.parquet(out).collect()}
    assert v[100] == (False, "corpus")
    assert v[101] == (True, None)
    assert v[200] == (False, "corpus")  # dup of 101's admission

    # footer stats see the seed + the admitted batch, zero data IO
    stats = {r["cent_id"]: r for r in eng.index_stats(idx).collect()}
    assert sum(r["n_rows"] for r in stats.values()) == 17  # 16 seed + 101
    assert max(r["n_batches"] for r in stats.values()) == 2

    # compact → one batch partition, probes identical
    idx2 = str(tmp_path / "idx2")
    assert eng.compact_index(idx, idx2) == 17
    probe = spark.createDataFrame(
        [(300, [0.999, 0.001, 0.0, 0.0]), (301, [0.5, 0.5, 0.5, 0.5]),
         (302, [-1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    before = sorted(map(tuple, eng.semantic_dedup_incremental(
        probe, idx, threshold=0.95).collect()))
    after = sorted(map(tuple, eng.semantic_dedup_incremental(
        probe, idx2, threshold=0.95).collect()))
    assert after == before
    stats2 = eng.index_stats(idx2).collect()
    assert all(r["n_batches"] == 1 and r["n_files"] == 1 for r in stats2)

    # the SAME compacted index serves ANN search (sidecar centroids)
    top = eng.ann_search(probe, idx2, k=2, nprobe=2).collect()
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in top}
    assert got[(300, 1)] in (0, 4, 8, 12, 100)  # an e1-direction member
