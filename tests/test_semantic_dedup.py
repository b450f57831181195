"""Semantic-dedup (SemDeDup) semantics: the oracle query proves the
invariants cross-engine; these prove the operator does its job on planted
corpora — duplicates pruned toward the smallest id, distinct content kept,
degenerate inputs survive, and the capped mode only ever degrades recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.similarity import semantic_dedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _planted(n_groups=6, dupes=4, dim=8):
    """n_groups well-separated directions, each repeated `dupes` times with
    a tiny deterministic wiggle — cosine within a group ~1.0, across ~0."""
    rows = []
    vid = 0
    for g in range(n_groups):
        base = [0.0] * dim
        base[g % dim] = 1.0
        for d in range(dupes):
            v = list(base)
            v[(g + 1) % dim] += 0.01 * d  # wiggle, cosine stays > 0.99
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_planted_groups_keep_exactly_smallest(spark):
    rows = _planted()
    out = semantic_dedup(
        _vecs(spark, rows), threshold=0.9, k=3, max_iter=4
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == len(rows)
    # group g holds ids [4g, 4g+3]; all four land in one k-means cluster
    # (cosine ~1), so exactly the smallest id of each group survives
    for g in range(6):
        ids = [4 * g + i for i in range(4)]
        kept = [i for i in ids if by_id[i]["keep"]]
        assert kept == [ids[0]], f"group {g}: kept {kept}"


def test_distinct_content_all_kept(spark):
    # orthogonal vectors: nothing reaches threshold, everything kept
    rows = [(i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(8)]
    out = semantic_dedup(_vecs(spark, rows), threshold=0.5, k=2).collect()
    assert all(r["keep"] for r in out)
    assert len(out) == 8


def test_auto_k_scales_with_corpus(spark):
    rows = _planted(n_groups=8, dupes=8)  # n=64
    out = semantic_dedup(
        _vecs(spark, rows), threshold=0.9, target_cluster_size=16
    )
    # ceil(64/16)=4 clusters requested; result covers every vector
    assert out.count() == 64
    n_cent = out.select("cent_id").distinct().count()
    assert 1 <= n_cent <= 4


def test_zero_norm_vector_never_witnesses_a_prune(spark):
    rows = [
        (0, [0.0] * 4),  # zero vector: cosine undefined against anything
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0] * 4),
    ]
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        _vecs(spark, rows), threshold=0.1, k=1
    ).collect()}
    # nothing has a valid witness: all kept (zero-norm cos is NULL/NaN)
    assert out == {0: True, 1: True, 2: True}


def test_empty_corpus(spark):
    out = semantic_dedup(_vecs(spark, []), threshold=0.5)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "cent_id", "keep"}


def test_capped_mode_only_degrades_recall(spark):
    rows = _planted(n_groups=4, dupes=10)  # one hot 40-row mass per group
    uncapped = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            _vecs(spark, rows), threshold=0.9, k=2, max_iter=2
        ).collect()
    }
    capped = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            _vecs(spark, rows), threshold=0.9, k=2, max_iter=2,
            max_cluster_size=8,
        ).collect()
    }
    assert set(capped) == set(uncapped)
    # capping can only LOSE witnesses (split separates pairs; residual drop
    # keeps rows) — so every vector kept by the uncapped run stays kept
    for vid, keep in uncapped.items():
        if keep:
            assert capped[vid], f"capped run pruned {vid} the uncapped kept"


def test_bool_threshold_rejected(spark):
    try:
        semantic_dedup(_vecs(spark, [(0, [1.0])]), threshold=True)
    except ValueError:
        return
    raise AssertionError("threshold=True must raise")


def test_keep_central_keeps_farthest_from_centroid(spark):
    # one tight family + one far outlier member: "central" must keep the
    # member farthest from the cluster centroid, "first" the smallest id
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),
        (2, [1.0, 0.002, 0.0, 0.0]),
        (3, [0.9, 0.3, 0.0, 0.0]),  # same direction-ish, farthest out
    ]
    first = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        _vecs(spark, rows), threshold=0.9, k=1, max_iter=2, keep="first"
    ).collect()}
    central = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        _vecs(spark, rows), threshold=0.9, k=1, max_iter=2, keep="central"
    ).collect()}
    assert first == {0: True, 1: False, 2: False, 3: False}
    # the outlier (3) is farthest from the 1-cluster centroid → kept
    assert central[3] and not central[0] and not central[1] and not central[2]
    # both rules keep exactly one representative of the fully-connected group
    assert sum(central.values()) == 1


def test_keep_rule_validation(spark):
    try:
        semantic_dedup(_vecs(spark, [(0, [1.0])]), keep="median")
    except ValueError:
        return
    raise AssertionError("bad keep rule must raise")


def _build_index(spark, tmp_path, rows, **kw):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_build,
    )

    path = str(tmp_path / "semindex")
    semantic_index_build(_vecs(spark, rows), path, **kw)
    return path


def test_incremental_corpus_batch_and_novel(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    corpus = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    path = _build_index(spark, tmp_path, corpus, k=2, max_iter=2)
    batch = [
        (100, [1.0, 0.001, 0.0, 0.0]),   # dup of corpus 0 → pruned (corpus)
        (101, [0.0, 0.0, 0.0, 1.0]),     # novel direction → kept
        (102, [0.0, 0.0, 0.0, 0.999]),   # dup of 101 (batch) → pruned (batch)
        (103, [0.0, 1.0, 0.001, 0.0]),   # dup of corpus 1 → pruned (corpus)
    ]
    out = {r["vec_id"]: (r["keep"], r["match_src"]) for r in
           semantic_dedup_incremental(
               _vecs(spark, batch), path, threshold=0.9
           ).collect()}
    assert out[100] == (False, "corpus")
    assert out[101] == (True, None)
    assert out[102] == (False, "batch")
    assert out[103] == (False, "corpus")


def test_incremental_reads_only_touched_clusters(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    # 4 well-separated corpus directions → force k=4 distinct clusters
    corpus = [(i, [1.0 if j == i % 8 else 0.0 for j in range(8)])
              for i in range(40)]
    path = _build_index(spark, tmp_path, corpus, k=4, max_iter=3)
    total_files = len(spark.read.parquet(path).inputFiles())
    # a one-vector batch touches ONE cluster: the pruned read must open
    # strictly fewer files than the index holds
    batch = [(500, [1.0, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])]
    out = semantic_dedup_incremental(_vecs(spark, batch), path, threshold=0.99)
    rows = out.collect()
    assert len(rows) == 1
    # directed read: only the touched cluster dir's files appear in the plan
    touched_files = out.inputFiles()
    assert 1 <= len(touched_files) < total_files
    assert len({f.rsplit("/", 2)[-2] for f in touched_files}) == 1


def test_incremental_novel_clusters_still_dedup_within_batch(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    # corpus occupies two directions; force tight centroids so a far-away
    # batch lands in a cluster whose dir may be empty of corpus rows
    corpus = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(8)]
    path = _build_index(spark, tmp_path, corpus, k=1, max_iter=2)
    batch = [
        (200, [0.0, 0.0, 1.0, 0.0]),
        (201, [0.0, 0.0, 0.999, 0.001]),  # intra-batch dup of 200
    ]
    out = {r["vec_id"]: (r["keep"], r["match_src"]) for r in
           semantic_dedup_incremental(
               _vecs(spark, batch), path, threshold=0.95
           ).collect()}
    assert out[200] == (True, None)
    assert out[201] == (False, "batch")


def test_incremental_missing_sidecar_fails_loud(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    with pytest.raises(FileNotFoundError, match="semantic-index sidecar"):
        semantic_dedup_incremental(
            _vecs(spark, [(0, [1.0])]), str(tmp_path / "nope")
        )


def test_admit_then_reprobe_prunes_as_corpus(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
        semantic_index_admit,
    )

    corpus = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    path = _build_index(spark, tmp_path, corpus, k=2, max_iter=2)
    # batch 0: a novel direction survives, then is admitted
    b0 = _vecs(spark, [(10, [0.0, 0.0, 0.0, 1.0])])
    v0 = semantic_dedup_incremental(b0, path, threshold=0.9)
    kept = b0.join(v0.filter("keep").select("vec_id", "cent_id"), "vec_id")
    assert semantic_index_admit(kept, path, 0) == 1
    # batch 1: a dup of the admitted vector must now prune as CORPUS
    v1 = {r["vec_id"]: (r["keep"], r["match_src"]) for r in
          semantic_dedup_incremental(
              _vecs(spark, [(20, [0.0, 0.0, 0.001, 0.999])]),
              path, threshold=0.9,
          ).collect()}
    assert v1[20] == (False, "corpus")


def test_admit_replay_idempotent_and_exclusion(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
        semantic_index_admit,
    )

    corpus = [(0, [1.0, 0.0, 0.0, 0.0])]
    path = _build_index(spark, tmp_path, corpus, k=1, max_iter=1)
    batch = _vecs(spark, [(10, [0.0, 1.0, 0.0, 0.0])])
    assert semantic_index_admit(batch, path, 3) == 1
    # replay of the SAME micro-batch: exclusion hides its own admission —
    # the vector must still read as kept, not as a dup of itself
    v = semantic_dedup_incremental(
        batch, path, threshold=0.9, exclude_batch=3
    ).collect()
    assert v[0]["keep"] is True
    # re-admission overwrites the same partition: index row count stable
    assert semantic_index_admit(batch, path, 3) == 1
    n = spark.read.parquet(path).filter("vec_id = 10").count()
    assert n == 1
    # without exclusion the admitted copy IS corpus evidence
    v2 = semantic_dedup_incremental(batch, path, threshold=0.9).collect()
    assert (v2[0]["keep"], v2[0]["match_src"]) == (False, "corpus")


def test_admit_rejects_bad_batch_id(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_admit,
    )

    path = _build_index(spark, tmp_path, [(0, [1.0, 0.0])], k=1, max_iter=1)
    for bad in (-1, True, "0"):
        with pytest.raises(ValueError, match="non-negative int"):
            semantic_index_admit(_vecs(spark, [(1, [0.0, 1.0])]), path, bad)


def test_index_build_rejects_empty(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_build,
    )

    with pytest.raises(ValueError, match="empty corpus"):
        semantic_index_build(_vecs(spark, []), str(tmp_path / "x"))


def test_compact_preserves_probe_results_and_shrinks_files(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
        semantic_index_admit,
        semantic_index_compact,
    )

    corpus = [(i, [1.0 if j == i % 4 else 0.0 for j in range(4)])
              for i in range(20)]
    src = _build_index(spark, tmp_path, corpus, k=4, max_iter=3)
    # three admitted micro-batches → extra files per touched cluster
    for b in range(3):
        semantic_index_admit(
            _vecs(spark, [(100 + b, [0.5, 0.5, 0.1 * b, 0.0])]), src, b
        )
    probe = _vecs(spark, [(500, [1.0, 0.001, 0.0, 0.0]),
                          (501, [0.45, 0.55, 0.0, 0.0])])
    before = sorted((r["vec_id"], r["keep"], r["match_src"]) for r in
                    semantic_dedup_incremental(probe, src, 0.9).collect())

    dst = str(tmp_path / "compacted")
    n = semantic_index_compact(spark, src, dst)
    assert n == spark.read.parquet(src).count() == 23
    after = sorted((r["vec_id"], r["keep"], r["match_src"]) for r in
                   semantic_dedup_incremental(probe, dst, 0.9).collect())
    assert after == before
    # single batch=-1 partition, at most one file per cluster dir
    files = spark.read.parquet(dst).inputFiles()
    assert all("/batch=-1/" in f for f in files)
    dirs = [f.rsplit("/", 2)[-2] for f in files]
    assert len(dirs) == len(set(dirs))
    assert len(files) < len(spark.read.parquet(src).inputFiles())


def test_compact_rejects_in_place_and_bad_fanout(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_compact,
    )

    src = _build_index(spark, tmp_path, [(0, [1.0, 0.0])], k=1, max_iter=1)
    with pytest.raises(ValueError, match="dst must differ"):
        semantic_index_compact(spark, src, src + "/")
    with pytest.raises(ValueError, match="positive int"):
        semantic_index_compact(spark, src, str(tmp_path / "d"),
                               files_per_cluster=0)


def test_index_stats_footer_only(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_admit,
        semantic_index_stats,
    )

    corpus = [(i, [1.0 if j == i % 2 else 0.0 for j in range(4)])
              for i in range(10)]
    path = _build_index(spark, tmp_path, corpus, k=2, max_iter=3)
    semantic_index_admit(_vecs(spark, [(100, [1.0, 0.001, 0.0, 0.0])]),
                         path, 0)
    stats = semantic_index_stats(spark, path)
    rows = {r["cent_id"]: r for r in stats.collect()}
    # footer totals must reconcile exactly with the data
    assert sum(r["n_rows"] for r in rows.values()) == 11
    assert all(r["n_bytes"] > 0 and r["n_files"] >= 1 for r in rows.values())
    # the admitted cluster saw two batches (seed + batch 0)
    assert max(r["n_batches"] for r in rows.values()) == 2
    # per-cluster rows reconcile against a real groupBy
    real = {r["cent_id"]: r["n"] for r in
            spark.read.parquet(path).groupBy("cent_id").count()
            .withColumnRenamed("count", "n").collect()}
    assert {c: r["n_rows"] for c, r in rows.items()} == real
    # metadata only: the stats plan has no parquet scan node
    assert "Scan parquet" not in stats._jdf.queryExecution().executedPlan().toString()


def test_index_stats_requires_an_index(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_stats,
    )

    with pytest.raises(FileNotFoundError, match="sidecar"):
        semantic_index_stats(spark, str(tmp_path / "not_an_index"))


def test_incremental_hot_cluster_cap_degrades_recall_only(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    # one hot cluster: ids 0..19 share a direction; id 19 carries a twist
    # component only the probe's second vector matches
    corpus = [(i, [1.0, 0.0005 * i, 0.0, 0.0]) for i in range(19)]
    corpus.append((19, [0.6, 0.0, 0.8, 0.0]))  # high-id outlier member
    path = _build_index(spark, tmp_path, corpus, k=1, max_iter=2)
    probe = _vecs(spark, [
        (500, [1.0, 0.001, 0.0, 0.0]),   # witnessed by LOW-id members
        (501, [0.6, 0.001, 0.8, 0.0]),   # witnessed ONLY by id 19
    ])

    def verdicts(**kw):
        return {r["vec_id"]: r["keep"] for r in semantic_dedup_incremental(
            probe, path, threshold=0.95, **kw
        ).collect()}

    full = verdicts()
    capped = verdicts(max_cluster_members=5)  # keeps ids 0..4 only
    assert full == {500: False, 501: False}
    # 500's witness survives the cap; 501's (id 19) is capped away —
    # recall-only: capped keep set is a superset of the uncapped one
    assert capped == {500: False, 501: True}
    for vid, keep in full.items():
        if keep:
            assert capped[vid]


def test_incremental_cap_validation(spark, tmp_path):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
    )

    path = _build_index(spark, tmp_path, [(0, [1.0, 0.0])], k=1, max_iter=1)
    batch = _vecs(spark, [(1, [0.0, 1.0])])
    for bad in (0, -3, True, 2.5):
        with pytest.raises(ValueError, match="max_cluster_members"):
            semantic_dedup_incremental(batch, path,
                                       max_cluster_members=bad).collect()


def test_admit_casts_to_index_vector_type(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_dedup_incremental,
        semantic_index_admit,
        semantic_index_build,
    )

    # float-typed seed index + DOUBLE-typed batch: admission must cast,
    # or the mixed parquet physical types crash every later read
    seed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "fidx")
    semantic_index_build(seed, path, k=1, max_iter=1)
    dbl = spark.createDataFrame(
        [(10, [0.6, 0.8])], "vec_id long, embedding array<double>"
    )
    semantic_index_admit(dbl, path, 0)
    full = spark.read.parquet(path)
    assert full.count() == 3
    assert full.schema["embedding"].dataType.simpleString() == "array<float>"
    v = semantic_dedup_incremental(dbl, path, threshold=0.99).collect()
    assert len(v) == 1 and v[0]["keep"] is False  # its own admitted copy


def test_compact_preserves_vec_type_contract(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_admit,
        semantic_index_build,
        semantic_index_compact,
    )

    seed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    src = str(tmp_path / "f1")
    semantic_index_build(seed, src, k=1, max_iter=1)
    dst = str(tmp_path / "f2")
    semantic_index_compact(spark, src, dst)
    # the compacted sidecar still carries the float contract: a DOUBLE
    # batch admitted into the NEW index must cast, keeping reads uniform
    dbl = spark.createDataFrame(
        [(10, [0.6, 0.8])], "vec_id long, embedding array<double>"
    )
    semantic_index_admit(dbl, dst, 0)
    full = spark.read.parquet(dst)
    assert full.count() == 3
    assert full.schema["embedding"].dataType.simpleString() == "array<float>"


def test_string_ids_both_keep_rules(spark):
    # ADVICE r10: the old tie-break negated the id arithmetically, so any
    # non-numeric id crashed under ANSI mode — string ids must work, with
    # the same smallest-id ("first") / farthest-then-smallest ("central")
    # total orders the numeric path uses
    rows = [
        ("doc-a", [1.0, 0.0, 0.0, 0.0]),
        ("doc-b", [1.0, 0.001, 0.0, 0.0]),
        ("doc-c", [1.0, 0.002, 0.0, 0.0]),
        ("doc-d", [0.9, 0.3, 0.0, 0.0]),  # farthest from the centroid
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    first = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        df, threshold=0.9, k=1, max_iter=2, keep="first"
    ).collect()}
    assert first == {
        "doc-a": True, "doc-b": False, "doc-c": False, "doc-d": False,
    }
    central = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        df, threshold=0.9, k=1, max_iter=2, keep="central"
    ).collect()}
    # same geometry as the numeric central test: the outlier survives
    assert central == {
        "doc-a": False, "doc-b": False, "doc-c": False, "doc-d": True,
    }


def test_rebuild_over_admitted_batches_refuses_then_overwrites(spark, tmp_path):
    # ADVICE r10: an in-place refit over admitted batch=N partitions would
    # strand them under the OLD centroids (duplicate/mis-routed members) —
    # the build must refuse, and overwrite_batches=True must discard them
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        semantic_index_admit,
        semantic_index_build,
    )

    rows = [(i, [1.0 if j == i % 4 else 0.0 for j in range(4)])
            for i in range(8)]
    path = _build_index(spark, tmp_path, rows, k=2, max_iter=2)
    assert semantic_index_admit(
        _vecs(spark, [(100, [0.0, 0.0, 0.0, 1.0])]), path, 0
    ) == 1
    with pytest.raises(ValueError, match="admitted batch"):
        semantic_index_build(_vecs(spark, rows), path, k=2, max_iter=2)
    # rebuild into a FRESH seed discards the stale batch partitions
    semantic_index_build(
        _vecs(spark, rows), path, k=2, max_iter=2, overwrite_batches=True
    )
    full = spark.read.parquet(path)
    assert full.count() == len(rows)
    assert [r["batch"] for r in full.select("batch").distinct().collect()] \
        == [-1]
