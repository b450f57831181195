"""Semantic tests for the curation operators (hash split, decontamination,
sequence packing) — oracle parity proves engine agreement; these prove the
operators do their job."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.curation import (
    contamination_report,
    hash_split,
    pack_chunks,
)


def _docs(spark, n=400):
    rows = [(i, f"doc number {i} body word{i % 7} tail", "src%d" % (i % 4)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hash_split_fractions_and_labels(spark):
    out = hash_split(_docs(spark)).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    # md5 is uniform; with n=400 the 80/10/10 split stays within wide bounds
    assert counts["train"] > 250
    assert counts["val"] + counts["test"] < 150


def test_hash_split_stable_under_corpus_growth(spark):
    small = hash_split(_docs(spark, n=100)).select("doc_id", "split")
    big = hash_split(_docs(spark, n=400)).select(
        "doc_id", F.col("split").alias("split_big")
    )
    joined = small.join(big, "doc_id")
    assert joined.filter(F.col("split") != F.col("split_big")).count() == 0
    assert joined.count() == 100


def test_hash_split_salt_reshuffles(spark):
    a = hash_split(_docs(spark), salt="v1").select("doc_id", "split")
    b = hash_split(_docs(spark), salt="v2").select(
        "doc_id", F.col("split").alias("split_b")
    )
    moved = a.join(b, "doc_id").filter(F.col("split") != F.col("split_b")).count()
    assert moved > 0


def test_contamination_flags_planted_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [(1, base), (2, "totally disjoint words here nothing shared at all")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    rep = {r["doc_id"]: r.asDict() for r in contamination_report(train, ev).collect()}
    assert rep[1]["contaminated"] and rep[1]["overlap_share"] == 1.0
    assert not rep[2]["contaminated"] and rep[2]["n_shared_shingles"] == 0


def test_pack_chunks_invariants(spark):
    out = pack_chunks(_docs(spark), budget=16, group_col="source").collect()
    by_group = {}
    for r in out:
        assert 0 <= r["chunk_offset"] < 16
        assert r["chunk_id"] >= 0
        by_group.setdefault(r["source"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: r["doc_id"])
        # first doc in each group starts at chunk 0, offset 0
        assert rows[0]["chunk_id"] == 0 and rows[0]["chunk_offset"] == 0
        # chunk layout is exactly the running token sum
        running = 0
        for r in rows:
            assert r["chunk_id"] == running // 16
            assert r["chunk_offset"] == running % 16
            running += r["n_tokens"]
        # chunk ids never decrease in doc order
        ids = [r["chunk_id"] for r in rows]
        assert ids == sorted(ids)


def test_hot_ngrams_counts_docs_not_occurrences(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import hot_ngrams

    rows = [
        (1, "a b c d e a b c d e"),   # internal repeat: counts ONCE
        (2, "a b c d e x y z w v"),
        (3, "a b c d e q r s t u"),
        (4, "p q r s t u v w x y"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["ngram"]: r["doc_freq"] for r in hot_ngrams(d, n=5, min_df=3).collect()}
    assert out == {"a b c d e": 3}  # doc 1's repetition doesn't inflate df
    # min_df=2 admits the 2-doc n-grams too
    out2 = {r["ngram"]: r["doc_freq"] for r in hot_ngrams(d, n=5, min_df=2).collect()}
    assert out2["a b c d e"] == 3
    assert all(v >= 2 for v in out2.values())


def test_quality_budget_respects_quota_and_ranking(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        quality_budget_select,
    )

    rows = [
        # lang g1: doc 1 is high quality (all stopwords), doc 2 junk
        (1, "the a of to and the a of to and", "g1"),
        (2, "xx yy zz ww vv uu tt ss rr qq", "g1"),
        (3, "the a of mid tail pad pad pad pad pad", "g1"),
        (4, "the the the the the", "g2"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_budget_select(d, budget=20).collect()
    kept = {r["doc_id"]: r for r in out}
    # g1 quota 20: doc1 (ratio 1.0, 10 toks) then doc3 (0.3, 10) fill it;
    # doc2 (0.0) is over budget and dropped
    assert set(kept) == {1, 3, 4}
    assert kept[1]["cum_tokens"] == 10 and kept[3]["cum_tokens"] == 20
    # per-group accounting: g2 starts its own budget
    assert kept[4]["cum_tokens"] == 5


def test_chunk_overlap_layout(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        chunk_with_overlap,
    )

    # 10 tokens, chunks of 4, stride 3 -> starts 0,3,6,9
    d = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    out = {r["chunk_id"]: r for r in chunk_with_overlap(d, 4, 3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert out[3]["chunk_text"] == "t9" and out[3]["chunk_len"] == 1  # tail kept
    assert all(r["n_tokens"] == 10 for r in out.values())


def test_chunk_overlap_short_doc_single_chunk(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        chunk_with_overlap,
    )

    d = spark.createDataFrame([(7, "only three tokens")], "doc_id long, text string")
    out = chunk_with_overlap(d, 32, 24).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "only three tokens"
    assert out[0]["chunk_len"] == 3 and out[0]["chunk_start"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_with_overlap(d, 8, 9)  # stride > chunk would skip tokens


def test_redact_pii_masks_and_counts(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import redact_pii

    rows = [
        (1, "mail alice.smith+x@corp.example.org now"),
        (2, "call +1 555-0199 or 555-1234 today"),
        (3, "host 192.168.0.1 clean 1.2.3.4"),
        (4, "no pii here at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(d).collect()}
    assert out[1]["redacted"] == "mail <EMAIL> now" and out[1]["n_emails"] == 1
    assert out[2]["redacted"] == "call <PHONE> or <PHONE> today"
    assert out[2]["n_phones"] == 2
    assert out[3]["redacted"] == "host <IP> clean <IP>" and out[3]["n_ips"] == 2
    assert out[4]["redacted"] == "no pii here at all"
    assert out[4]["n_emails"] == out[4]["n_phones"] == out[4]["n_ips"] == 0


def test_shard_stats_partition_and_share(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import shard_stats

    stats = shard_stats(_docs(spark, n=400), n_shards=8).collect()
    assert {r["shard_id"] for r in stats} <= set(range(8))
    assert sum(r["n_docs"] for r in stats) == 400
    assert abs(sum(r["token_share"] for r in stats) - 1.0) < 1e-9
    # md5 routing is uniform: no shard should hold a wildly skewed share
    assert max(r["token_share"] for r in stats) < 0.35


def test_write_training_shards_one_file_per_shard(spark, tmp_path):
    import glob

    from postgres_cdc_reconciliation_spark.operators.curation import (
        shard_assign,
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    docs = _docs(spark, n=300)
    write_training_shards(docs, out, n_shards=8)
    for s in range(8):
        files = glob.glob(f"{out}/shard_id={s}/*.parquet")
        assert len(files) == 1, f"shard {s}: {len(files)} files (want exactly 1)"
    back = spark.read.parquet(out)
    assert back.count() == 300
    # routing matches shard_assign, and in-file order is ascending doc_id
    expect = {
        r["doc_id"]: r["shard_id"]
        for r in shard_assign(docs, 8).select("doc_id", "shard_id").collect()
    }
    import pandas as pd  # noqa: F401

    for s in range(8):
        pdf = spark.read.parquet(f"{out}/shard_id={s}").toPandas()
        ids = pdf["doc_id"].tolist()
        assert ids == sorted(ids)
        assert all(expect[i] == s for i in ids)


def test_write_training_shards_deterministic(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        write_training_shards,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark, n=200)
    write_training_shards(docs, a, n_shards=4)
    write_training_shards(docs, b, n_shards=4)
    for s in range(4):
        pa = spark.read.parquet(f"{a}/shard_id={s}").toPandas()
        pb = spark.read.parquet(f"{b}/shard_id={s}").toPandas()
        assert pa.equals(pb)


def test_write_training_shards_seeded_shuffle(spark, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        write_training_shards,
    )

    docs = _docs(spark, n=200)
    a, b, c = (str(tmp_path / x) for x in "abc")
    write_training_shards(docs, a, n_shards=4, shuffle_salt="epoch-0")
    write_training_shards(docs, b, n_shards=4, shuffle_salt="epoch-0")
    write_training_shards(docs, c, n_shards=4, shuffle_salt="epoch-1")
    ids = lambda p, s: spark.read.parquet(  # noqa: E731
        f"{p}/shard_id={s}"
    ).toPandas()["doc_id"].tolist()
    for s in range(4):
        assert ids(a, s) == ids(b, s)  # same salt → byte-stable order
        assert sorted(ids(a, s)) == sorted(ids(c, s))  # same membership…
    assert any(ids(a, s) != ids(c, s) for s in range(4))  # …different order
    assert any(ids(a, s) != sorted(ids(a, s)) for s in range(4))  # shuffled


def test_semantic_contamination_planted(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        semantic_contamination_report,
    )

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    ev = vecs([(1000, [1.0, 0.0, 0.0, 0.0]), (1001, [0.0, 1.0, 0.0, 0.0])])
    train = vecs([
        (0, [0.999, 0.001, 0.0, 0.0]),   # near-dup of eval 1000
        (1, [0.7, 0.7, 0.0, 0.0]),       # hits BOTH eval vectors at 0.35
        (2, [0.0, 0.0, 1.0, 0.0]),       # orthogonal to every eval → clean
        (3, [0.0, 0.0, 0.0, 0.0]),       # zero norm: cosine undefined → clean
    ])
    out = {r["vec_id"]: r for r in semantic_contamination_report(
        train, ev, threshold=0.35
    ).collect()}
    assert len(out) == 4
    assert out[0]["contaminated"] and out[0]["n_eval_hits"] == 1
    assert abs(out[0]["max_cos_r"] - 0.999) < 0.01
    assert out[1]["contaminated"] and out[1]["n_eval_hits"] == 2
    assert not out[2]["contaminated"] and out[2]["n_eval_hits"] == 0
    assert out[2]["max_cos_r"] is None
    assert not out[3]["contaminated"]


def test_semantic_contamination_empty_eval_and_bad_threshold(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.curation import (
        semantic_contamination_report,
    )

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    train = vecs([(0, [1.0, 0.0])])
    out = semantic_contamination_report(train, vecs([]), 0.5).collect()
    assert len(out) == 1 and not out[0]["contaminated"]
    with pytest.raises(ValueError, match="threshold"):
        semantic_contamination_report(train, train, threshold=True)


def test_semantic_contamination_scorers_agree_clean_and_dirty(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        semantic_contamination_report,
    )

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    ev = vecs([
        (0, [1.0, 0.0, 0.0]),
        (1, [0.5, 0.5, 0.5]),
        (2, None),                    # NULL eval vector: pairs with nothing
        (3, [1.0, 0.0]),              # short eval: pairs only with len-2
    ])
    train = vecs([
        (10, [0.99, 0.01, 0.0]),
        (11, [0.0, 0.0, 1.0]),
        (12, None),                   # NULL train vector: emitted, 0 hits
        (13, [0.0, 0.0, 0.0]),        # zero norm: cosine undefined, 0 hits
        (14, [0.9, 0.1]),             # len-2: pairs only with eval 3
    ])
    for thr in (0.3, 0.8):
        fold = sorted(map(tuple, semantic_contamination_report(
            train, ev, thr, scorer="fold").collect()))
        mat = sorted(map(tuple, semantic_contamination_report(
            train, ev, thr, scorer="matrix").collect()))
        assert len(mat) == 5
        assert fold == mat, (thr, fold, mat)
    # cross-length pair really scored: train 14 hits eval 3
    out = {r["vec_id"]: r for r in semantic_contamination_report(
        train, ev, 0.8, scorer="matrix").collect()}
    assert out[14]["contaminated"] and out[14]["n_eval_hits"] == 1
    assert not out[12]["contaminated"] and not out[13]["contaminated"]


def test_semantic_contamination_rejects_bad_scorer(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.curation import (
        semantic_contamination_report,
    )

    v = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="scorer"):
        semantic_contamination_report(v, v, scorer="blas")


# ---------------------------------------------------------------------------
# leakage_safe_split


def _dup_docs(spark):
    """Corpus with planted duplicate classes: ids 0..99 unique, each id in
    100..119 is a (differently-punctuated) copy of id i-100."""
    rows = [(i, f"doc number {i} body word{i % 7} tail") for i in range(100)]
    rows += [
        (100 + i, f"Doc   NUMBER {i} body, word{i % 7} tail!") for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_leakage_safe_split_is_group_atomic(spark):
    from postgres_cdc_reconciliation_spark.operators.curation import (
        leakage_safe_split,
    )

    out = leakage_safe_split(_dup_docs(spark)).select(
        "doc_id", "group_id", "split"
    )
    # every duplicate pair shares group_id AND split
    a = out.filter(F.col("doc_id") < 20).select(
        "doc_id", "group_id", F.col("split").alias("s_a")
    )
    b = out.filter(F.col("doc_id") >= 100).select(
        (F.col("doc_id") - 100).alias("doc_id"),
        F.col("group_id").alias("g_b"),
        F.col("split").alias("s_b"),
    )
    j = a.join(b, "doc_id")
    assert j.count() == 20
    assert j.filter(F.col("group_id") != F.col("g_b")).count() == 0
    assert j.filter(F.col("s_a") != F.col("s_b")).count() == 0
    # canonical id is the min of the class
    assert (
        out.filter(F.col("doc_id") >= 100)
        .filter(F.col("group_id") != F.col("doc_id") - 100)
        .count()
        == 0
    )


def test_leakage_safe_split_vs_hash_split_leak(spark):
    """The motivating leak: plain hash_split CAN separate a duplicate pair;
    the group-atomic split never does (checked over many planted pairs)."""
    from postgres_cdc_reconciliation_spark.operators.curation import (
        hash_split,
        leakage_safe_split,
    )

    d = _dup_docs(spark)
    plain = hash_split(d).select("doc_id", "split")
    pa = plain.filter(F.col("doc_id") < 20).select("doc_id", "split")
    pb = plain.filter(F.col("doc_id") >= 100).select(
        (F.col("doc_id") - 100).alias("doc_id"), F.col("split").alias("s_b")
    )
    leaked = pa.join(pb, "doc_id").filter(F.col("split") != F.col("s_b")).count()
    assert leaked > 0  # the leak exists on this corpus...
    safe = leakage_safe_split(d).select("doc_id", "split")
    sa = safe.filter(F.col("doc_id") < 20).select("doc_id", "split")
    sb = safe.filter(F.col("doc_id") >= 100).select(
        (F.col("doc_id") - 100).alias("doc_id"), F.col("split").alias("s_b")
    )
    assert sa.join(sb, "doc_id").filter(F.col("split") != F.col("s_b")).count() == 0


def test_leakage_safe_split_stable_under_growth(spark):
    """Adding NEW unique docs never moves an existing group's split."""
    from postgres_cdc_reconciliation_spark.operators.curation import (
        leakage_safe_split,
    )

    small_rows = [(i, f"doc number {i} body word{i % 7} tail") for i in range(50)]
    small = spark.createDataFrame(small_rows, "doc_id long, text string")
    grown_rows = small_rows + [
        (1000 + i, f"totally new doc {i} with fresh text") for i in range(50)
    ]
    grown = spark.createDataFrame(grown_rows, "doc_id long, text string")
    a = leakage_safe_split(small).select("doc_id", "split")
    b = leakage_safe_split(grown).select(
        "doc_id", F.col("split").alias("split_b")
    )
    j = a.join(b, "doc_id")
    assert j.count() == 50
    assert j.filter(F.col("split") != F.col("split_b")).count() == 0


def test_leakage_safe_split_precomputed_group_col(spark):
    """A caller-provided cluster column (e.g. near-dup cluster ids) routes
    the whole cluster to one split, text unseen."""
    from postgres_cdc_reconciliation_spark.operators.curation import (
        leakage_safe_split,
    )

    rows = [(i, "text %d" % i, i % 7) for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, text string, cluster long")
    out = leakage_safe_split(df, group_col="cluster")
    n_splits = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert n_splits == 0
