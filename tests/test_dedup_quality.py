"""Semantic quality of the dedup/similarity operators: plant known
near-duplicates, assert they are found (oracle parity only proves the two
engines agree — these prove the operators do their job)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.dedup import (
    lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash16,
)
from postgres_cdc_reconciliation_spark.operators.similarity import cosine_topk


BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and the optimizer prunes columns"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE.replace("lazy", "sleepy")),  # near-dup of 1
        (3, "completely different text about database replication slots and wal"),
        (4, BASE),  # exact dup of 1
        (5, "another unrelated document mentioning kafka topics and offsets only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_pairs(spark):
    sh = shingles(_docs(spark), k=3)
    cand = lsh_candidates(minhash_signatures(sh)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in cand}
    assert (1, 4) in pairs  # exact dup always collides on every band
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup collides on ≥1 band
    assert (3, 5) not in pairs


def test_ngram_jaccard_scores(spark):
    sh = shingles(_docs(spark), k=3)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(sh, threshold=0.3).collect()}
    assert pairs[(1, 4)] == 1.0  # identical shingle sets
    assert 0.3 <= pairs[(1, 2)] < 1.0
    assert (3, 5) not in pairs


def test_simhash_near_dups_have_close_signatures(spark):
    sig = {r["doc_id"]: r["simhash"] for r in simhash16(_docs(spark)).collect()}
    assert sig[1] == sig[4]  # identical text → identical signature
    ham_12 = bin(sig[1] ^ sig[2]).count("1")
    ham_13 = bin(sig[1] ^ sig[3]).count("1")
    assert ham_12 < ham_13  # near-dup closer than unrelated


def test_cosine_topk_finds_perturbed_vector(spark):
    import math

    base = [math.sin(i * 0.7) for i in range(16)]
    pert = [x + (0.01 if i == 0 else 0.0) for i, x in enumerate(base)]
    orth = [math.cos(i * 1.3) for i in range(16)]
    rows = [(1, base, 0), (2, pert, 0), (3, orth, 0), (4, [x * -1 for x in base], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    top = cosine_topk(df.filter(F.col("vec_id") == 1), df, k=1)
    r = top.collect()[0]
    assert r["neighbor_id"] == 2 and r["cos"] > 0.999


def test_ngram_df_cap_bounds_hot_shingle_skew(spark):
    """A shingle present in EVERY doc (stopword shingle) must not generate
    all-pairs candidates once the document-frequency cap is on; genuinely
    similar docs still pair through their discriminative shingles."""
    hot = "the quick fox"
    rows = (
        # two near-identical docs sharing discriminative shingles
        [(1, hot + " jumped over lazy dogs daily"),
         (2, hot + " jumped over lazy dogs nightly")]
        # many unrelated docs that share ONLY the hot shingle
        + [(i, hot + f" unrelated tail number {i} content") for i in range(3, 23)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df, k=3)

    capped = ngram_jaccard_pairs(sh, threshold=0.3, max_doc_freq=5).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (1, 2) in pairs  # near-dups survive the cap
    # unrelated docs shared only capped shingles → no pair at all
    assert all(p == (1, 2) for p in pairs)

    # sanity: without the cap the hot shingle still can't push unrelated
    # docs over the threshold, but it DOES create the candidate blow-up —
    # every doc pair shares >= 1 shingle
    uncapped_candidates = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert uncapped_candidates == 22 * 21 // 2  # all-pairs without the cap


def test_minhash_post_agg_conv_is_bit_identical(spark):
    """The post-aggregation base-conversion in minhash_signatures relies on
    fixed-width lowercase hex ordering lexicographically == numerically
    (min(conv(x)) == conv(min(x))). Pin bit-identity against the per-row
    formulation it replaced."""
    sh = shingles(_docs(spark), k=3)
    hexed = sh.withColumn(
        "_hex",
        F.concat(F.md5("shingle"), F.md5(F.concat(F.col("shingle"), F.lit("x")))),
    )
    per_row = hexed.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(F.substring("_hex", 8 * s + 1, 8), 16, 10).cast("long")
            ).alias(f"h{s}")
            for s in range(8)
        ]
    )
    got = {r["doc_id"]: tuple(r[f"h{s}"] for s in range(8))
           for r in minhash_signatures(sh, n_hashes=8).collect()}
    want = {r["doc_id"]: tuple(r[f"h{s}"] for s in range(8))
            for r in per_row.collect()}
    assert got == want


def test_lsh_band_freq_cap_bounds_mega_cluster(spark):
    """The minhash twin of the shingle df-cap: a mega-cluster of identical
    docs shares every band (df² candidate pairs); max_band_freq drops its
    bands while pairs among normal docs survive."""
    mega = "boilerplate header repeated across the whole corpus " * 3
    rows = [(i, mega) for i in range(30)]  # mega-cluster: all bands df=30
    rows += [(100, BASE), (101, BASE.replace("lazy", "sleepy"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(shingles(docs), "doc_id")

    uncapped = lsh_candidates(sig, "doc_id").collect()
    # the mega-cluster alone contributes C(30,2)=435 pairs
    assert len(uncapped) >= 435

    capped = lsh_candidates(sig, "doc_id", max_band_freq=10).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (100, 101) in pairs, "normal near-dup pair lost to the cap"
    assert all(a >= 100 for a, _ in pairs), "mega-cluster pairs not dropped"


def test_embedding_matrix_scorer_agrees_with_sql(spark, sf_dir):
    """Single-table near-dup matrix scorer (per-bucket gemm) emits the same
    pair set as the oracle-checkable SQL fold, capped and uncapped."""
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for kw in ({}, {"max_bucket_size": 40, "dim": 64, "split_planes": "auto"}):
        sql_pairs = {
            (r["id_a"], r["id_b"]): r["cos"]
            for r in embedding_near_dup_pairs(v, threshold=0.35, **kw).collect()
        }
        mat_pairs = {
            (r["id_a"], r["id_b"]): r["cos"]
            for r in embedding_near_dup_pairs(
                v, threshold=0.35, scorer="matrix", **kw
            ).collect()
        }
        assert set(sql_pairs) == set(mat_pairs)
        for k in sql_pairs:
            assert abs(sql_pairs[k] - mat_pairs[k]) < 1e-9
