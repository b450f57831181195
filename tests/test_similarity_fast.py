"""Vectorized pandas-UDF cosine agrees with the exact SQL fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_fast,
)


def test_fast_cosine_matches_exact(spark, sf_dir):
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 16)
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in cosine_topk(q, v, k=5).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in cosine_topk_fast(q, v, k=5).collect()
    }
    assert set(exact) == set(fast)
    for key in exact:
        assert exact[key][0] == fast[key][0]  # same neighbor ranking
        assert abs(exact[key][1] - fast[key][1]) < 1e-9


def test_fast_cosine_bucketed_smoke(spark, sf_dir):
    # bucketed (IVF-style) variant through the pandas-UDF path; the relative
    # performance claim is measured in scripts/scaling_probe.py, not asserted
    # here (wall-clock assertions flake under shared load)
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = v.filter(F.col("vec_id") < 8)
    out = cosine_topk_fast(q, v, k=3, bucket_col="label").collect()
    assert len(out) > 0 and all(r["rank"] <= 3 for r in out)


def test_rp_bucket_assignment_properties(spark):
    """Identical vectors share a bucket; a vector and its negation differ in
    every plane bit (bucket XOR = all-ones)."""
    import math

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        assign_rp_buckets,
    )

    v = [math.sin(i * 0.37) + 0.1 for i in range(64)]
    rows = [(1, v), (2, list(v)), (3, [-x for x in v])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["rp_bucket"] for r in assign_rp_buckets(df, dim=64).collect()}
    assert out[1] == out[2]
    assert out[1] ^ out[3] == 0b1111  # negation flips every sign bit
    assert 0 <= out[1] < 16


def test_topk_tolerates_zero_norm_vectors(spark):
    """A zero-norm vector (cosine undefined) must drop out of every top-k
    ranking — not crash under ANSI mode, and not rank FIRST as NaN (Spark
    orders NaN above every number). Exact and fast paths agree."""
    import math

    def vec(i):
        return [math.sin(0.7 * i + 0.31 * j) + 0.05 for j in range(16)]

    rows = [(i, vec(i)) for i in range(6)] + [(99, [0.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 2")
    for fn in (cosine_topk, cosine_topk_fast):
        out = fn(q, df, k=3).collect()
        assert out, fn.__name__
        assert all(r["neighbor_id"] != 99 for r in out), fn.__name__
        assert all(r["cos"] == r["cos"] for r in out)  # no NaN survives
    # zero-norm QUERY: contributes no rows instead of crashing/ranking NaN
    zq = df.filter("vec_id = 99")
    assert cosine_topk(zq, df, k=3).count() == 0


def test_auto_n_planes_arithmetic():
    """Sizing rule: ceil(log2(n/target)) clamped to [1, 24]; 10x data adds
    3-4 planes (log2(10) ~ 3.32), so the expected bucket n/2^p stays within
    [target/2, target] instead of growing 10x."""
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        auto_n_planes,
    )

    assert auto_n_planes(0) == 1
    assert auto_n_planes(-5) == 1
    assert auto_n_planes(1) == 1
    assert auto_n_planes(64) == 1  # n == target: log2(1) = 0, floor clamp
    assert auto_n_planes(65) == 1  # ceil(log2(65/64)) = 1
    assert auto_n_planes(128) == 1
    assert auto_n_planes(129) == 2
    assert auto_n_planes(2048) == 5
    assert auto_n_planes(10**12) == 24  # ceiling clamp
    assert auto_n_planes(2048, target_bucket_size=128) == 4
    prev = 0
    for k in range(0, 31):
        p = auto_n_planes(2**k)
        assert p >= prev  # monotone in n
        prev = p
    for n in (10_000, 100_000, 1_000_000):
        grown = auto_n_planes(10 * n) - auto_n_planes(n)
        assert 3 <= grown <= 4, (n, grown)
        p = auto_n_planes(n)
        assert 32 <= n / 2**p <= 64  # expected bucket pinned at ~target


def test_auto_n_planes_sql_mirror_parity():
    """The q_rp_plane_sizing oracle expression computes the SAME plane
    count as the Python resolver for every corpus size in a wide sweep —
    the driver only checks one n (the sf0.01 count); this pins the full
    curve including the power-of-two ceil boundaries."""
    import duckdb

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        auto_n_planes,
    )
    from postgres_cdc_reconciliation_spark.plans.text_pipeline import (
        _SIZING_N_PLANES_SQL,
    )

    ns = [0, 1, 63, 64, 65, 127, 128, 129, 4096, 4097, 10**6, 10**9, 10**12]
    ns += [2**k for k in range(1, 41)] + [2**k + 1 for k in range(1, 41)]
    con = duckdb.connect()
    for n in ns:
        expr = _SIZING_N_PLANES_SQL.replace("count(*)", str(n))
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == auto_n_planes(n), (n, got, auto_n_planes(n))


def test_rp_multi_auto_equals_explicit_resolved(spark, sf_dir):
    """n_planes='auto' (the default) must produce the IDENTICAL pair set to
    an explicit n_planes pinned at the resolved count — auto only picks the
    constant, it must not change the blocking math."""
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        auto_n_planes,
        rp_near_dup_pairs_multi,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    resolved = auto_n_planes(v.count())
    auto_pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            v, dim=64, threshold=0.3, n_tables=2
        ).collect()
    }
    explicit_pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_near_dup_pairs_multi(
            v, dim=64, threshold=0.3, n_planes=resolved, n_tables=2
        ).collect()
    }
    assert auto_pairs == explicit_pairs and auto_pairs


def test_rp_multi_rejects_bad_n_planes(spark):
    import pytest

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        rp_near_dup_pairs_multi,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # True included: bool is an int subclass, so without an explicit guard
    # n_planes=True would silently run a 1-plane blocking pass (ADVICE r9)
    for bad in (0, -3, "automatic", 2.5, True):
        with pytest.raises(ValueError, match="n_planes"):
            rp_near_dup_pairs_multi(df, dim=2, n_planes=bad)
    with pytest.raises(ValueError, match="cap_split_planes"):
        rp_near_dup_pairs_multi(
            df, dim=2, n_planes=2, max_bucket_size=5, cap_split_planes=True
        )


def test_auto_planes_bound_candidate_growth(spark):
    """The planted 10x-growth probe (VERDICT r7 #3 'done' criterion): at a
    FIXED plane count, 10x corpus means ~100x within-bucket candidate pairs
    (buckets get 10x fatter); at auto-sized planes the candidate volume
    grows ~linearly. Candidates counted exactly as sum C(bucket_size, 2)
    over one table's buckets — no pair join needed."""
    import math

    from pyspark.sql import functions as F

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        assign_rp_buckets,
        auto_n_planes,
    )

    def synth(n):
        # deterministic pseudo-random 16-dim vectors (hash-valued
        # components -> near-uniform directions; a smooth 1-parameter
        # family would concentrate the sign patterns instead)
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 15), j -> cast("
                "  pmod(xxhash64(id, j), 2000001) - 1000000 as float))"
            ).alias("embedding"),
        )

    def candidates(df, n_planes):
        b = assign_rp_buckets(df, dim=16, n_planes=n_planes)
        row = (
            b.groupBy("rp_bucket")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("c"))
            .first()
        )
        return float(row["c"] or 0.0)

    small_n, big_n = 2_000, 20_000
    small, big = synth(small_n), synth(big_n)
    fixed = candidates(big, auto_n_planes(small_n)) / max(
        candidates(small, auto_n_planes(small_n)), 1.0
    )
    auto = candidates(big, auto_n_planes(big_n)) / max(
        candidates(small, auto_n_planes(small_n)), 1.0
    )
    # fixed planes: ~quadratic (>= 50x for 10x data); auto: ~linear.
    # auto adds ceil(log2(10)) = 4 planes here, so the bound is actually
    # sub-linear in expectation; allow generous slack for bucket skew.
    assert fixed >= 50.0, fixed
    assert auto <= 30.0, auto
    assert auto <= fixed / 3.0, (auto, fixed)


def test_ivf_persisted_matches_multiprobe_and_prunes(spark, sf_dir, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk_multiprobe,
        ivf_topk_persisted,
        semantic_index_build,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents_df = ivf_centroids(v, n_cent=16, seed_lo=16)
    cents = [r["cent"] for r in cents_df.orderBy("cent_id").collect()]
    path = str(tmp_path / "ivfidx")
    assert semantic_index_build(v, path, centroids=cents) == 16
    q = v.filter(F.col("vec_id") < 16)

    mem = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
           for r in ivf_topk_multiprobe(q, v, cents_df, k=5, nprobe=4).collect()}
    out = ivf_topk_persisted(q, path, k=5, nprobe=4)
    per = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
           for r in out.collect()}
    assert set(mem) == set(per)
    for key in mem:
        assert mem[key][0] == per[key][0]
        assert abs(mem[key][1] - per[key][1]) < 1e-9

    # the persisted path opens index files only via probed-list dirs
    # (out.inputFiles() also carries the query-side embeddings scan)
    idx_files = [f for f in out.inputFiles() if "/ivfidx/" in f]
    probed_dirs = {f.rsplit("/", 2)[-2] for f in idx_files}
    assert probed_dirs <= {f"cent_id={i}" for i in range(16)}


def test_ivf_persisted_one_query_reads_nprobe_lists(spark, sf_dir, tmp_path):
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk_persisted,
        semantic_index_build,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [r["cent"] for r in ivf_centroids(v, n_cent=16, seed_lo=16)
             .orderBy("cent_id").collect()]
    path = str(tmp_path / "ivfidx1")
    semantic_index_build(v, path, centroids=cents)
    q1 = v.filter(F.col("vec_id") == 0)
    out = ivf_topk_persisted(q1, path, k=5, nprobe=2)
    assert out.count() == 5
    # a single query with nprobe=2 opens at most 2 inverted-list dirs
    idx_files = [f for f in out.inputFiles() if "/ivfidx1/" in f]
    probed_dirs = {f.rsplit("/", 2)[-2] for f in idx_files}
    assert 1 <= len(probed_dirs) <= 2
    # and strictly fewer index files than the index holds
    assert len(idx_files) < len(spark.read.parquet(path).inputFiles())
