"""Distributed Lloyd's k-means: numpy agreement, objective monotonicity,
planted-cluster recovery, and the trained-centroid IVF bridge."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators import clustering as C
from postgres_cdc_reconciliation_spark.operators import similarity as S


def _planted(spark, n_per=40, k=3, dim=8, spread=0.05):
    """k well-separated gaussian-ish blobs, deterministic (hash-derived
    offsets, no RNG)."""
    rows = []
    for c in range(k):
        center = [(3.0 * c if i == 0 else float(c)) for i in range(dim)]
        for j in range(n_per):
            # deterministic pseudo-noise from (c, j, i)
            vec = [
                center[i]
                + spread * (((c * 1_000_003 + j * 101 + i * 17) % 97) / 97.0 - 0.5)
                for i in range(dim)
            ]
            rows.append((c * n_per + j, vec, c))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, true_label int"
    )


def _np_assign(X, cents):
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1)


def test_assign_matches_numpy(spark):
    df = _planted(spark)
    X = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()])
    cents = C.kmeans_init(df, 3)
    got = {
        r["vec_id"]: (r["cent_id"], r["dist"])
        for r in C.kmeans_assign(df, cents).collect()
    }
    want_lbl, want_dist = _np_assign(X, np.array(cents))
    for vid in range(len(X)):
        assert got[vid][0] == want_lbl[vid]
        assert got[vid][1] == pytest.approx(want_dist[vid], rel=1e-9)


def test_inertia_monotone_and_convergence(spark):
    df = _planted(spark)
    cents0 = C.kmeans_init_farthest(df, 3)
    inertia0 = C.kmeans_inertia(df, cents0)
    cents, iters = C.kmeans_fit(df, 3, max_iter=6)
    inertia1 = C.kmeans_inertia(df, cents)
    # trained inertia never exceeds the seed inertia (same seeding)
    assert inertia1 <= inertia0 + 1e-9
    assert 1 <= iters <= 6


def test_farthest_init_spreads_across_blobs(spark):
    df = _planted(spark)
    seeds = np.array(C.kmeans_init_farthest(df, 3))
    # one seed per planted blob: first coordinate identifies the blob
    assert sorted(round(s[0] / 3.0) for s in seeds) == [0, 1, 2]


def test_recovers_planted_clusters(spark):
    df = _planted(spark)
    cents, _ = C.kmeans_fit(df, 3, max_iter=10)
    assigned = C.kmeans_assign(df, cents).join(
        df.select("vec_id", "true_label"), "vec_id"
    )
    # each learned cluster maps to exactly one planted label and vice versa
    purity = (
        assigned.groupBy("cent_id")
        .agg(F.count_distinct("true_label").alias("n_lbl"), F.count("*").alias("n"))
        .collect()
    )
    assert len(purity) == 3
    for r in purity:
        assert r["n_lbl"] == 1
        assert r["n"] == 40


def test_fit_agrees_with_numpy_lloyds(spark):
    """Same seeding, same iteration count → same centroids within fp noise."""
    df = _planted(spark, n_per=25, k=2, dim=4)
    X = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()])
    seed = np.array(C.kmeans_init(df, 2))
    cents, iters = C.kmeans_fit(df, 2, max_iter=3, tol=0.0, init="hash")

    np_c = seed.copy()
    for _ in range(iters):
        lbl, _d = _np_assign(X, np_c)
        for c in range(2):
            if (lbl == c).any():
                np_c[c] = X[lbl == c].mean(axis=0)
    assert np.allclose(np.array(cents), np_c, atol=1e-9)


def test_trained_centroids_drive_ivf(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, _ = C.kmeans_fit(emb, 4, max_iter=3)
    cdf = C.kmeans_centroids_df(spark, cents)
    assigned = S.ivf_assign(emb, cdf)
    n = emb.count()
    assert assigned.count() == n
    # every vector lands in a valid cluster and >1 cluster is populated
    stats = assigned.groupBy("cent_id").count().collect()
    assert {r["cent_id"] for r in stats} <= {0, 1, 2, 3}
    assert len(stats) >= 2
    # multiprobe top-k over trained lists returns k rows per query
    queries = emb.filter(F.col("vec_id") < 4)
    topk = S.ivf_topk_multiprobe(queries, emb, cdf, k=5, nprobe=4)
    per_q = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)


def test_dim_inference_survives_oversized_vector(spark):
    """Dimensionality is the MODAL vector size, not the max (ADVICE r7):
    one over-length row (e.g. two embeddings concatenated upstream) must
    not become the inferred dim — that would flip the size==dim
    well-formed filter to dropping every CLEAN row and training on the
    garbage. The oversized row costs itself; the fit runs on the rest."""
    import numpy as np

    from postgres_cdc_reconciliation_spark.operators.clustering import (
        _dim_of,
        kmeans_assign,
        kmeans_fit,
    )

    rows = [(i, [float(i % 3), float((i * 7) % 5), 1.0, 0.0]) for i in range(30)]
    rows.append((99, [0.1] * 8))  # concatenated double-length vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert _dim_of(df, "embedding") == 4
    cents, _ = kmeans_fit(df, k=2, max_iter=3)
    assert all(len(c) == 4 for c in cents)
    assigned = kmeans_assign(df, cents)
    assert assigned.count() == 30  # every clean row kept, oversized dropped


def test_dim_inference_tie_breaks_deterministically(spark):
    """Equal-frequency sizes tie to the LARGER — any deterministic rule
    works, it just must not depend on partitioning."""
    from postgres_cdc_reconciliation_spark.operators.clustering import _dim_of

    rows = [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert _dim_of(df, "embedding") == 3
    assert _dim_of(df.repartition(7), "embedding") == 3


def test_numpy_assignment_agrees_with_literal(spark):
    """The Arrow-batched gemm E-step and the literal-folded SQL expression
    must assign identically (same tie rule, fp-identical on clear-margin
    data) and both must drop malformed vectors."""
    from postgres_cdc_reconciliation_spark.operators.clustering import (
        kmeans_assign,
    )

    rows = [(i, [float((i * 13) % 7), float((i * 5) % 11), 1.0]) for i in range(200)]
    rows.append((900, None))  # malformed: NULL vector
    rows.append((901, [1.0]))  # malformed: truncated
    rows.append((902, [float("nan"), 0.0, 0.0]))  # malformed: non-finite
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[0.0, 0.0, 1.0], [3.0, 5.0, 1.0], [6.0, 9.0, 1.0]]
    lit = {r["vec_id"]: (r["cent_id"], r["dist"]) for r in
           kmeans_assign(df, cents, assign="literal").collect()}
    npy = {r["vec_id"]: (r["cent_id"], r["dist"]) for r in
           kmeans_assign(df, cents, assign="numpy").collect()}
    assert set(lit) == set(npy) == set(range(200))  # malformed dropped both
    for vid in lit:
        assert lit[vid][0] == npy[vid][0], vid
        assert abs(lit[vid][1] - npy[vid][1]) < 1e-9 * (1 + lit[vid][1])


def test_fit_numpy_estep_matches_literal_centroids(spark):
    from postgres_cdc_reconciliation_spark.operators.clustering import (
        kmeans_fit,
    )

    rows = [
        (i, [float(10 * (i % 3)) + 0.01 * i, float(i % 5)]) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a, _ = kmeans_fit(df, k=3, max_iter=4, init="hash", assign="literal")
    b, _ = kmeans_fit(df, k=3, max_iter=4, init="hash", assign="numpy")
    for ca, cb in zip(a, b):
        for xa, xb in zip(ca, cb):
            assert abs(xa - xb) < 1e-9 * (1 + abs(xa))


def test_assign_auto_switches_on_k_times_dim(spark):
    from postgres_cdc_reconciliation_spark.operators.clustering import (
        _assign_mode,
    )

    assert _assign_mode("auto", 16, 64) == "literal"  # 1024 terms
    assert _assign_mode("auto", 300, 64) == "numpy"  # 19200 terms
    assert _assign_mode("literal", 300, 64) == "literal"
    try:
        _assign_mode("gemm", 2, 2)
    except ValueError:
        pass
    else:
        raise AssertionError("bad mode must raise")
