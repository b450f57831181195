"""Reconciliation self-test (SURVEY.md §5): inject known mutations, assert
the diff finds exactly them."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark import fixtures as fx
from postgres_cdc_reconciliation_spark.operators.recon import (
    compare_counts,
    diff_by_hash,
    diff_rows,
    diff_rows_positional,
    verify_batch,
)


def test_diff_rows_finds_exact_mutations(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)
    d = diff_rows(src, tgt, ["order_id"])
    by_type = {r["diff_type"]: r["cnt"] for r in d.groupBy("diff_type").agg(F.count("*").alias("cnt")).collect()}
    n = src.count()
    missing = src.filter(F.col("order_id") % 97 == 0).count()
    dups = src.filter((F.col("order_id") % 101 == 0) & (F.col("order_id") % 97 != 0)).count()
    perturbed = src.filter(
        (F.col("order_id") % 89 == 0) & (F.col("order_id") % 97 != 0) & (F.col("order_id") % 101 != 0)
    ).count()
    assert by_type.get("missing_in_target", 0) == missing
    assert by_type.get("extra_in_target", 0) == 3  # shifted-key extras
    assert by_type.get("cardinality_mismatch", 0) == dups
    assert by_type.get("value_mismatch", 0) == perturbed
    assert n > 0


def test_diff_by_hash_matches_keyed_diff(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)
    # dedupe cardinality effects: hash diff is per-key, so compare on the
    # deduped portion (unique keys both sides)
    s1 = src.dropDuplicates(["order_id"])
    t1 = tgt.dropDuplicates(["order_id"])
    keyed = diff_rows(s1, t1, ["order_id"])
    hashed = diff_by_hash(s1, t1, ["order_id"])
    assert keyed.count() == hashed.count()
    assert set(r["order_id"] for r in keyed.collect()) == set(
        r["order_id"] for r in hashed.collect()
    )


def test_positional_diff_misaligns_like_reference(spark):
    # the documented reference behavior: one missing row shifts everything
    src = spark.createDataFrame([(i, f"v{i}") for i in range(1, 6)], "id int, v string")
    tgt = src.filter(F.col("id") != 2)  # drop one row
    d = diff_rows_positional(src, tgt, ["id"])
    # every position from the gap onward differs (4 rows: pos 2..5)
    assert d.count() == 4


def test_verify_batch_verdicts(spark, sf_dir):
    src, _ = fx.recon_pair(spark, sf_dir)
    ok = verify_batch(spark, src, src, ["order_id"])
    assert ok["consistent"] and ok["counts_match"] and ok["n_differences"] == 0
    _, tgt = fx.recon_pair(spark, sf_dir)
    bad = verify_batch(spark, src, tgt, ["order_id"], max_report=5)
    assert not bad["consistent"] and len(bad["sample"]) == 5


def test_compare_counts_multi_table(spark, sf_dir):
    src, tgt = fx.recon_pair(spark, sf_dir)
    out = compare_counts(
        {"orders": (src, tgt), "orders_self": (src, src)}
    ).collect()
    by_t = {r["table_name"]: r for r in out}
    assert not by_t["orders"]["counts_match"]
    assert by_t["orders_self"]["counts_match"]


def test_fingerprint_diff_flags_exactly_divergent_buckets(spark, sf_dir):
    """Bucket summary truth: a bucket is flagged iff the keyed row diff
    finds a divergence hashing into it; clean buckets are proven clean."""
    from postgres_cdc_reconciliation_spark import fixtures as fx
    from postgres_cdc_reconciliation_spark.operators.recon import (
        diff_rows,
        fingerprint_diff,
        fingerprint_drilldown,
    )
    from pyspark.sql import functions as F

    src, tgt = fx.recon_pair(spark, sf_dir)
    n = 64
    bucket = lambda df: F.col("order_id") % n  # noqa: E731
    summary = fingerprint_diff(
        src, tgt, ["order_id"], n_buckets=n, bucket_of=bucket
    ).cache()
    # non-vacuous: both clean and divergent buckets exist
    flags = {r.bucket: r.bucket_match for r in summary.collect()}
    assert any(flags.values()) and not all(flags.values())

    # ground truth from the full keyed diff (includes dup-cardinality and
    # extra/missing rows: every diff type must surface in the bucket flags)
    truth = diff_rows(src, tgt, ["order_id"])
    bad_truth = {
        r.b for r in truth.select((F.col("order_id") % n).alias("b")).collect()
    }
    bad_flagged = {b for b, ok in flags.items() if not ok}
    assert bad_flagged == bad_truth

    # drill-down on the flagged buckets == full diff (nothing outside them)
    drill = fingerprint_drilldown(
        src, tgt, ["order_id"], summary, n_buckets=n, bucket_of=bucket
    )
    cols = sorted(drill.columns)
    norm = lambda df: sorted(  # noqa: E731
        tuple(r[c] for c in cols) for r in df.collect()
    )
    assert norm(drill) == norm(truth)


def test_fingerprint_canonicalization_distinguishes_null_and_delimiters(spark):
    """The netstring row encoding must not alias NULL with any literal
    string, nor let delimiter-bearing values shift across field
    boundaries (a plain '|' join fails both)."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        fingerprint_diff,
    )

    schema = "k int, a string, b string"
    base = spark.createDataFrame([(1, "x", None)], schema)
    for rows in (
        [(1, "x", "N")],        # literal 'N' vs NULL
        [(1, "x|0", None)],     # delimiter injection
        [(1, "x", "")],         # empty string vs NULL
        [(1, "x|N", None)],     # combined
    ):
        tgt = spark.createDataFrame(rows, schema)
        out = fingerprint_diff(base, tgt, ["k"], n_buckets=4).collect()
        assert not all(r.bucket_match for r in out), rows
    # and identical frames DO match
    same = fingerprint_diff(base, base, ["k"], n_buckets=4).collect()
    assert all(r.bucket_match for r in same)


def test_diff_by_hash_null_position_no_alias(spark):
    """(a, NULL, b) vs (a, b, NULL) must report a mismatch — xxhash64
    ignores NULL args, so unmarked hashing would collide them."""
    from postgres_cdc_reconciliation_spark.operators.recon import diff_by_hash

    schema = "k int, a string, b string"
    src = spark.createDataFrame([(1, None, "b"), (2, "vx", None)], schema)
    tgt = spark.createDataFrame([(1, "b", None), (2, "x", None)], schema)
    got = {r.k: r.diff_type for r in diff_by_hash(src, tgt, ["k"]).collect()}
    # k=1: null-position swap; k=2: 'vx' vs 'x' must differ despite the
    # 'v' value prefix (prefix is concatenated, not ambiguous)
    assert got == {1: "value_mismatch", 2: "value_mismatch"}
    same = diff_by_hash(src, src, ["k"]).collect()
    assert same == []


def test_fingerprint_ignores_target_schema_accidents(spark):
    """The canonical column list comes from the SOURCE: a target with a
    different physical column order or an extra layout column (_bucket)
    must compare equal on identical data — the code-review failure case
    where every bucket flagged divergent while the drill-down found
    nothing."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        fingerprint_diff,
    )

    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k int, s string, v double"
    )
    reordered = src.select("v", "k", "s")
    with_extra = src.withColumn("_bucket", (src.k % 4).cast("int"))
    for tgt in (reordered, with_extra):
        out = fingerprint_diff(src, tgt, ["k"], n_buckets=4).collect()
        assert all(r.bucket_match for r in out), tgt.columns
    # a target MISSING a source column is a schema divergence: fail loudly
    import pytest

    with pytest.raises(Exception):
        fingerprint_diff(src, src.drop("v"), ["k"], n_buckets=4).collect()


def test_diff_rows_key_only_tables(spark):
    """Tables with no non-key columns diff on existence/cardinality alone
    (compare_cols resolves empty — previously built an ill-formed when())."""
    from postgres_cdc_reconciliation_spark.operators.recon import diff_rows

    s = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    t = spark.createDataFrame([(2,), (3,)], "k long")
    out = {r["k"]: r["diff_type"] for r in diff_rows(s, t, ["k"]).collect()}
    assert out == {
        1: "missing_in_target",
        2: "cardinality_mismatch",
        3: "extra_in_target",
    }


def test_repair_batch_converges_target_onto_source(spark):
    from postgres_cdc_reconciliation_spark.operators.apply import apply_batch
    from postgres_cdc_reconciliation_spark.operators.recon import repair_batch

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, amount double",
    )
    tgt = spark.createDataFrame(
        [(1, "a", 10.0),          # identical: untouched
         (2, "b", 99.0),          # value drift -> upsert
         (5, "x", 1.0)],          # phantom -> delete     (3,4 missing)
        "id long, name string, amount double",
    )
    batch = repair_batch(src, tgt, ["id"])
    ops = {(r["id"], r["op"]) for r in batch.collect()}
    assert ops == {(2, "u"), (3, "u"), (4, "u"), (5, "d")}
    healed = apply_batch(tgt, batch, ["id"])
    assert sorted(map(tuple, healed.collect())) == sorted(
        map(tuple, src.collect())
    )
    # a healed target needs no further repair: the loop is a fixpoint
    assert repair_batch(src, healed, ["id"]).count() == 0


def test_repair_batch_duplicate_keys_converge_to_max_image(spark):
    from postgres_cdc_reconciliation_spark.operators.apply import apply_batch
    from postgres_cdc_reconciliation_spark.operators.recon import repair_batch

    src = spark.createDataFrame(
        [(1, 5.0), (1, 7.0), (2, 1.0)], "id long, amount double"
    )
    tgt = spark.createDataFrame([(2, 1.0)], "id long, amount double")
    healed = apply_batch(tgt, repair_batch(src, tgt, ["id"]), ["id"])
    # the documented convention: duplicate-keyed sources converge to the
    # per-key MAX image (diff_rows' cardinality aggregation)
    assert sorted(map(tuple, healed.collect())) == [(1, 7.0), (2, 1.0)]


def test_global_positions_distributed_and_exact(spark):
    """The two-pass distributed position assignment (r13) must produce
    EXACTLY row_number-over-global-order semantics: positions are the
    permutation 1..n, monotone with the sort order, and tied sort keys
    occupy a contiguous position block. Data is crafted to span many
    range partitions with heavy duplication."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        _with_global_positions,
    )

    df = spark.range(5000).selectExpr(
        "cast(id % 97 as int) as k",      # heavy ties
        "cast(id as long) as payload",
    )
    out = _with_global_positions(df, ["k"]).collect()
    assert sorted(r["_pos"] for r in out) == list(range(1, 5001))
    # monotone: position order must agree with the sort order on k
    by_pos = sorted(out, key=lambda r: r["_pos"])
    ks = [r["k"] for r in by_pos]
    assert ks == sorted(ks)
    # contiguous tie blocks: each k value owns one position interval
    seen = {}
    for r in by_pos:
        seen.setdefault(r["k"], []).append(r["_pos"])
    for k, poss in seen.items():
        assert poss == list(range(min(poss), max(poss) + 1)), k


def test_scoped_persist_bounds_cached_handles(spark):
    """ADVICE r13 #1 follow-up (r14): the positional diff no longer uses
    the scoped CACHE at all — its two passes must see identical range
    boundaries, and a cache eviction between them could force a
    re-sample (duplicate positions; see _with_global_positions). It now
    localCheckpoints the ranged frame, so the bounded-storage property
    becomes: checkpoint blocks are RELEASED once the plan handles are
    garbage-collected — repeated recon runs in a long-lived session
    still must not accumulate blocks without bound. The loop also
    re-asserts exact results under churn (the r14 regression this
    redesign fixes surfaced as a wrong row count here)."""
    import gc
    import time

    from postgres_cdc_reconciliation_spark.operators import cache_scope
    from postgres_cdc_reconciliation_spark.operators.recon import (
        diff_rows_positional,
    )

    cache_scope.release_all()
    # baseline OTHER cached RDDs (shared-session fixtures, earlier tests):
    # the bound under test is the GROWTH this loop adds, so assert on the
    # delta — the absolute count is not this test's to control
    jsc = spark.sparkContext._jsc.sc()

    def _n_cached() -> int:
        return len([r for r in jsc.getRDDStorageInfo() if r.isCached()])

    before = _n_cached()
    src = spark.range(200).selectExpr("id as k", "cast(id as double) as v")
    tgt = spark.range(200).selectExpr(
        "id as k", "cast(id + if(id = 50, 1, 0) as double) as v"
    )
    # 2x the FIFO cap fully cycles every slot once and keeps churning
    # (r15: was 3x — the third lap re-proved the same steady state and
    # cost ~6 s of suite wall; the bound and the exact-results assertion
    # are unchanged)
    for _ in range(2 * cache_scope._CAP):
        d = diff_rows_positional(src, tgt, ["k"])
        assert d.count() == 1
        d = None
    # checkpoint blocks release via the ContextCleaner once the Python
    # plan handles are collected — nudge both sides and poll (the same
    # lifecycle bench.py relies on between queries)
    for _ in range(50):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if _n_cached() - before <= cache_scope._CAP:
            break
        time.sleep(0.2)
    assert _n_cached() - before <= cache_scope._CAP
    cache_scope.release_all()
    with cache_scope._lock:
        assert not cache_scope._handles


def test_range_pid_expr_nulls_nan_and_duplicates(spark):
    """r15 boundary-broadcast mechanics: the value-derived bucket id must
    be monotone under Spark's sort semantics for dirty keys too — NULLs
    (asc NULLS FIRST), NaN (above every number), heavy duplication — so
    positions stay the exact 1..n permutation with contiguous tie
    blocks."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        _with_global_positions,
    )

    rows = [(float("nan"), i) for i in range(40)]
    rows += [(None, i) for i in range(40)]
    rows += [(float(i % 7), i) for i in range(400)]
    df = spark.createDataFrame(rows, "k double, payload long")
    out = _with_global_positions(df, ["k"]).collect()
    assert sorted(r["_pos"] for r in out) == list(range(1, len(rows) + 1))
    by_pos = sorted(out, key=lambda r: r["_pos"])

    def order_key(v):
        if v is None:
            return (0, 0.0)
        if v != v:
            return (2, 0.0)
        return (1, v)

    ks = [order_key(r["k"]) for r in by_pos]
    assert ks == sorted(ks)


def test_range_pid_expr_desc_key_matches_global_window(spark):
    """The desc-numeric path (q_vocab_coverage's freq DESC) must bucket
    monotone under the descending order — checked against the global
    row_number."""
    from pyspark.sql import Window

    from postgres_cdc_reconciliation_spark.operators.recon import (
        range_boundaries,
        range_pid_expr,
    )

    df = spark.range(3000).selectExpr(
        "cast(id % 53 as long) as freq", "concat('t', id) as token"
    )
    keys = [("freq", False), ("token", True)]
    bounds = range_boundaries(df, keys, 8)
    assert bounds, "sample must yield boundaries on 3000 rows"
    wp = df.withColumn("_pid", range_pid_expr(df, keys, bounds))
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    chk = wp.withColumn("_rn", F.row_number().over(w)).collect()
    by_rn = sorted(chk, key=lambda r: r["_rn"])
    pids = [r["_pid"] for r in by_rn]
    assert pids == sorted(pids), "bucket id must be monotone in sort order"


def test_range_boundaries_tiny_frames(spark):
    """Frames smaller than the sample budget (or that thin to nothing)
    still position exactly — fewer boundaries only coarsen balance."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        _with_global_positions,
    )

    for n in (0, 1, 3, 31):
        df = spark.range(n).selectExpr("cast(id % 5 as long) as k", "id as v")
        out = _with_global_positions(df, ["k"]).collect()
        assert sorted(r["_pos"] for r in out) == list(range(1, n + 1))
