"""Plan audit for the headline relational queries: the optimized physical
plans must be the ones we'd accept at 100 TB — no accidental cartesian
products, small dimensions broadcast, filters pushed to the parquet scans.
Catches regressions where an innocent-looking change (a cast on a join
key, a renamed column) silently degrades the join strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.plans.registry import all_queries

# TPC-H-shaped queries joining fact tables to small dims: nation/region/
# supplier/customer sides must broadcast, never cartesian.
AUDITED = [
    "q_pricing_summary",
    "q_top_customers",
    "q_regional_revenue",
    "q_shipping_priority",
    "q_volume_shipping",
    "q_market_share",
    "q_large_orders",
    "q_min_cost_supplier",
    "q_part_value_share",
    "q_excess_suppliers",
    "q_product_profit",
    "q_top_supplier",
    "q_disjunctive_revenue",
    "q_return_fault_suppliers",
    "q_promo_revenue",
]


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# Building a registered query's DataFrame is not free — many fn()s run
# bounded driver actions (scale fits, boundary samples, count-sized knobs)
# before returning the plan. Every test in this module audits the SAME
# session-scoped (spark, sf_dir) plans, so build each query's plan string
# once per run and share it (r15: the module rebuilt ~190 plans three
# times over — ~1 min of redundant suite wall).
_PLAN_CACHE: dict[str, str] = {}


def _plan_of(qs, spark, sf_dir, name: str) -> str:
    if name not in _PLAN_CACHE:
        _PLAN_CACHE[name] = _plan(qs[name].fn(spark, sf_dir))
    return _PLAN_CACHE[name]


def test_no_cartesian_and_broadcasts_present(spark, sf_dir):
    qs = all_queries()
    missing = [n for n in AUDITED if n not in qs]
    assert not missing, f"audited queries no longer registered: {missing}"
    offenders, no_broadcast = [], []
    for name in AUDITED:
        plan = _plan_of(qs, spark, sf_dir, name)
        if "CartesianProduct" in plan:
            offenders.append(name)
        if "BroadcastHashJoin" not in plan and "Join" in plan:
            no_broadcast.append(name)
    assert not offenders, f"cartesian product in: {offenders}"
    # every audited query joins at least one broadcast-sized dim
    assert not no_broadcast, f"no broadcast join in: {no_broadcast}"


def test_scans_prune_columns(spark, sf_dir):
    """Column pruning must reach the lineitem scan: the widest fact table
    read should never materialize all 16 columns for an aggregate query."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_pricing_summary")
    # the formatted plan prints the scan's ReadSchema; l_comment is never
    # referenced by the query and must not be read
    assert "l_comment" not in plan


def test_text_pipeline_plans(spark, sf_dir):
    """The new text/curation queries must keep their intended shapes:
    no cartesian products anywhere; the vocab-join queries broadcast the
    frequency table back to the token stream."""
    qs = all_queries()
    for name in ("q_tfidf", "q_unigram_logprob", "q_dedup_incremental",
                 "q_stratified_sample", "q_corpus_mix", "q_bm25"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
    for name in ("q_tfidf", "q_unigram_logprob", "q_bm25"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, f"{name} lost its vocab broadcast"


def test_top1_per_group_is_hash_agg_not_window_sort(spark, sf_dir):
    """The top-1-per-group idiom (r3 VERDICT): q_priority_pick and the
    status path's latest-batch pick must run as min_by/max_by hash
    aggregation (map-side partial agg, no per-partition sort), never as a
    row_number window. A window would show a Window node + a Sort inside
    the group exchange."""
    qs = all_queries()
    for name in ("q_priority_pick", "q_latest_per_group"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "Window" not in plan, f"{name} regressed to a window plan"
        # min_by/max_by over a struct is a typed aggregate: Spark plans it
        # as ObjectHashAggregate (hash-based, map-side partial) rather than
        # codegen HashAggregate — either proves the no-sort agg idiom
        assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, (
            f"{name} lost its hash agg"
        )


def test_grouped_demean_stays_native(spark, sf_dir):
    """q_grouped_demean must stay a native window agg (no Python/Arrow
    round-trip in the plan — that is the r3 VERDICT's per-group-Python
    scale smell, moved to tests/test_pandas_surface.py as a demo)."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_grouped_demean")
    for node in ("FlatMapGroupsInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_lakehouse_plans(spark, sf_dir):
    """CDF diff and schema-evolution apply stay keyed joins: the full-outer
    PK diff and the anti-join of touched keys must never degrade to a
    cartesian product."""
    qs = all_queries()
    for name in ("q_snapshot_cdf", "q_schema_evolution"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_behavioral_analytics_plans(spark, sf_dir):
    """Cohort/funnel/triangle queries stay keyed: the funnel's chained
    min-aggs, the cohort joins, and the triangle 2-path closure must all
    plan as equality joins (a cartesian 3-way self-join would be O(E^3))."""
    qs = all_queries()
    for name in ("q_cohort_retention", "q_funnel_steps", "q_triangle_count"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_scd2_windows_share_one_exchange(spark, sf_dir):
    """q_scd2_dim's two windows (lead over all events, row_number over the
    surviving versions) partition on the same key: Catalyst must plan ONE
    Exchange and ONE Sort feeding both — a second per-window shuffle/sort
    would double the cost of the history build at 100 TB."""
    qs = all_queries()
    df = qs["q_scd2_dim"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert p.count("Exchange") == 1, p
    assert p.count("Window") == 2, p


def test_compaction_is_single_partial_final_agg(spark, sf_dir):
    """q_changelog_compaction must stay ONE aggregation with a map-side
    partial/final split (shuffle O(keys)) and ZERO window functions — the
    whole-changelog window-sort formulation has no partial aggregation and
    shuffles O(events)."""
    qs = all_queries()
    df = qs["q_changelog_compaction"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert p.count("Exchange") == 1, p
    assert "Window" not in p, p
    # partial + final instances of the same aggregate (SortAggregate: the
    # struct max_by buffer isn't hash-agg mutable; the split is what matters)
    assert p.count("Aggregate") >= 2, p


def test_kcore_and_fingerprint_plans(spark, sf_dir):
    """k-core rounds and the fingerprint recon must stay keyed: no
    cartesian anywhere; the fingerprint summary's only wide-plan join is
    the O(buckets)-row full-outer merge of the two per-bucket aggregates."""
    qs = all_queries()
    for name in ("q_kcore", "q_recon_fingerprint"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_r6_registrations_plan_shapes(spark, sf_dir):
    """The four round-6 registrations keep their intended physical shapes:

    - q_interval_overlap: the chunk-binned formulation exists to REPLACE a
      theta join, so the plan must contain an equality join (hash or
      sort-merge) and never a CartesianProduct / nested-loop.
    - q_profile_diff: single-scan-per-side parallel aggregates — keyed
      joins only.
    - q_series_similarity: the query-key series joins every candidate row,
      and it is one bounded series — it must broadcast.
    - q_series_dtw: BOTH Sakoe-Chiba bands are scored in ONE
      Arrow-batched pandas-UDF stage over packed series rows (exactly one
      ArrowEvalPython, zero per-group FlatMapGroupsInPandas, and the UDF
      evaluated once — a pushed-through filter would duplicate it and run
      the whole DP twice per key).
    """
    qs = all_queries()
    for name in ("q_interval_overlap", "q_profile_diff",
                 "q_series_similarity", "q_series_dtw"):
        plan = _plan_of(qs, spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        if name != "q_profile_diff":
            # profile_diff's exact mode cross-joins two ONE-ROW aggregate
            # results (the Expand-split fix) — that plans as a benign
            # BroadcastNestedLoopJoin over single rows, the repo's accepted
            # 1-row-aggregate pairing pattern
            assert "BroadcastNestedLoopJoin" not in plan, name
        if name == "q_interval_overlap":
            assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
                    or "ShuffledHashJoin" in plan), plan
        if name == "q_series_similarity":
            assert "BroadcastHashJoin" in plan, plan
        if name == "q_series_dtw":
            df = qs[name].fn(spark, sf_dir)
            simple = df._jdf.queryExecution().explainString(
                df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            assert simple.count("ArrowEvalPython") == 1, simple
            assert simple.count("FlatMapGroupsInPandas") == 0, simple


def test_python_stages_pin_explicit_parallelism(spark, sf_dir):
    """Regression pin for the AQE-coalescing fix: the applyInPandas stages
    whose cost is per-group Python work (DTW DP, per-bucket gemm) must keep
    their explicit repartition (REPARTITION_BY_NUM survives in the plan) —
    without it AQE's byte-based coalescing folds the few-MB shuffle to one
    partition and serializes the Python work."""
    qs = all_queries()
    df = qs["q_series_dtw"].fn(spark, sf_dir)
    simple = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "REPARTITION_BY_NUM" in simple, simple

    # the per-bucket gemm scorer (matrix mode) now backs q_dedup_embed_matrix
    # and the two rp near-dup queries — pin its repartition at operator level
    from postgres_cdc_reconciliation_spark.operators.similarity import (
        rp_near_dup_pairs_multi,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    mdf = rp_near_dup_pairs_multi(vecs, dim=4, scorer="matrix")
    msimple = mdf._jdf.queryExecution().explainString(
        mdf.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "REPARTITION_BY_NUM" in msimple, msimple

    # evaluate-once: a threshold filter over a projected pandas-UDF column
    # must not duplicate the UDF through filter pushdown (one
    # ArrowEvalPython, not two — each extra node re-runs the whole einsum
    # per candidate pair)
    ndf = rp_near_dup_pairs_multi(vecs, dim=4, scorer="numpy")
    nsimple = ndf._jdf.queryExecution().explainString(
        ndf.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert nsimple.count("ArrowEvalPython") == 1, nsimple


def test_no_cartesian_or_row_python_anywhere(spark, sf_dir):
    """The whole-registry anti-pattern sweep: EVERY registered query's
    physical plan must be free of CartesianProduct (quadratic row blowup)
    and BatchEvalPython (row-at-a-time Python — the engine's contract is
    JVM-native or Arrow-batched only). The targeted pins above guard the
    queries where a specific strategy matters; this sweep guards the other
    ~140 against an innocent refactor quietly degrading one of them.
    (~1 min: a few queries eagerly materialize bounded intermediates
    during plan build.)"""
    qs = all_queries()
    offenders = []
    for name in qs:
        p = _plan_of(qs, spark, sf_dir, name)
        if "CartesianProduct" in p:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in p:
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, offenders


def test_prefix_join_and_point_lookup_plans(spark, sf_dir):
    """Round-10 additions keep 100 TB-acceptable shapes: the prefix-
    filtered Jaccard join has no cartesian product (every join is an
    equality join on shingle / doc id), and the manifest point lookup
    reads a single-digit number of bucket files with the key IN-list
    pushed into the parquet scan."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_dedup_ngram_prefix")
    assert "CartesianProduct" not in plan

    df = qs["q_manifest_point_lookup"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the probe-key filter must reach the scan (pushed or partition-level):
    # the plan's one scan is over the routed bucket dirs only, which is the
    # real pruning — assert it reads strictly fewer files than the target's
    # full snapshot holds... the target is bucket-granular, so equality can
    # only occur if every bucket is probed, which k%97 keys never do at
    # the tested scale factors
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        read_snapshot,
    )
    from postgres_cdc_reconciliation_spark.plans.lakehouse import (
        _ensure_cdf_root,
    )

    root = _ensure_cdf_root(spark, sf_dir)
    assert len(df.inputFiles()) < len(read_snapshot(spark, root).inputFiles())


def test_round10b_registrations_plan_shapes(spark, sf_dir):
    """Second round-10 batch: the zone-map range scan must open strictly
    fewer files than the clustered layout holds (file skipping is the
    point); semantic dedup and perplexity bucketing stay cartesian-free
    (cluster-keyed / lang-keyed joins only); target stats touch parquet
    footers, not data (its plan is a pure local relation — no scan node)."""
    qs = all_queries()

    df = qs["q_range_pruned_scan"].fn(spark, sf_dir)
    assert "CartesianProduct" not in _plan(df)
    from postgres_cdc_reconciliation_spark.plans.lakehouse import (
        _ensure_zone_root,
    )

    root = _ensure_zone_root(spark, sf_dir)
    assert len(df.inputFiles()) < len(spark.read.parquet(root).inputFiles())

    for name in ("q_semantic_dedup", "q_perplexity_buckets",
                 "q_training_shards"):
        assert "CartesianProduct" not in _plan_of(qs, spark, sf_dir, name), name

    stats = qs["q_target_stats"].fn(spark, sf_dir)
    plan = _plan(stats)
    assert "Scan parquet" not in plan  # footer-derived: zero data IO


def test_round10c_registrations_plan_shapes(spark, sf_dir):
    """Third round-10 batch. q_semantic_dedup_incremental and
    q_ann_ivf_persisted read index files ONLY through their routed
    cluster-dir lists (never more than the index holds — at sf0.001 the
    registered probes are large enough relative to k that they may
    legitimately touch every cluster; STRICT pruning for small probes is
    pinned in test_semantic_dedup / test_similarity_fast).
    q_semantic_contamination's eval side must be broadcast (a
    BroadcastNestedLoopJoin — the corpus side never shuffles)."""
    qs = all_queries()

    from postgres_cdc_reconciliation_spark.plans.text_pipeline import (
        _ensure_ivfindex_root,
        _ensure_semindex_root,
    )

    df = qs["q_semantic_dedup_incremental"].fn(spark, sf_dir)
    sem_root = _ensure_semindex_root(spark, sf_dir)
    sem_files = [f for f in df.inputFiles() if "/idx/" in f]
    assert 0 < len(sem_files) <= len(
        spark.read.parquet(sem_root).inputFiles()
    )
    assert all("/cent_id=" in f for f in sem_files)
    assert "CartesianProduct" not in _plan(df)

    df = qs["q_ann_ivf_persisted"].fn(spark, sf_dir)
    ivf_root = _ensure_ivfindex_root(spark, sf_dir)
    ivf_files = [f for f in df.inputFiles() if "/idx/" in f
                 and f not in set(sem_files)]
    assert 0 < len(ivf_files) <= len(
        spark.read.parquet(ivf_root).inputFiles()
    )
    assert all("/cent_id=" in f for f in ivf_files)
    assert "CartesianProduct" not in _plan(df)

    # production scorer: one Arrow-batched gemm map over the corpus —
    # no join, no shuffle, no row-at-a-time Python
    plan = _plan_of(qs, spark, sf_dir, "q_semantic_contamination")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan.split("MapInPandas")[0]

    # reference scorer: the eval side must be broadcast (a
    # BroadcastNestedLoopJoin — the corpus side never shuffles)
    from postgres_cdc_reconciliation_spark.operators.curation import (
        semantic_contamination_report,
    )

    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fold = semantic_contamination_report(
        v.filter(F.col("vec_id") % 4 != 1),
        v.filter(F.col("vec_id") % 4 == 1),
        scorer="fold",
    )
    plan = _plan(fold)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_round11_registrations_plan_shapes(spark, sf_dir):
    """Round-11 batch: the bloom point probe must open strictly fewer
    files than the clustered layout holds (membership skipping on an
    UNclustered column is the point); the span-coverage query stays
    cartesian-free (one gram-keyed shuffle + the duplicated-tail
    join-back, interval union in a window)."""
    qs = all_queries()

    df = qs["q_bloom_pruned_scan"].fn(spark, sf_dir)
    assert "CartesianProduct" not in _plan(df)
    from postgres_cdc_reconciliation_spark.plans.lakehouse import (
        _ensure_zone_root,
    )

    root = _ensure_zone_root(spark, sf_dir)
    assert 0 < len(df.inputFiles()) < len(
        spark.read.parquet(root).inputFiles()
    )

    df = qs["q_dup_spans"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # stays JVM-side

    # heavy hitters: every sketch-cell lookup must be a broadcast join
    # (the data side never shuffles for estimation) and stay JVM-side
    df = qs["q_heavy_hitters"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan

    # forward as-of: same union + fill-window shape as backward — one
    # keyed exchange, no join node at all, no Python
    df = qs["q_asof_forward"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def _simple_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_gapfill_and_metrics_plans(spark, sf_dir):
    qs = all_queries()

    # gapfill: the readings rollup BROADCASTS to the per-key grid (no
    # co-partition shuffle for the join), all four fills' windows reuse
    # one (key) partitioning (no Exchange between Window nodes), and the
    # whole plan stays JVM-side with no cartesian
    df = qs["q_gapfill"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    p = _simple_plan(df)
    # two aggregation shuffles (readings rollup + span) + the broadcast;
    # the windows must not add a hash exchange of their own
    assert p.count("Exchange hashpartitioning") <= 2, p

    # time-weighted / counter deltas: one window exchange + one final
    # keyed agg REUSING it — the window's (key) partitioning satisfies
    # the groupBy, so a second exchange means the sharing broke
    for name in ("q_time_weighted", "q_counter_delta"):
        df = qs[name].fn(spark, sf_dir)
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        p = _simple_plan(df)
        assert p.count("Exchange hashpartitioning") == 1, (name, p)


def test_round12_nullsafe_suppress_plan(spark, sf_dir):
    """suppress_to_k's null-safe join-back must still plan as a hash
    equi join (eqNullSafe is an equi-join predicate), never a nested
    loop — the r12 NULL-QI fix must not change the plan class."""
    qs = all_queries()
    df = qs["q_k_suppress"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BatchEvalPython" not in plan


def test_round12_stats_join_cached_plan_shape(spark, sf_dir):
    """q_stats_join with the session plan cache still pins the
    footer-decided broadcast: the cached decision must reproduce the
    same physical strategy as fresh planning."""
    qs = all_queries()
    for _ in range(2):  # second call rides the cache
        plan = _plan_of(qs, spark, sf_dir, "q_stats_join")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


def test_vocab_coverage_no_single_partition_exchange(spark, sf_dir):
    """VERDICT r12 #1: the vocabulary rank/cumulative-share query must
    never funnel the whole vocabulary through one task. The two-pass
    prefix sum windows WITHIN range partitions (hash Exchange on _pid) —
    the plan must contain no SinglePartition Exchange and no
    empty-partition-spec Window."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_vocab_coverage")
    assert "Exchange SinglePartition" not in plan
    assert "SinglePartition" not in plan
    # the windows are partitioned by the range-partition id
    assert "_pid" in plan
    # and the offsets come back as a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan


def test_repetition_mode_freq_is_sorted_run(spark, sf_dir):
    """VERDICT r12 #2: mode_freq must be the O(n log n) sorted-run fold,
    not the quadratic count-per-distinct-token transform — a single
    100k-token document would cost ~1e10 comparisons inside one row's
    expression eval. Map-only shape: no Exchange at all."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_repetition")
    assert "sort_array" in plan
    # the quadratic form iterated filter(w, ...) once per distinct token
    assert "filter(w" not in plan.replace("Filter", "filter_")
    # still no KEYED shuffle — the metrics stay partition-local array math.
    # r14's spread_scan may add ONE round-robin fan-out exchange below the
    # map when the source is a single-row-group file (guide §2.5); that is
    # scan parallelization, not a data shuffle, and it no-ops on healthy
    # parallel scans. Keyed partitionings print as hashpartitioning/
    # rangepartitioning/SinglePartition in the exchange arguments.
    for marker in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert marker not in plan, marker


def test_repetition_mode_freq_values(spark, sf_dir):
    """The sorted-run fold is value-identical to multiplicity counting on
    crafted docs (ties, singleton, all-same, mode at array ends)."""
    from collections import Counter

    from postgres_cdc_reconciliation_spark.plans.registry import all_queries

    docs = [
        (1, "a b a c a"),            # mode 'a' x3
        (2, "z"),                    # singleton -> 1
        (3, "x x x x"),              # all same -> 4
        (4, "b a a b"),              # tie at 2
        (5, "c b a a b c"),          # tie at 2, mode not first sorted
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, "en", 0, 0.0) for i, t in docs],
            "doc_id long, text string, lang string, length long, score double",
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: r["mode_token_share"]
            for r in all_queries()["q_repetition"].fn(spark, tmp).collect()
        }
    for i, t in docs:
        toks = t.split(" ")
        expect = max(Counter(toks).values()) / len(toks)
        assert abs(got[i] - expect) < 1e-12, (i, got[i], expect)


def test_recon_positional_no_single_partition_window(spark, sf_dir):
    """r13 sweep: the positional diff's global positions are computed via
    the range-partitioned two-pass prefix sum — no single-partition
    Exchange; the misalignment SEMANTICS stay (parity bug kept), the
    single-task sort does not."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_recon_positional")
    assert "SinglePartition" not in plan
    assert "_pid" in plan and "BroadcastHashJoin" in plan


def test_categorical_drift_topk_is_take_ordered(spark, sf_dir):
    """r13 sweep: the reference-anchor top-k categories must come from a
    distributed TakeOrdered (orderBy+limit), not a row_number over an
    unpartitioned window — a high-cardinality column would push every
    distinct category through one task."""
    qs = all_queries()
    plan = _plan_of(qs, spark, sf_dir, "q_drift_categorical")
    # the anchor-set selection is the distributed top-k...
    assert "TakeOrderedAndProject" in plan
    # ...and the only windows left are the share computations over the
    # ALREADY-REDUCED <= max_categories-row grid (bounded by design and
    # documented at the Window.partitionBy() site) — the plan must never
    # rank the raw per-category aggregate (arbitrary cardinality) through
    # a window; TakeOrdered replaced exactly that node.
    # (formatted explain prints each node twice: tree + detail, so two
    # physical Window nodes == 4 string occurrences)
    assert plan.count("Window") <= 4
