"""Property-based invariants (hypothesis): LSN codec bijectivity and CDC
apply determinism/idempotency under arbitrary event interleavings."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.functions.lsn import long_to_lsn, lsn_to_long
from postgres_cdc_reconciliation_spark.operators.apply import apply_batch, latest_per_key

LSN_MAX = 2**63 - 1


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=LSN_MAX), min_size=1, max_size=50))
def test_lsn_roundtrip_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v long")
    got = [
        r["back"]
        for r in df.select(lsn_to_long(long_to_lsn("v")).alias("back")).collect()
    ]
    assert got == values


# one event: (key 0-4, op index 0=c/1=u/2=d, amount cents)
EVENT = st.tuples(
    st.integers(0, 4), st.integers(0, 2), st.integers(100, 99999)
)


def _events_df(spark, seq):
    rows = []
    for lsn, (key, opi, cents) in enumerate(seq, start=1):
        op = "cud"[opi]
        rows.append(
            (key, None if op == "d" else f"{cents / 100:.2f}", op, f"0/{lsn:X}")
        )
    df = spark.createDataFrame(
        rows, "order_id long, amount string, op string, source_lsn string"
    )
    return df.withColumn("amount", F.col("amount").cast("decimal(10,2)"))


def _expected_state(seq):
    state = {}
    for key, opi, cents in seq:  # in LSN order
        if opi == 2:
            state.pop(key, None)
        else:
            state[key] = round(cents / 100, 2)
    return state


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=30), st.randoms())
def test_apply_matches_sequential_semantics_any_order(spark, seq, rnd):
    """max-LSN apply == replaying events in LSN order, regardless of the
    arrival order of rows in the batch."""
    df = _events_df(spark, seq)
    shuffled = df.orderBy(F.xxhash64("source_lsn", F.lit(rnd.randint(0, 9))))
    target0 = df.limit(0).drop("op", "source_lsn")
    t1 = apply_batch(target0, shuffled, ["order_id"], drop_cols=("op", "source_lsn"))
    got = {r["order_id"]: float(r["amount"]) for r in t1.collect()}
    assert got == _expected_state(seq)
    # idempotency: re-apply the same batch
    t2 = apply_batch(t1, df, ["order_id"], drop_cols=("op", "source_lsn"))
    assert {r["order_id"]: float(r["amount"]) for r in t2.collect()} == got


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=2, max_size=30))
def test_apply_split_batches_equal_one_batch(spark, seq):
    """applying [first half] then [second half] == applying all at once
    (micro-batch boundaries don't change the final state)."""
    mid = len(seq) // 2
    df_all = _events_df(spark, seq)
    target0 = df_all.limit(0).drop("op", "source_lsn")
    one = apply_batch(target0, df_all, ["order_id"], drop_cols=("op", "source_lsn"))
    df1 = _events_df(spark, seq).filter(lsn_to_long("source_lsn") <= mid)
    df2 = _events_df(spark, seq).filter(lsn_to_long("source_lsn") > mid)
    stepped = apply_batch(
        apply_batch(target0, df1, ["order_id"], drop_cols=("op", "source_lsn")),
        df2,
        ["order_id"],
        drop_cols=("op", "source_lsn"),
    )
    a = {r["order_id"]: float(r["amount"]) for r in one.collect()}
    b = {r["order_id"]: float(r["amount"]) for r in stepped.collect()}
    assert a == b


def test_latest_per_key_picks_global_max(spark):
    seq = [(0, 0, 100), (0, 1, 200), (0, 1, 300), (1, 0, 400)]
    latest = latest_per_key(_events_df(spark, seq), ["order_id"], lsn_col="source_lsn")
    got = {r["order_id"]: float(r["amount"]) for r in latest.collect()}
    assert got == {0: 3.00, 1: 4.00}


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.lists(EVENT, min_size=1, max_size=8), min_size=1, max_size=4
    )
)
def test_manifest_commit_matches_dict_replay(spark, tmp_path_factory, batches):
    """Any sequence of upsert/delete micro-batches committed through the
    manifest protocol must end at exactly the state a per-key dict replay
    produces — across commits, bucket drops, and version chains."""
    from postgres_cdc_reconciliation_spark.operators.apply import bucket_expr
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
        read_buckets,
        read_snapshot,
    )

    root = str(tmp_path_factory.mktemp("mt"))
    n_buckets = 4
    expected: dict[int, int] = {}
    lsn = 0
    for batch in batches:
        rows = []
        for key, op_i, amount in batch:
            lsn += 1
            rows.append((key, "d" if op_i == 2 else "u", amount, lsn))
        df = spark.createDataFrame(
            rows, "id long, op string, amount long, lsn long"
        )
        # dict replay of this batch: last-writer-wins per key by lsn
        last = {}
        for key, op, amount, l in rows:
            last[key] = (op, amount)
        touched_buckets = [
            r[0]
            for r in df.select(bucket_expr(["id"], n_buckets))
            .distinct()
            .collect()
        ]
        # merged content: previous rows of touched buckets + this delta
        prev = read_buckets(spark, root, touched_buckets)
        merged_rows = {}
        if prev is not None:
            for r in prev.collect():
                merged_rows[r["id"]] = r["amount"]
        for key, (op, amount) in last.items():
            if op == "d":
                merged_rows.pop(key, None)
            else:
                merged_rows[key] = amount
        merged = spark.createDataFrame(
            [(k, v) for k, v in merged_rows.items()] or [],
            "id long, amount long",
        )
        commit_delta(merged, root, ["id"], touched_buckets, n_buckets)
        for key, (op, amount) in last.items():
            if op == "d":
                expected.pop(key, None)
            else:
                expected[key] = amount
    try:
        got = {
            r["id"]: r["amount"] for r in read_snapshot(spark, root).collect()
        }
    except FileNotFoundError:
        got = {}
    assert got == expected


def _scd2_model(seq):
    """Brute-force SCD2 model: per key, walk events in seq order; non-d
    opens a version [(val, from, to, current)] closed by the next event."""
    by_key: dict[int, list] = {}
    for lsn, (key, opi, cents) in enumerate(seq, start=1):
        evs = by_key.setdefault(key, [])
        evs.append((lsn, "cud"[opi], cents))
    out = []
    for key, evs in by_key.items():
        version = 0
        for i, (lsn, op, cents) in enumerate(evs):
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            if op == "d":
                continue
            version += 1
            out.append((key, float(cents), version, lsn, nxt, nxt is None))
    return sorted(out)


def _compact_model(seq):
    """Brute-force compaction model applying the four first/last rules."""
    by_key: dict[int, list] = {}
    for lsn, (key, opi, cents) in enumerate(seq, start=1):
        by_key.setdefault(key, []).append((lsn, "cud"[opi], cents))
    out = {}
    for key, evs in by_key.items():
        (f_lsn, f_op, _), (l_lsn, l_op, l_cents) = evs[0], evs[-1]
        if f_op == "c" and l_op == "d":
            continue
        net = "d" if l_op == "d" else ("c" if f_op == "c" else "u")
        val = None if net == "d" else float(l_cents)
        out[key] = (net, val, len(evs), f_lsn, l_lsn)
    return out


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=60))
def test_scd2_build_matches_model(spark, seq):
    """scd2_build == the brute-force interval model for arbitrary
    interleavings (creates/updates/deletes in any per-key pattern,
    including delete-then-recreate and update-before-create)."""
    from postgres_cdc_reconciliation_spark.operators.temporal import scd2_build

    rows = [
        (key, "cud"[opi], None if opi == 2 else float(cents), lsn)
        for lsn, (key, opi, cents) in enumerate(seq, start=1)
    ]
    df = spark.createDataFrame(rows, "id long, op string, val double, seq long")
    got = sorted(
        (r.id, r.val, r.version, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_build(df, key="id", seq="seq", attrs=["val"]).collect()
    )
    assert got == _scd2_model(seq)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(EVENT, min_size=2, max_size=60),
    st.integers(min_value=1, max_value=58),
)
def test_scd2_merge_matches_model_at_random_split(spark, seq, cut):
    """Incremental merge at an arbitrary split == the model of the full
    log (the equivalence contract under hypothesis-chosen interleavings)."""
    from postgres_cdc_reconciliation_spark.operators.temporal import (
        scd2_build,
        scd2_merge_batch,
    )

    cut = min(cut, len(seq) - 1)
    rows = [
        (key, "cud"[opi], None if opi == 2 else float(cents), lsn)
        for lsn, (key, opi, cents) in enumerate(seq, start=1)
    ]
    df = spark.createDataFrame(rows, "id long, op string, val double, seq long")
    hist = scd2_build(
        df.filter(F.col("seq") <= cut), key="id", seq="seq", attrs=["val"]
    )
    merged = scd2_merge_batch(
        hist, df.filter(F.col("seq") > cut), key="id", seq="seq", attrs=["val"]
    )
    got = sorted(
        (r.id, r.val, r.version, r.valid_from, r.valid_to, r.is_current)
        for r in merged.collect()
    )
    assert got == _scd2_model(seq)


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=60))
def test_compact_changelog_matches_model(spark, seq):
    from postgres_cdc_reconciliation_spark.operators.apply import (
        compact_changelog,
    )

    rows = [
        (key, "cud"[opi], None if opi == 2 else float(cents), lsn)
        for lsn, (key, opi, cents) in enumerate(seq, start=1)
    ]
    df = spark.createDataFrame(rows, "id long, op string, val double, seq long")
    got = {
        r.id: (r.net_op, r.val, r.n_events, r.first_seq, r.last_seq)
        for r in compact_changelog(
            df, key_cols=["id"], attr_cols=["val"], seq_col="seq"
        ).collect()
    }
    assert got == _compact_model(seq)


ROW = st.tuples(st.integers(0, 30), st.integers(0, 5),
                st.one_of(st.none(), st.text("ab|N:", max_size=4)))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(ROW, min_size=1, max_size=40, unique_by=lambda r: r[0]),
    st.lists(ROW, min_size=1, max_size=40, unique_by=lambda r: r[0]),
)
def test_fingerprint_flags_exactly_divergent_buckets_property(spark, a, b):
    """For arbitrary keyed frames (nulls + delimiter-adversarial strings):
    a bucket is flagged iff its key-slice differs between the sides."""
    from postgres_cdc_reconciliation_spark.operators.recon import (
        fingerprint_diff,
    )

    schema = "k long, x long, s string"
    n = 4
    src = spark.createDataFrame(a, schema)
    tgt = spark.createDataFrame(b, schema)
    out = fingerprint_diff(
        src, tgt, ["k"], n_buckets=n, bucket_of=lambda df: F.col("k") % n
    ).collect()
    truth_bad = set()
    sa = {r[0] % n: set() for r in a + b}
    sb = {r[0] % n: set() for r in a + b}
    for r in a:
        sa[r[0] % n].add(r)
    for r in b:
        sb[r[0] % n].add(r)
    for bucket in sa:
        if sa[bucket] != sb[bucket]:
            truth_bad.add(bucket)
    got_bad = {r.bucket for r in out if not r.bucket_match}
    assert got_bad == truth_bad


# interval: (key 0-2, start offset hours 0-72, duration hours 0-24); ids are
# positional so duplicate (key, start, end) tuples exercise multiplicity
INTERVAL = st.tuples(st.integers(0, 2), st.integers(0, 72), st.integers(0, 24))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(INTERVAL, min_size=1, max_size=12),
    st.lists(INTERVAL, min_size=1, max_size=12),
)
def test_interval_overlap_matches_theta_join_property(spark, ls, rs):
    """Chunk-binned overlap join == direct theta join for ARBITRARY
    interval sets (including duplicates and id reuse), at a chunk size
    smaller than, near, and above typical durations."""
    from collections import Counter

    from postgres_cdc_reconciliation_spark.operators.temporal import (
        interval_overlap_join,
    )

    def mk(rows, side):
        return spark.createDataFrame(
            [
                (k, f"{side}{i}", so * 3600, (so + du) * 3600)
                for i, (k, so, du) in enumerate(rows)
            ],
            "k int, iid string, s long, e long",
        ).select(
            "k", "iid",
            F.timestamp_seconds(F.col("s") + 1_767_225_600).alias("start"),
            F.timestamp_seconds(F.col("e") + 1_767_225_600).alias("end"),
        )

    left, right = mk(ls, "L"), mk(rs, "R")
    naive = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.start") <= F.col("r.end"))
            & (F.col("r.start") <= F.col("l.end")),
        )
        .select(F.col("l.iid").alias("l_id"), F.col("r.iid").alias("r_id"))
    )
    expected = Counter((r.l_id, r.r_id) for r in naive.collect())
    got = interval_overlap_join(
        left, right, on="k",
        l_id="iid", l_start="start", l_end="end",
        r_id="iid", r_start="start", r_end="end",
        chunk_seconds=7200,
    )
    assert Counter((r.l_id, r.r_id) for r in got.collect()) == expected


# manifest batches: list of (key 0-9, value, is_delete)
MBATCH = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 999), st.booleans()),
    min_size=1,
    max_size=6,
)


@settings(max_examples=4, deadline=None)
@given(st.lists(MBATCH, min_size=1, max_size=3), st.sampled_from([4, 16, 32]))
def test_compact_rebucket_preserves_snapshot_property(
    spark, tmp_path_factory, batches, new_n
):
    """For ANY commit sequence, compacting at ANY new bucket count yields
    the identical key->value snapshot, and delta commits continue under
    the new count (old count refused)."""
    import pytest

    from postgres_cdc_reconciliation_spark.operators.apply import bucket_expr
    from postgres_cdc_reconciliation_spark.operators.manifest_target import (
        commit_delta,
        compact,
        read_snapshot,
    )

    root = str(tmp_path_factory.mktemp("rebucket") / "t")
    model: dict[int, int] = {}
    n0 = 8
    for batch in batches:
        for k, v, dele in batch:
            if dele:
                model.pop(k, None)
            else:
                model[k] = v
        # merged = complete new content of the touched buckets under n0
        touched_keys = {k for k, _, _ in batch}
        tb = {
            r[0]
            for r in spark.createDataFrame(
                [(k,) for k in touched_keys], "k long"
            ).select(bucket_expr(["k"], n0)).collect()
        }
        bucket_of_key = {
            r["k"]: r["b"]
            for r in spark.createDataFrame(
                [(k,) for k in model], "k long"
            ).withColumn("b", bucket_expr(["k"], n0)).collect()
        } if model else {}
        content = [
            (k, v) for k, v in model.items() if bucket_of_key.get(k) in tb
        ]
        merged = spark.createDataFrame(content or [(None, None)], "k long, v long")
        if not content:
            merged = merged.filter("k IS NOT NULL")
        commit_delta(merged, root, ["k"], sorted(tb), n0)

    def snap():
        try:
            return {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()}
        except FileNotFoundError:
            return {}

    before = snap()
    assert before == model
    if not model:
        return  # compact requires a live snapshot
    compact(spark, root, ["k"], new_n)
    assert snap() == model

    # old count refused, new count accepted
    delta = spark.createDataFrame([(0, -1)], "k long, v long")
    db = [r[0] for r in delta.select(bucket_expr(["k"], new_n)).collect()]
    if new_n != n0:
        with pytest.raises(ValueError, match="bucket layout mismatch"):
            commit_delta(delta, root, ["k"], db, n0)
    commit_delta(delta, root, ["k"], db, new_n)
    assert snap()[0] == -1


# a column mutation: (column index 0-2, mutation kind)
#   0 = null out one row, 1 = change a value, 2 = drop a row (all columns)
PROFILE_MUT = st.tuples(st.integers(0, 2), st.integers(0, 2))


@settings(max_examples=5, deadline=None)
@given(st.integers(10, 40), st.lists(PROFILE_MUT, min_size=1, max_size=3))
def test_profile_diff_localizes_mutated_columns_property(spark, n, muts):
    """profile_diff must flag column_match=False for EVERY column whose
    values were mutated (nulls, edits) and keep untouched columns flagged
    True unless a whole-row drop changed their profile too (row drops
    change n_rows, which flags every column — asserted separately)."""
    from postgres_cdc_reconciliation_spark.operators.recon import profile_diff

    src = spark.createDataFrame(
        [(i, i * 7 % 13, f"s{i % 5}") for i in range(n)],
        "a long, b long, c string",
    )
    cols = ["a", "b", "c"]
    rows = [[i, i * 7 % 13, f"s{i % 5}"] for i in range(n)]
    dropped = False
    touched = set()
    for ci, kind in muts:
        if kind == 2:
            if len(rows) > 1:
                rows.pop(ci % len(rows))
                dropped = True
        elif rows:
            r = rows[(ci * 3) % len(rows)]
            before = r[ci]
            r[ci] = None if kind == 0 else (
                999_999 if ci < 2 else "MUTATED"
            )
            if r[ci] != before:
                touched.add(cols[ci])
    tgt = spark.createDataFrame(
        [tuple(r) for r in rows], "a long, b long, c string"
    )
    got = {r["column"]: r["column_match"] for r in profile_diff(src, tgt).collect()}
    if dropped:
        # n_rows differs -> every column row flags False
        assert all(v is False for v in got.values()), got
    else:
        for c in cols:
            if c in touched:
                assert got[c] is False, (c, got)


# --- hot-bucket cap invariants (round 7) -----------------------------------

# a corpus: list of (id, bucket, seed) — seeds drive deterministic vectors
CORPUS = st.lists(
    st.tuples(st.integers(0, 10**6), st.integers(0, 3), st.integers(0, 10**6)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=5, deadline=None)
@given(CORPUS, st.integers(2, 8), st.sampled_from([0, 2, "auto"]))
def test_cap_hot_buckets_invariants(spark, corpus, cap, split_planes):
    """For ANY corpus/cap/mode: (1) every surviving bucket <= cap; (2) the
    surviving ids are a subset of the input ids with no duplicates; (3)
    every row of a bucket that was NOT over the cap survives, key intact
    (only hot buckets may lose rows)."""
    import math as m

    from postgres_cdc_reconciliation_spark.operators.similarity import (
        cap_hot_buckets,
    )

    def vec(seed):
        return [m.sin(seed * 12.9898 + j * 78.233) * 43758.5453 % 2.0 - 1.0
                for j in range(8)]

    rows = [(i, vec(s), b) for i, b, s in corpus]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cap_hot_buckets(
        df, cap, "label", dim=8, split_planes=split_planes
    ).collect()

    sizes = {}
    for r in out:
        sizes[r["label"]] = sizes.get(r["label"], 0) + 1
    assert all(n <= cap for n in sizes.values()), sizes

    in_ids = {i for i, _, _ in corpus}
    out_ids = [r["vec_id"] for r in out]
    assert len(out_ids) == len(set(out_ids))
    assert set(out_ids) <= in_ids

    from collections import Counter

    bucket_counts = Counter(b for _, b, _ in corpus)
    cold_ids = {i for i, b, _ in corpus if bucket_counts[b] <= cap}
    assert cold_ids <= set(out_ids), "a row from a never-hot bucket was dropped"
    # and cold rows keep their original (stringified) key
    keymap = {i: str(b) for i, b, _ in corpus}
    for r in out:
        if r["vec_id"] in cold_ids:
            assert r["label"] == keymap[r["vec_id"]]


# random docs over a tiny vocabulary (high collision/overlap pressure);
# texts short enough that the per-example Spark round-trip stays cheap
_DOC_TEXT = st.lists(
    st.sampled_from([f"t{i}" for i in range(12)]), min_size=0, max_size=12
).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(_DOC_TEXT, min_size=2, max_size=12),
    st.sampled_from([0.25, 0.5, 0.75, 1.0]),
    st.sampled_from([None, 3]),
)
def test_ngram_prefix_join_equals_index_join_property(spark, texts, t, cap):
    """The prefix-filtered similarity join is LOSSLESS: for arbitrary
    corpora, thresholds, and df-caps it emits exactly the pairs (and
    bit-identical Jaccard) of the plain inverted-index plan."""
    from postgres_cdc_reconciliation_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sh = shingles(docs, k=2).localCheckpoint()  # evaluated once, two plans

    def got(method):
        return sorted(
            (r["doc_a"], r["doc_b"], r["common"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                sh, threshold=t, max_doc_freq=cap, method=method
            ).collect()
        )

    assert got("prefix") == got("index")


VEC = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0,
                      allow_nan=False, allow_infinity=False, width=32),
            min_size=0, max_size=6,
        ),
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(train=VEC, ev=VEC, thr=st.floats(min_value=-0.5, max_value=0.99))
def test_contamination_scorers_agree_property(spark, train, ev, thr):
    """The gemm scorer and the in-plan fold are the SAME function on any
    corpus shape hypothesis can invent — ragged lengths, empty and NULL
    vectors, zero norms, any threshold."""
    from postgres_cdc_reconciliation_spark.operators.curation import (
        semantic_contamination_report,
    )

    def df(rows):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(rows)],
            "vec_id long, embedding array<double>",
        )

    fold = sorted(map(tuple, semantic_contamination_report(
        df(train), df(ev), thr, scorer="fold").collect()))
    mat = sorted(map(tuple, semantic_contamination_report(
        df(train), df(ev), thr, scorer="matrix").collect()))
    assert len(mat) == len(train)
    for (fid, fn_, fmax, fc), (mid, mn, mmax, mc) in zip(fold, mat):
        assert (fid, fn_, fc) == (mid, mn, mc)
        if fmax is None or mmax is None:
            assert fmax == mmax
        else:
            assert abs(fmax - mmax) < 1e-9
