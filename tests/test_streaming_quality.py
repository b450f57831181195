"""Continuous data-quality verification (streaming/quality.py::
constraint_stream): streamed counters equal a whole-corpus batch run at
every commit, certificates re-derive exactly, at-least-once replays never
double-count, and non-additive kinds are rejected before the stream starts.
"""

from __future__ import annotations

import json

import pytest

from postgres_cdc_reconciliation_spark.operators.quality import (
    check_constraints,
    constraint_counters,
)
from postgres_cdc_reconciliation_spark.streaming.quality import (
    constraint_stream,
    current_certificate,
    current_counters,
)

SUITE = [
    {"kind": "not_null", "col": "email"},
    {"kind": "between", "col": "age", "lo": 0, "hi": 120},
    {"kind": "in_set", "col": "status", "values": ["active", "inactive"]},
    {"kind": "matches", "col": "email", "pattern": "@x\\.com$"},
    {"kind": "min_rows", "n": 5},
]

B0 = [
    {"email": "a@x.com", "age": 30, "status": "active"},
    {"email": None, "age": 200, "status": "weird"},
    {"email": "b@x.com", "age": 40, "status": "inactive"},
]
B1 = [
    {"email": "c@x.com", "age": 22, "status": "active"},
    {"email": "d@y.org", "age": -5, "status": "active"},
    {"email": "e@x.com", "age": 61, "status": "active"},
]


def _write_batches(src, batches):
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def _run(spark, tmp_path, batches, ckpt="ckpt"):
    src = tmp_path / "in"
    if not src.exists():
        _write_batches(src, batches)
    events = (
        spark.readStream.schema("email string, age long, status string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        constraint_stream(
            events, str(tmp_path / "dq"), str(tmp_path / ckpt), SUITE
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _whole(spark, rows):
    return spark.createDataFrame(
        [(r["email"], r["age"], r["status"]) for r in rows],
        "email string, age long, status string",
    )


def test_streamed_equals_whole_corpus(spark, tmp_path):
    _run(spark, tmp_path, [B0, B1])
    path = str(tmp_path / "dq")
    got = sorted(map(tuple, current_counters(spark, path).collect()))
    expect = sorted(
        map(
            tuple,
            constraint_counters(_whole(spark, B0 + B1), SUITE).collect(),
        )
    )
    assert got == expect
    # the derived certificate equals a batch check_constraints run
    cert = sorted(map(tuple, current_certificate(spark, path).collect()))
    batch_cert = sorted(
        map(tuple, check_constraints(_whole(spark, B0 + B1), SUITE).collect())
    )
    assert cert == batch_cert
    # spot values: 5/6 emails present, 1 age out of band, 2 bad rows
    d = {
        (r["constraint"], r["column"]): r
        for r in current_certificate(spark, path).collect()
    }
    assert d[("not_null", "email")]["metric"] == 5 / 6
    assert d[("between", "age")]["metric"] == 4 / 6
    assert d[("min_rows", "*")]["metric"] == 6.0
    assert d[("min_rows", "*")]["passed"] is True


def test_replay_never_double_counts(spark, tmp_path):
    _run(spark, tmp_path, [B0, B1])
    path = str(tmp_path / "dq")
    before = sorted(map(tuple, current_counters(spark, path).collect()))
    # fresh checkpoint re-delivers every batch with ids <= high-water
    _run(spark, tmp_path, [B0, B1], ckpt="ckpt_replay")
    after = sorted(map(tuple, current_counters(spark, path).collect()))
    assert after == before


def test_non_additive_kind_rejected_up_front(spark, tmp_path):
    src = tmp_path / "in_reject"
    _write_batches(src, [[{"email": "a@x.com"}]])
    events = spark.readStream.schema("email string").json(str(src))
    with pytest.raises(ValueError, match="not additive"):
        constraint_stream(
            events,
            str(tmp_path / "dq2"),
            str(tmp_path / "ck2"),
            [{"kind": "unique", "col": "email"}],
        )
    with pytest.raises(ValueError, match="unknown constraint kind"):
        constraint_stream(
            events,
            str(tmp_path / "dq3"),
            str(tmp_path / "ck3"),
            [{"kind": "nope", "col": "email"}],
        )
    with pytest.raises(ValueError, match="empty constraint suite"):
        constraint_stream(
            events, str(tmp_path / "dq4"), str(tmp_path / "ck4"), []
        )


def test_empty_batch_is_a_noop_commit(spark, tmp_path):
    """An all-NULL-failing batch still merges (counters additive with
    zeros); before any commit the readers return None."""
    assert current_counters(spark, str(tmp_path / "never")) is None
    assert current_certificate(spark, str(tmp_path / "never")) is None


class TestDriftStream:
    REF = [10.0 * i for i in range(1, 11)]  # lo=10, hi=100
    B0 = [12.0, 33.0, 95.0]
    B1 = [500.0, 41.0, -3.0, 77.0]  # out-of-range values clamp to edges

    def _rows(self, vals):
        return [{"x": v} for v in vals]

    def _run(self, spark, tmp_path, batches, ckpt="ckpt"):
        src = tmp_path / "in"
        if not src.exists():
            _write_batches(src, [self._rows(b) for b in batches])
        ref = spark.createDataFrame([(v,) for v in self.REF], "x double")
        events = (
            spark.readStream.schema("x double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            drift_stream,
        )

        q = (
            drift_stream(
                events, ref, "x", str(tmp_path / "drift"),
                str(tmp_path / ckpt), n_buckets=5,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_streamed_equals_batch_psi(self, spark, tmp_path):
        from postgres_cdc_reconciliation_spark.operators.quality import (
            psi_report,
        )
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            current_drift,
        )

        self._run(spark, tmp_path, [self.B0, self.B1])
        got = sorted(
            map(tuple, current_drift(spark, str(tmp_path / "drift")).collect())
        )
        ref = spark.createDataFrame([(v,) for v in self.REF], "x double")
        cur = spark.createDataFrame(
            [(v,) for v in self.B0 + self.B1], "x double"
        )
        expect = sorted(map(tuple, psi_report(cur, ref, "x", 5).collect()))
        assert got == expect
        # the -3.0 and 500.0 readings clamped into edge buckets
        by_bucket = {
            r["bucket"]: r
            for r in current_drift(spark, str(tmp_path / "drift")).collect()
        }
        assert by_bucket[0]["cur_share"] > 0 and by_bucket[4]["cur_share"] > 0

    def test_replay_and_restart_anchor(self, spark, tmp_path):
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            current_drift,
            drift_stream,
        )

        self._run(spark, tmp_path, [self.B0, self.B1])
        path = str(tmp_path / "drift")
        before = sorted(map(tuple, current_drift(spark, path).collect()))
        # fresh checkpoint (replay) with a DIFFERENT ref argument: the
        # frozen anchor must win, counts must not double
        other_ref = spark.createDataFrame([(0.5,), (2.0,)], "x double")
        events = (
            spark.readStream.schema("x double")
            .option("maxFilesPerTrigger", 1)
            .json(str(tmp_path / "in"))
        )
        q = (
            drift_stream(
                events, other_ref, "x", path,
                str(tmp_path / "ckpt_replay"), n_buckets=5,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        after = sorted(map(tuple, current_drift(spark, path).collect()))
        assert after == before
        # mismatched n_buckets on restart fails loud
        with pytest.raises(ValueError, match="n_buckets"):
            drift_stream(
                events, other_ref, "x", path, str(tmp_path / "ck3"),
                n_buckets=7,
            )

    def test_first_build_race_one_anchor_wins(self, spark, tmp_path, monkeypatch):
        """r13: the _ref anchor init is arbitrated by a create-exclusive
        token marker — under the old check-then-write init, two
        concurrent first-builds overwrote each other's _ref dirs
        last-writer-wins while each kept bucketing against its own
        in-memory anchor. Simulated: a competing stream commits its
        anchor between this build's staging and its marker create; the
        loser must clean its orphans and ADOPT the winner's anchor."""
        from postgres_cdc_reconciliation_spark.operators import quality as q_ops
        from postgres_cdc_reconciliation_spark.streaming import quality as sq
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            _ref_paths,
            current_drift,
        )

        path = str(tmp_path / "drift")
        src = tmp_path / "in"
        _write_batches(src, [self._rows(self.B0)])
        ref = spark.createDataFrame([(v,) for v in self.REF], "x double")
        events = (
            spark.readStream.schema("x double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

        real_stats = q_ops.psi_ref_stats
        fired = {"n": 0}

        def stats_then_interleave(ref_df, col):
            out = real_stats(ref_df, col)
            if fired["n"] == 0:
                fired["n"] += 1
                # the COMPETING stream wins the anchor with a different
                # reference (interchangeable grid, same n_buckets)
                winner_ref = spark.createDataFrame(
                    [(float(v),) for v in range(1, 8)], "x double"
                )
                sq.drift_stream(
                    events, winner_ref, "x", path,
                    str(tmp_path / "ck_winner"), n_buckets=5,
                )
            return out

        monkeypatch.setattr(q_ops, "psi_ref_stats", stats_then_interleave)
        q = sq.drift_stream(
            events, ref, "x", path, str(tmp_path / "ck_loser"), n_buckets=5
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)
        assert fired["n"] == 1  # the race actually happened
        # exactly ONE committed anchor, and it is the winner's (lo=1 hi=7)
        meta_path, counts_path = _ref_paths(spark, path)
        meta = spark.read.parquet(meta_path).first()
        assert (meta["_lo"], meta["_hi"]) == (1.0, 7.0)
        # the loser's orphan staging dirs are gone: only the winner's
        # token-suffixed dirs remain under _ref
        names = sorted(
            p.name for p in (tmp_path / "drift" / "_ref").iterdir()
            if not p.name.startswith(".")
        )
        assert len([n for n in names if n.startswith("counts-")]) == 1
        assert len([n for n in names if n.startswith("meta-")]) == 1
        # and the loser's batches were bucketed against the FROZEN anchor
        assert current_drift(spark, path) is not None

    def test_legacy_plain_ref_layout_still_resolves(self, spark, tmp_path):
        """Pre-token state dirs (plain _ref/counts + _ref/meta, empty
        _COMMIT marker) keep working: restart adopts the frozen anchor
        and current_drift reads the plain paths."""
        import shutil

        from postgres_cdc_reconciliation_spark.streaming.quality import (
            current_drift,
        )

        self._run(spark, tmp_path, [self.B0])
        path = tmp_path / "drift"
        before = sorted(map(tuple, current_drift(spark, str(path)).collect()))
        # rewrite the state into the LEGACY layout: de-tokenize the dirs
        ref_dir = path / "_ref"
        token_counts = next(p for p in ref_dir.iterdir()
                            if p.name.startswith("counts-"))
        token_meta = next(p for p in ref_dir.iterdir()
                          if p.name.startswith("meta-"))
        shutil.move(str(token_counts), str(ref_dir / "counts"))
        shutil.move(str(token_meta), str(ref_dir / "meta"))
        (ref_dir / "_COMMIT").write_text("")  # legacy empty marker
        crc = ref_dir / "._COMMIT.crc"
        if crc.exists():
            crc.unlink()
        assert sorted(
            map(tuple, current_drift(spark, str(path)).collect())
        ) == before


class TestQuarantineStream:
    B0 = [
        {"email": "a@x.com", "age": 30},
        {"email": None, "age": 200},
    ]
    B1 = [
        {"email": "b@x.com", "age": 41},
        {"email": "c@x.com", "age": -4},
    ]
    SUITE = [
        {"kind": "not_null", "col": "email"},
        {"kind": "between", "col": "age", "lo": 0, "hi": 120},
    ]

    def _run(self, spark, tmp_path, ckpt="ckpt"):
        src = tmp_path / "in"
        if not src.exists():
            _write_batches(src, [self.B0, self.B1])
        events = (
            spark.readStream.schema("email string, age long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            quarantine_stream,
        )

        q = (
            quarantine_stream(
                events, self.SUITE, str(tmp_path / "ok"),
                str(tmp_path / "bad"), str(tmp_path / ckpt),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_routing_and_labels(self, spark, tmp_path):
        self._run(spark, tmp_path)
        ok = spark.read.parquet(str(tmp_path / "ok"))
        bad = spark.read.parquet(str(tmp_path / "bad"))
        assert {r["email"] for r in ok.collect()} == {"a@x.com", "b@x.com"}
        assert sorted(ok.columns) == ["_batch_id", "age", "email"]
        got = {
            (r["email"], r["violations"]) for r in bad.collect()
        }
        assert got == {
            (None, "not_null:email,between:age"),
            ("c@x.com", "between:age"),
        }

    def test_replay_does_not_duplicate(self, spark, tmp_path):
        self._run(spark, tmp_path)
        ok_before = spark.read.parquet(str(tmp_path / "ok")).count()
        bad_before = spark.read.parquet(str(tmp_path / "bad")).count()
        self._run(spark, tmp_path, ckpt="ckpt_replay")  # full re-delivery
        assert spark.read.parquet(str(tmp_path / "ok")).count() == ok_before
        assert spark.read.parquet(str(tmp_path / "bad")).count() == bad_before

    def test_non_row_local_rejected(self, spark, tmp_path):
        src = tmp_path / "in_rl"
        _write_batches(src, [[{"email": "a@x.com"}]])
        events = spark.readStream.schema("email string").json(str(src))
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            quarantine_stream,
        )

        with pytest.raises(ValueError, match="not row-local"):
            quarantine_stream(
                events, [{"kind": "min_rows", "n": 1}],
                str(tmp_path / "o2"), str(tmp_path / "b2"),
                str(tmp_path / "c2"),
            )


class TestSuiteFingerprint:
    """Restarting constraint_stream with a modified/reordered suite must
    fail loudly at build time: counters are positional by cid, so a silent
    merge would add one constraint's counts into another (ADVICE r11)."""

    def test_same_suite_restarts_fine(self, spark, tmp_path):
        _run(spark, tmp_path, [B0, B1])
        before = sorted(map(tuple, current_counters(
            spark, str(tmp_path / "dq")).collect()))
        # identical suite, including an equivalent set-typed values param —
        # the fingerprint must not depend on set iteration order
        suite2 = [dict(c) for c in SUITE]
        suite2[2] = {"kind": "in_set", "col": "status",
                     "values": {"inactive", "active"}}
        src = tmp_path / "in"
        events = (
            spark.readStream.schema("email string, age long, status string")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        suite3 = [dict(c) for c in SUITE]
        suite3[2] = {"kind": "in_set", "col": "status",
                     "values": ["active", "inactive"]}
        q = (
            constraint_stream(events, str(tmp_path / "dq"),
                              str(tmp_path / "ck_fp"), suite3)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        after = sorted(map(tuple, current_counters(
            spark, str(tmp_path / "dq")).collect()))
        assert after == before  # replay-guarded, and the build was allowed

    def test_reordered_suite_rejected(self, spark, tmp_path):
        _run(spark, tmp_path, [B0])
        src = tmp_path / "in"
        events = (
            spark.readStream.schema("email string, age long, status string")
            .json(str(src))
        )
        reordered = [SUITE[1], SUITE[0]] + SUITE[2:]
        with pytest.raises(ValueError, match="different\\s+suite"):
            constraint_stream(events, str(tmp_path / "dq"),
                              str(tmp_path / "ck_r"), reordered)

    def test_modified_param_rejected(self, spark, tmp_path):
        _run(spark, tmp_path, [B0])
        src = tmp_path / "in"
        events = (
            spark.readStream.schema("email string, age long, status string")
            .json(str(src))
        )
        changed = [dict(c) for c in SUITE]
        changed[1] = {"kind": "between", "col": "age", "lo": 0, "hi": 99}
        with pytest.raises(ValueError, match="different\\s+suite"):
            constraint_stream(events, str(tmp_path / "dq"),
                              str(tmp_path / "ck_m"), changed)

    def test_dropped_constraint_rejected(self, spark, tmp_path):
        _run(spark, tmp_path, [B0])
        src = tmp_path / "in"
        events = (
            spark.readStream.schema("email string, age long, status string")
            .json(str(src))
        )
        with pytest.raises(ValueError, match="different\\s+suite"):
            constraint_stream(events, str(tmp_path / "dq"),
                              str(tmp_path / "ck_d"), SUITE[:-1])

    def test_first_stamp_is_create_exclusive(self, spark, tmp_path):
        """The fingerprint write is arbitrated by create-exclusive, not
        check-then-write: once ANY suite is stamped, a different suite
        loses (ADVICE r12's two-concurrent-first-builds race — simulated
        here by stamping first, then presenting the loser's build, which
        under the old exists()-check-then-overwrite would have won)."""
        from postgres_cdc_reconciliation_spark.streaming.quality import (
            _check_or_stamp_suite,
            _suite_fingerprint,
        )

        path = str(tmp_path / "dqx")
        _check_or_stamp_suite(spark, path, _suite_fingerprint(SUITE))
        src = tmp_path / "in"
        _write_batches(src, [[{"email": "a@x.com", "age": 1,
                               "status": "active"}]])
        events = (
            spark.readStream.schema("email string, age long, status string")
            .json(str(src))
        )
        changed = [dict(c) for c in SUITE]
        changed[1] = {"kind": "between", "col": "age", "lo": 0, "hi": 99}
        with pytest.raises(ValueError, match="different\\s+suite"):
            constraint_stream(events, path, str(tmp_path / "ck_x"), changed)
        # idempotent re-stamp of the SAME suite is fine (the lost-race
        # re-read path compares equal and returns)
        _check_or_stamp_suite(spark, path, _suite_fingerprint(SUITE))

    def test_legacy_unstamped_state_needs_explicit_optin(self, spark, tmp_path):
        """A state dir with committed counters but NO fingerprint predates
        the guard; it must NOT be silently retro-stamped with whatever
        suite the next build presents (ADVICE r12) — the operator opts in
        via stamp_suite."""
        import shutil

        from postgres_cdc_reconciliation_spark.streaming.quality import (
            stamp_suite,
        )

        _run(spark, tmp_path, [B0])
        dq = tmp_path / "dq"
        # erase every fingerprint form -> a pre-guard legacy state dir
        for legacy in (dq / "_suite", dq / "_suite.json"):
            if legacy.is_dir():
                shutil.rmtree(legacy)
            elif legacy.exists():
                legacy.unlink()
        src = tmp_path / "in"
        events = (
            spark.readStream.schema("email string, age long, status string")
            .json(str(src))
        )
        with pytest.raises(ValueError, match="no\\s+suite\\s+fingerprint"):
            constraint_stream(events, str(dq), str(tmp_path / "ck_l"), SUITE)
        stamp_suite(spark, str(dq), SUITE)  # explicit operator opt-in
        q = (
            constraint_stream(events, str(dq), str(tmp_path / "ck_l2"), SUITE)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        assert current_counters(spark, str(dq)) is not None


def test_quarantine_leaves_session_conf_untouched(spark, tmp_path):
    """The sinks use per-write partitionOverwriteMode options — the
    session-global conf must never be mutated (a concurrent static-mode
    writer in the same session could otherwise wipe sibling partitions
    mid-window; ADVICE r11)."""
    from postgres_cdc_reconciliation_spark.streaming.quality import (
        quarantine_stream,
    )

    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "static")
    try:
        src = tmp_path / "in_conf"
        _write_batches(src, [B0, B1])
        events = (
            spark.readStream.schema("email string, age long, status string")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        suite = [{"kind": "not_null", "col": "email"}]
        for ckpt in ("ck1", "ck2"):  # second run = full re-delivery
            q = quarantine_stream(
                events, suite, str(tmp_path / "okc"), str(tmp_path / "badc"),
                str(tmp_path / ckpt),
            ).trigger(availableNow=True).start()
            q.awaitTermination(120)
            assert spark.conf.get(key) == "static"
        # per-write dynamic overwrite: the replay replaced its own
        # partitions instead of duplicating (B0+B1 = 5 valid + 1 null)
        assert spark.read.parquet(str(tmp_path / "okc")).count() == 5
        assert spark.read.parquet(str(tmp_path / "badc")).count() == 1
    finally:
        spark.conf.set(key, prev)
