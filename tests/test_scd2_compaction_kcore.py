"""Round-5 operators: SCD2 history build, changelog compaction, k-core.

Hand-computed micro-fixtures so every semantic branch is pinned
independently of the driver's DuckDB oracle (which checks the same ops at
sf0.01 via q_scd2_dim / q_changelog_compaction / q_kcore).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_cdc_reconciliation_spark.operators.apply import compact_changelog
from postgres_cdc_reconciliation_spark.operators.graph import kcore_peel_rounds
from postgres_cdc_reconciliation_spark.operators.temporal import scd2_build


def _changelog(spark):
    # key 1: c,u,u           -> 3 versions, last current
    # key 2: c,d             -> 1 closed version, no current row
    # key 3: u,u (mid-stream) -> 2 versions, last current
    # key 4: u,d (mid-stream) -> 1 closed version, no current row
    rows = [
        (1, "c", 10.0, 1),
        (1, "u", 11.0, 2),
        (1, "u", 12.0, 5),
        (2, "c", 20.0, 3),
        (2, "d", None, 4),
        (3, "u", 30.0, 6),
        (3, "u", 31.0, 9),
        (4, "u", 40.0, 7),
        (4, "d", None, 8),
    ]
    return spark.createDataFrame(rows, "id int, op string, val double, seq long")


def test_scd2_versions_intervals_and_current(spark):
    out = scd2_build(_changelog(spark), key="id", seq="seq", attrs=["val"])
    got = {
        (r.id, r.version): (r.val, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, 1): (10.0, 1, 2, False),
        (1, 2): (11.0, 2, 5, False),
        (1, 3): (12.0, 5, None, True),
        (2, 1): (20.0, 3, 4, False),  # closed by the delete, no current
        (3, 1): (30.0, 6, 9, False),
        (3, 2): (31.0, 9, None, True),
        (4, 1): (40.0, 7, 8, False),
    }
    # delete events never materialize a version
    assert out.count() == 7
    # intervals tile: every non-final version's valid_to is the next
    # version's valid_from (the delete-closed ones end at the delete seq)
    cur_per_key = {r.id for r in out.filter("is_current").collect()}
    assert cur_per_key == {1, 3}


def test_compact_changelog_four_rule_branches(spark):
    # key 1: c..u   -> net c with LAST value
    # key 2: c..d   -> dropped (born and died inside the window)
    # key 3: u,u    -> net u with last value
    # key 4: u,d    -> net d tombstone, attrs nulled
    out = compact_changelog(
        _changelog(spark), key_cols=["id"], attr_cols=["val"], seq_col="seq"
    )
    got = {
        r.id: (r.net_op, r.val, r.n_events, r.first_seq, r.last_seq)
        for r in out.collect()
    }
    assert got == {
        1: ("c", 12.0, 3, 1, 5),
        3: ("u", 31.0, 2, 6, 9),
        4: ("d", None, 2, 7, 8),
    }
    assert 2 not in got


def test_compact_changelog_replay_equivalence(spark):
    """Replaying the compacted log onto the window-start state gives the
    same final state as replaying the full log (the compaction contract)."""
    log = _changelog(spark)
    compacted = compact_changelog(
        log, key_cols=["id"], attr_cols=["val"], seq_col="seq"
    )

    def replay(events):  # last-op-wins apply onto empty-start state
        last = events.groupBy("id").agg(
            F.max_by(F.struct("op", "val"), F.col("seq")).alias("e")
        )
        return {
            r.id: r.e.val
            for r in last.collect()
            if r.e.op != "d"
        }

    full_state = replay(log)
    compact_state = replay(
        compacted.select(
            "id",
            F.col("net_op").alias("op"),
            "val",
            F.col("last_seq").alias("seq"),
        )
    )
    assert full_state == compact_state == {1: 12.0, 3: 31.0}


def test_kcore_peels_tail_keeps_clique(spark):
    # K4 on {1,2,3,4} (each degree 3) + path tail 4-5-6 (degrees 1-2).
    # 3-core = the K4; the tail peels over two rounds (6 first, then 5).
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    e = spark.createDataFrame(edges, "u int, v int")
    out = {r.round: (r.n_vertices, r.n_edges) for r in
           kcore_peel_rounds(e, k=3, rounds=4).collect()}
    # round 1: 6 (deg 1) and 5 (deg 2) both fail the >=3 test in the same
    # sweep; survivors {1,2,3,4} keep exactly the 6 clique edges
    assert out[1] == (4, 6)
    # fixpoint from round 1 on: later rounds are identity
    assert out[2] == out[3] == out[4] == (4, 6)


def test_kcore_whole_graph_peels_to_empty(spark):
    # a cycle has uniform degree 2: the 3-core is empty after one round
    edges = [(1, 2), (2, 3), (3, 1)]
    e = spark.createDataFrame(edges, "u int, v int")
    out = {r.round: (r.n_vertices, r.n_edges) for r in
           kcore_peel_rounds(e, k=3, rounds=2).collect()}
    assert out == {1: (0, 0), 2: (0, 0)}


def _norm(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_scd2_merge_equals_full_build_at_every_split(spark):
    """scd2_merge_batch(scd2_build(log<=t), log>t) == scd2_build(log) for
    EVERY global seq split point of the micro fixture (the incremental-
    maintenance contract)."""
    from postgres_cdc_reconciliation_spark.operators.temporal import (
        scd2_merge_batch,
    )

    log = _changelog(spark).cache()
    full = _norm(scd2_build(log, key="id", seq="seq", attrs=["val"]))
    seqs = sorted(r.seq for r in log.select("seq").collect())
    for t in seqs[:-1]:  # split after each event (both sides non-empty)
        hist = scd2_build(
            log.filter(F.col("seq") <= t), key="id", seq="seq", attrs=["val"]
        )
        merged = scd2_merge_batch(
            hist, log.filter(F.col("seq") > t), key="id", seq="seq",
            attrs=["val"],
        )
        assert _norm(merged) == full, f"split at seq<={t} diverged"


def test_scd2_merge_replay_is_noop(spark):
    """Re-delivering an already-applied batch must not change the history
    (the per-key seq guard): merge(merge(h, b), b) == merge(h, b)."""
    from postgres_cdc_reconciliation_spark.operators.temporal import (
        scd2_merge_batch,
    )

    log = _changelog(spark).cache()
    hist = scd2_build(
        log.filter(F.col("seq") <= 4), key="id", seq="seq", attrs=["val"]
    )
    batch = log.filter(F.col("seq") > 4)
    once = scd2_merge_batch(hist, batch, key="id", seq="seq", attrs=["val"])
    twice = scd2_merge_batch(
        once.localCheckpoint(), batch, key="id", seq="seq", attrs=["val"]
    )
    assert _norm(twice) == _norm(once)


def test_scd2_merge_on_cdc_fixture_quantile_splits(spark, sf_dir):
    """Same contract on the real CDC fixture (sf0.001): three batches cut
    at global lsn quantiles — every key's run is split mid-history."""
    from postgres_cdc_reconciliation_spark import fixtures as fx
    from postgres_cdc_reconciliation_spark.operators.temporal import (
        scd2_merge_batch,
    )

    ev = fx.cdc_events_df(spark, sf_dir).select(
        "order_id", "op", "lsn_long", "amount"
    ).cache()
    q1, q2 = [
        int(x)
        for x in ev.approxQuantile("lsn_long", [0.33, 0.66], 0.0)
    ]
    full = _norm(
        scd2_build(ev, key="order_id", seq="lsn_long", attrs=["amount"])
    )
    hist = scd2_build(
        ev.filter(F.col("lsn_long") <= q1),
        key="order_id", seq="lsn_long", attrs=["amount"],
    )
    hist = scd2_merge_batch(
        hist,
        ev.filter((F.col("lsn_long") > q1) & (F.col("lsn_long") <= q2)),
        key="order_id", seq="lsn_long", attrs=["amount"],
    ).localCheckpoint()
    hist = scd2_merge_batch(
        hist,
        ev.filter(F.col("lsn_long") > q2),
        key="order_id", seq="lsn_long", attrs=["amount"],
    )
    assert _norm(hist) == full


def test_scd2_stream_maintains_history(spark, tmp_path):
    """End-to-end streaming maintenance: three micro-batches of changelog
    files must leave the bucketed history equal to a one-shot scd2_build
    over the full log."""
    import json
    import os

    from postgres_cdc_reconciliation_spark.streaming.scd2 import (
        read_history,
        scd2_stream,
    )

    src = tmp_path / "in"
    src.mkdir()
    batches = [
        ("b1.json", [(1, "c", 10.0, 1), (2, "c", 20.0, 3), (1, "u", 11.0, 4)]),
        ("b2.json", [(2, "d", None, 5), (1, "u", 12.0, 6), (3, "u", 30.0, 7)]),
        ("b3.json", [(2, "c", 21.0, 8), (3, "d", None, 9)]),
    ]
    for i, (name, rows) in enumerate(batches):
        p = src / name
        with open(p, "w") as f:
            for id_, op, val, seq in rows:
                f.write(json.dumps(
                    {"id": id_, "op": op, "val": val, "seq": seq}) + "\n")
        os.utime(p, (1_000 + i, 1_000 + i))  # file source orders by mtime

    stream = spark.readStream.schema(
        "id bigint, op string, val double, seq long"
    ).option("maxFilesPerTrigger", 1).json(str(src))
    q = scd2_stream(
        stream,
        history_path=str(tmp_path / "hist"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        key="id", seq="seq", attrs=["val"],
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    all_rows = [r for _, rows in batches for r in rows]
    full = scd2_build(
        spark.createDataFrame(
            all_rows, "id bigint, op string, val double, seq long"
        ),
        key="id", seq="seq", attrs=["val"],
    )
    got = read_history(spark, str(tmp_path / "hist"))
    assert _norm(got) == _norm(full)
    # key 2 was deleted then re-created: versions 1 (closed) and 2 (current)
    k2 = {r.version: r.is_current for r in got.filter("id = 2").collect()}
    assert k2 == {1: False, 2: True}


def test_scd2_stream_rewrites_only_touched_buckets(spark, tmp_path):
    """O(delta) evidence: a micro-batch touching ONE key must rewrite only
    that key's _bucket dir — the other buckets' files stay byte-identical
    (same inode set, same mtimes)."""
    import glob
    import json
    import os

    from postgres_cdc_reconciliation_spark.operators.apply import bucket_expr
    from postgres_cdc_reconciliation_spark.streaming.scd2 import scd2_stream

    src = tmp_path / "in"
    src.mkdir()

    def write_batch(name, rows, mtime):
        p = src / name
        with open(p, "w") as f:
            for id_, op, val, seq in rows:
                f.write(json.dumps(
                    {"id": id_, "op": op, "val": val, "seq": seq}) + "\n")
        os.utime(p, (mtime, mtime))

    # batch 1: many keys spread across buckets
    write_batch("b1.json",
                [(i, "c", float(i), i + 1) for i in range(40)], 1_000)
    hist_path = str(tmp_path / "hist")

    def run():
        stream = spark.readStream.schema(
            "id bigint, op string, val double, seq long"
        ).option("maxFilesPerTrigger", 1).json(str(src))
        q = scd2_stream(
            stream, history_path=hist_path,
            checkpoint_dir=str(tmp_path / "ckpt"),
            key="id", seq="seq", attrs=["val"], n_buckets=8,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()
    touched_bucket = spark.createDataFrame([(7,)], "id bigint").select(
        bucket_expr(["id"], 8).alias("b")
    ).first()["b"]
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{hist_path}/_bucket=*/*.parquet")
    }
    # batch 2: ONE key updated
    write_batch("b2.json", [(7, "u", 99.0, 1_000)], 1_001)
    run()
    after_files = set(glob.glob(f"{hist_path}/_bucket=*/*.parquet"))
    unchanged = {
        f for f in before
        if f in after_files and os.path.getmtime(f) == before[f]
    }
    changed_dirs = {
        os.path.basename(os.path.dirname(f))
        for f in (set(before) | after_files) - unchanged
    }
    assert changed_dirs == {f"_bucket={touched_bucket}"}
    # and the touched key's history is correct
    hist = spark.read.parquet(hist_path)
    k7 = sorted(
        (r.version, r.val, r.is_current)
        for r in hist.filter("id = 7").collect()
    )
    assert k7 == [(1, 7.0, False), (2, 99.0, True)]


def test_kcore_empty_graph_and_bad_rounds(spark):
    import pytest

    empty = spark.createDataFrame([], "u int, v int")
    out = {r.round: (r.n_vertices, r.n_edges)
           for r in kcore_peel_rounds(empty, k=3, rounds=2).collect()}
    assert out == {1: (0, 0), 2: (0, 0)}
    with pytest.raises(ValueError, match="rounds"):
        kcore_peel_rounds(empty, k=3, rounds=0)


def test_scd2_build_duplicate_seq_is_partition_invariant(spark):
    """Duplicate (key, seq) violates scd2_build's documented contract, but
    a dirty/merged changelog that does it anyway must not get a
    PARTITION-DEPENDENT history: lead()/row_number() over a tie are
    arrival-ordered, so the window order tie-breaks on a payload hash.
    Same history rows under any partitioning and input order."""
    rows = [
        (1, "u", 10, "a"),
        (1, "u", 10, "b"),  # duplicate seq, different attr
        (1, "u", 10, "c"),
        (1, "u", 20, "d"),
        (2, "u", 5, "x"),
    ]
    outs = []
    for order, nparts in [(rows, 1), (rows[::-1], 7), (rows[2:] + rows[:2], 3)]:
        log = spark.createDataFrame(
            order, "k long, op string, seq long, attr string"
        ).repartition(nparts)
        hist = scd2_build(log, key="k", seq="seq", attrs=["attr"])
        outs.append(
            sorted(
                (r["k"], r["attr"], r["version"], r["valid_from"], r["valid_to"], r["is_current"])
                for r in hist.collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    # the clean key is untouched by tie handling
    assert [(o[0], o[1]) for o in outs[0] if o[0] == 2] == [(2, "x")]
