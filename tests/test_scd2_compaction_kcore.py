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
