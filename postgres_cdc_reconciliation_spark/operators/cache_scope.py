"""Bounded scope for persist()-as-a-hint caches (ADVICE r13 #1).

Operators whose plan fans out to several consuming branches (the shingle /
positional-gram streams in ``dedup``, the train shingles in ``curation``)
persist the shared intermediate so its upstream scans once. The returned
plan is consumed by the CALLER at an unknown later time, so the helper
cannot unpersist inline — and a bare ``persist()`` with no release
accumulates cached blocks indefinitely in a long-lived session (one recon
service process runs thousands of diffs).

``scoped_persist`` keeps the hint but bounds the leak: handles enter a
small FIFO; registering past the cap unpersists the oldest (non-blocking).

ELIGIBILITY (tightened r14): eviction means a consumer may RECOMPUTE the
plan, so scoped_persist is only for caches-as-hints — plans whose
recomputation is value-identical (deterministic maps: tokenize, explode,
hash). It must NOT be used where two consumers need a CONSISTENT view of
a nondeterministic materialization: the r13 two-pass prefix-sum operators
(``recon._with_global_positions``, ``q_vocab_coverage``) cached a
range-partitioned frame whose boundary sample could differ on recompute
(and whose ``spark_partition_id`` column is nondeterministic), so an
eviction between their two jobs produced DUPLICATE positions. r14 pinned
those frames with an eager localCheckpoint; r15 removed the pin entirely
by making the bucket id a pure row-value expression over boundary
LITERALS (``recon.range_pid_expr``) — recomputation now derives identical
buckets from scratch, so those operators are back to hint-eligible and
use scoped_persist again. The rule stands for any future consumer of a
genuinely nondeterministic materialization.
"""

from __future__ import annotations

from collections import deque
from threading import Lock

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_CAP = 8
_handles: deque[DataFrame] = deque()
_lock = Lock()


def scoped_persist(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist(level) + register for bounded release. Returns ``df``."""
    df = df.persist(level)
    evicted = []
    with _lock:
        _handles.append(df)
        while len(_handles) > _CAP:
            evicted.append(_handles.popleft())
    for old in evicted:
        try:
            old.unpersist(blocking=False)
        except Exception:
            # a stopped/restarted session invalidates old handles; dropping
            # the reference is the release in that case
            pass
    return df


def release_all() -> None:
    """Unpersist every registered handle now (test teardown / service
    quiesce). Safe to call at any time — pending plans recompute."""
    with _lock:
        handles = list(_handles)
        _handles.clear()
    for df in handles:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
