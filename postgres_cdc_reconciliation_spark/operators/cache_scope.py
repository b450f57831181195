"""Bounded scope for persist()-as-a-hint caches (ADVICE r13 #1).

The two-pass prefix-sum operators (``recon._with_global_positions``,
``plans.text_pipeline.q_vocab_coverage``) persist an intermediate so its
input scans once across the offset job and the returned lazy plan. The
returned plan is consumed by the CALLER at an unknown later time, so the
helper cannot unpersist inline — and a bare ``persist()`` with no release
accumulates cached blocks indefinitely in a long-lived session (one recon
service process runs thousands of diffs).

``scoped_persist`` keeps the hint but bounds the leak: handles enter a
small FIFO; registering past the cap unpersists the oldest (non-blocking).
Eviction is ALWAYS value-safe for these operators — their cached plans
recompute through deterministic range partitioners (explicit
numPartitions, so the sampled boundaries are reproducible) — so the cap
trades at worst a recompute, never correctness. By the time a handle is
``_CAP`` registrations old its query has been consumed in any real
call pattern; a pathological interleaving just recomputes.
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
