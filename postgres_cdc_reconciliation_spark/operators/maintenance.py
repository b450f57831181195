"""[EXT] Unified maintenance monitor for every persisted sidecar tier.

Every incremental tier in the engine grows per ingest batch — the manifest
target accrues versions and stage attempts, the semantic index accrues
``batch=N`` partitions, the text index accrues ``delta/v=K`` admits, the
streaming LSH band index accrues ``batch=N`` dirs, and a stamped clustered
dir accrues files its zonemap/bloom/NDV/hist sidecars haven't seen yet.
Each tier has its own stats view (``bucket_stats``, ``semantic_index_stats``,
…) and its own compaction verb; what was missing (VERDICT r11 #7) is ONE
report that walks any set of paths, detects what lives there, and says
whether maintenance is due and which verb to run.

``maintenance_report`` is that report: metadata IO only (filesystem
listings, sidecar JSON, manifest docs — never data files), one row per
detected tier per path, with per-tier thresholds and the advice string
naming the exact maintenance call. The driver-side listings are bounded by
file/dir counts, the same budget the tiers' own stats views spend.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

#: report row schema — one row per detected tier per path
REPORT_SCHEMA = (
    "path string, tier string, n_files long, n_bytes long, n_admits long, "
    "n_versions long, stale_files long, compaction_due boolean, "
    "advice string"
)

_SIDECARS = (
    "_pcr_zonemap.json",
    "_pcr_bloom.json",
    "_pcr_ndv.json",
    "_pcr_hist.json",
)


def _fs_of(spark, path):
    from .manifest_target import _fs

    return _fs(spark, path)


def _exists(spark, fs, path: str) -> bool:
    _, jp = _fs_of(spark, path)
    return fs.exists(jp)


def _list_names(spark, fs, path: str) -> list:
    _, jp = _fs_of(spark, path)
    if not fs.exists(jp):
        return []
    return list(fs.listStatus(jp))


def _du(spark, fs, path: str) -> tuple[int, int]:
    """(n_data_files, n_bytes) for a dir tree — hidden/marker files
    excluded. One getContentSummary-style recursive listing, no data IO."""
    _, jp = _fs_of(spark, path)
    if not fs.exists(jp):
        return 0, 0
    n = b = 0
    stack = [jp]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                n += 1
                b += st.getLen()
    return n, b


def _read_json(fs, spark, path: str) -> dict:
    _, jp = _fs_of(spark, path)
    stream = fs.open(jp)
    try:
        return json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()


def _manifest_row(spark, fs, path, max_files_per_bucket, max_versions):
    from .manifest_target import (
        STAGE_DIR,
        _doc_at,
        _manifest_versions,
        read_manifest,
    )

    versions = _manifest_versions(spark, path)
    _, mapping = read_manifest(spark, path)
    # every committed version's labels are REACHABLE (time travel), not
    # orphans — only a stage dir no manifest points at is vacuum's food
    live_labels = set()
    for v in versions:
        doc = _doc_at(spark, path, v)
        live_labels |= {str(dv) for dv in doc["buckets"].values()}
    # one glob per LIVE label (labels <= commits, usually << buckets)
    # instead of a listStatus round-trip per live bucket dir — 256 buckets
    # over 11 labels cost 11 py4j calls, not 256, and a full-stage-tree
    # glob (which also walks every historical version's dirs) is avoided
    current = {(str(label), int(b)) for b, label in mapping.items()}
    n_files = n_bytes = 0
    per_bucket: dict[int, int] = {}
    for label in sorted({label for label, _ in current}):
        _, gpath = _fs_of(
            spark, f"{path}/{STAGE_DIR}/v={label}/_bucket=*/*"
        )
        for st in fs.globStatus(gpath) or []:
            p = st.getPath()
            name = p.getName()
            if name.startswith(("_", ".")) or st.isDirectory():
                continue
            b = int(p.getParent().getName().split("=", 1)[1])
            if (label, b) not in current:
                continue  # bucket superseded by a later commit (time travel)
            n_files += 1
            n_bytes += st.getLen()
            per_bucket[b] = per_bucket.get(b, 0) + 1
    worst_bucket_files = max(per_bucket.values(), default=0)
    # orphan stage attempts: staged dirs no committed manifest points at
    # (crashed/lost-race writers) — vacuum's food
    orphans = 0
    for st in _list_names(spark, fs, f"{path}/{STAGE_DIR}"):
        name = st.getPath().getName()
        if name.startswith("v=") and name[2:] not in live_labels:
            orphans += 1
    due = (
        worst_bucket_files > max_files_per_bucket
        or len(versions) > max_versions
        or orphans > 0
    )
    parts = []
    if worst_bucket_files > max_files_per_bucket:
        parts.append(
            f"compact(root, ...) — a bucket holds {worst_bucket_files} "
            f"files (> {max_files_per_bucket})"
        )
    if len(versions) > max_versions:
        parts.append(
            f"vacuum(root, keep_versions=...) — {len(versions)} versions "
            f"retained (> {max_versions})"
        )
    if orphans:
        parts.append(f"vacuum(root) — {orphans} orphan stage attempt(s)")
    return (
        path,
        "manifest_target",
        n_files,
        n_bytes,
        0,
        len(versions),
        orphans,
        bool(due),
        "; ".join(parts) if parts else "healthy",
    )


def _semantic_row(spark, fs, path, max_admits):
    batches = sorted(
        st.getPath().getName()
        for st in _list_names(spark, fs, path)
        if st.getPath().getName().startswith("batch=")
    )
    n_files, n_bytes = _du(spark, fs, path)
    n_admits = max(0, len(batches) - 1)  # batch=0 is the seed build
    due = n_admits > max_admits
    return (
        path,
        "semantic_index",
        n_files,
        n_bytes,
        n_admits,
        len(batches),
        0,
        bool(due),
        (
            f"semantic_index_compact(src, dst) — {n_admits} admitted "
            f"batches (> {max_admits}); each probed cluster opens one dir "
            "per batch"
            if due
            else "healthy"
        ),
    )


def _text_index_row(spark, fs, path, max_admits):
    from .retrieval import _idx_meta

    meta = _idx_meta(spark, path)
    n_files, n_bytes = _du(spark, fs, path)
    n_admits = len(meta["deltas"])
    due = n_admits > max_admits
    return (
        path,
        "text_index",
        n_files,
        n_bytes,
        n_admits,
        n_admits + 1,
        0,
        bool(due),
        (
            f"text_index_compact(src, dst) — {n_admits} committed deltas "
            f"(> {max_admits}); each probed bucket opens one dir per delta"
            if due
            else "healthy"
        ),
    )


def _stamped_row(spark, fs, path, max_stale_share, max_files):
    live = {
        st.getPath().getName(): st.getLen()
        for st in _list_names(spark, fs, path)
        if st.getPath().getName().endswith(".parquet")
    }
    stale = set()
    stamped_sidecars = []
    for sc in _SIDECARS:
        if not _exists(spark, fs, f"{path}/{sc}"):
            continue
        stamped_sidecars.append(sc)
        entries = _read_json(fs, spark, f"{path}/{sc}").get("files", {})
        stale |= set(live) - set(entries)
    n_files = len(live)
    n_bytes = sum(live.values())
    stale_share = (len(stale) / n_files) if n_files else 0.0
    parts = []
    if stale:
        verbs = ", ".join(
            f"stamp_{sc.split('_pcr_')[1].split('.')[0]}(mode='append')"
            for sc in stamped_sidecars
        )
        parts.append(
            f"{verbs} — {len(stale)} file(s) unstamped "
            f"({stale_share:.0%} of the dir is unprunable)"
        )
    if n_files > max_files:
        parts.append(
            f"compact_clustered(src, dst) — {n_files} files "
            f"(> {max_files}); per-file open cost dominates small scans"
        )
    due = stale_share > max_stale_share or n_files > max_files
    return (
        path,
        "stamped_parquet",
        n_files,
        n_bytes,
        0,
        0,
        len(stale),
        bool(due),
        "; ".join(parts) if parts else "healthy",
    )


def _batch_store_row(spark, fs, path, max_admits):
    batches = [
        st.getPath().getName()
        for st in _list_names(spark, fs, path)
        if st.getPath().getName().startswith("batch=")
    ]
    n_files, n_bytes = _du(spark, fs, path)
    n_admits = len(batches)
    due = n_admits > max_admits
    return (
        path,
        "batch_store",
        n_files,
        n_bytes,
        n_admits,
        n_admits,
        0,
        bool(due),
        (
            f"compact_batch_store(src, dst) — {n_admits} batch dirs "
            f"(> {max_admits}); every probe lists and opens all of them"
            if due
            else "healthy"
        ),
    )


def _stream_state_row(spark, fs, path, max_versions):
    committed = []
    for st in _list_names(spark, fs, path):
        name = st.getPath().getName()
        if name.startswith("v=") and _exists(
            spark, fs, f"{path}/{name}/_COMMIT"
        ):
            committed.append(int(name[2:]))
    n_files, n_bytes = _du(spark, fs, path)
    due = len(committed) > max_versions
    return (
        path,
        "stream_state",
        n_files,
        n_bytes,
        0,
        len(committed),
        0,
        bool(due),
        (
            f"{len(committed)} committed versions retained "
            f"(> {max_versions}) — lower keep_versions on the stream"
            if due
            else "healthy"
        ),
    )


def detect_tier(spark, path: str) -> str | None:
    """Which maintenance tier lives at ``path`` — None when unrecognized.
    Detection is structural (marker files/dirs), never data reads."""
    fs, _ = _fs_of(spark, path)
    from .manifest_target import MANIFEST_DIR

    if _exists(spark, fs, f"{path}/{MANIFEST_DIR}"):
        return "manifest_target"
    if _exists(spark, fs, f"{path}/_pcr_semindex.json"):
        return "semantic_index"
    if _exists(spark, fs, f"{path}/_COMMIT") and _exists(
        spark, fs, f"{path}/meta"
    ):
        return "text_index"
    if any(_exists(spark, fs, f"{path}/{sc}") for sc in _SIDECARS):
        return "stamped_parquet"
    names = [st.getPath().getName() for st in _list_names(spark, fs, path)]
    if any(n.startswith("v=") for n in names) and any(
        _exists(spark, fs, f"{path}/{n}/_COMMIT")
        for n in names
        if n.startswith("v=")
    ):
        return "stream_state"
    if any(n.startswith("batch=") for n in names):
        return "batch_store"
    return None


def maintenance_report(
    spark: SparkSession,
    paths: list[str] | str,
    max_admits: int = 8,
    max_files_per_bucket: int = 8,
    max_versions: int = 32,
    max_stale_share: float = 0.25,
    max_files: int = 512,
) -> DataFrame:
    """One maintenance row per recognized tier under each path: file/byte
    footprint, admit/version counts, staleness, a ``compaction_due``
    verdict against the thresholds, and the advice string naming the
    maintenance verb. An unrecognized path reports tier ``unknown`` with
    ``compaction_due=false`` (loud in the report, silent in the gate —
    a typo'd path must not page anyone).

    Thresholds: ``max_admits`` bounds delta/batch dirs per index (each
    admit adds one dir-open per probe), ``max_files_per_bucket`` and
    ``max_versions`` bound the manifest target, ``max_stale_share`` the
    unstamped-file fraction a sidecar-pruned scan tolerates (stale files
    are always READ — pruning degrades, never breaks), ``max_files`` the
    plain file count of a stamped dir."""
    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        raise ValueError("paths must be non-empty")
    rows = []
    for p in paths:
        p = p.rstrip("/")
        fs, _ = _fs_of(spark, p)
        tier = detect_tier(spark, p)
        if tier == "manifest_target":
            rows.append(
                _manifest_row(spark, fs, p, max_files_per_bucket, max_versions)
            )
        elif tier == "semantic_index":
            rows.append(_semantic_row(spark, fs, p, max_admits))
        elif tier == "text_index":
            rows.append(_text_index_row(spark, fs, p, max_admits))
        elif tier == "stamped_parquet":
            rows.append(
                _stamped_row(spark, fs, p, max_stale_share, max_files)
            )
        elif tier == "batch_store":
            rows.append(_batch_store_row(spark, fs, p, max_admits))
        elif tier == "stream_state":
            rows.append(_stream_state_row(spark, fs, p, max_versions))
        else:
            n_files, n_bytes = _du(spark, fs, p)
            rows.append(
                (p, "unknown", n_files, n_bytes, 0, 0, 0, False,
                 "unrecognized layout — nothing to maintain")
            )
    return spark.createDataFrame(rows, REPORT_SCHEMA)


def compact_batch_store(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_col: str | None = None,
    n_files: int = 8,
) -> int:
    """Compact an append-only ``batch=N`` store (the streaming LSH band
    index shape) into ``dst_path`` as a single ``batch=0`` dir: one read
    of all batch partitions, one write of ``n_files`` files (optionally
    repartitioned by ``partition_col`` so downstream equality joins
    co-locate). Returns the row count. Same no-data-loss contract as the
    index compactors: destination must be new; the caller swaps paths."""
    fs, _ = _fs_of(spark, src_path)
    if src_path.rstrip("/") == dst_path.rstrip("/"):
        raise ValueError("compact to a NEW path, then swap — never in place")
    if _exists(spark, fs, dst_path):
        raise ValueError(f"destination {dst_path} already exists")
    df = spark.read.parquet(src_path)
    if "batch" in df.columns:
        df = df.drop("batch")
    out = (
        df.repartition(n_files, partition_col)
        if partition_col
        else df.coalesce(n_files)
    )
    out.write.mode("errorifexists").parquet(f"{dst_path}/batch=0")
    return spark.read.parquet(dst_path).count()
