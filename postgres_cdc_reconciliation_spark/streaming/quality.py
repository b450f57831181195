"""[EXT] Continuous data-quality verification over an unbounded stream.

The batch verifier (`operators/quality.py::check_constraints`) answers
"is this table clean?"; this stream answers "is the FEED still clean, as
of every micro-batch?" — the ingest-time gate a 100 TB pipeline needs
before bad rows fan out into downstream tables.

Design: every row-local constraint metric has an ADDITIVE counter form
(`constraint_counters`: num/den BIGINTs per constraint, metric = num/den),
so maintaining the suite over a stream is cell-wise addition — O(suite
size) state regardless of stream length, no watermarks, no stateful
operator. Each micro-batch computes its counters in ONE aggregate over
the batch and merges them into the persisted totals under the same commit
protocol as the sketch streams (streaming/sketches.py): full snapshot at
``{path}/v={batch_id}``, ``_COMMIT`` marker as the commit record, batch-id
high-water replay guard (at-least-once foreachBatch can never
double-count), versions pruned to ``keep_versions``.

Non-additive kinds (unique / foreign_key / functional_dependency) are
rejected loudly at stream build time — exact uniqueness over a stream
needs unbounded state; the bounded-state alternative is the KMV distinct
sketch stream (streaming/sketches.py::kmv_stream), and cross-table checks
belong to the batch verifier.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.manifest_target import _is_already_exists
from ..operators.quality import constraint_counters, counters_to_certificate
from .rollup import _fs
from .sketches import _committed


def _suite_fingerprint(constraints: list[dict]) -> str:
    """Canonical serialization of a constraint suite. The persisted
    counters identify constraints purely by positional cid, so the merge
    is only meaningful against the EXACT suite that produced them — this
    fingerprint (kind/column/params per cid, order-sensitive) is frozen
    alongside the state and checked on every stream build, mirroring
    drift_stream's n_buckets guard."""
    normalized = []
    for c in constraints:
        d = {}
        for k in sorted(c):
            v = c[k]
            # set-valued params have no stable iteration order
            d[k] = sorted(v) if isinstance(v, (set, frozenset)) else v
        normalized.append(d)
    return json.dumps(normalized, sort_keys=True, default=str)


def _check_or_stamp_suite(spark, path: str, fp: str) -> None:
    """Verify (or first-stamp) the suite fingerprint at ``{path}/_suite.json``.

    Arbitration is CREATE-EXCLUSIVE (``FileSystem.create(path,
    overwrite=false)``), the same one-winner protocol as the manifest
    commit: two streams first-building the same state path concurrently
    each try the create, exactly one wins, and the loser falls through to
    the read-and-compare — a loser presenting a DIFFERENT suite fails
    loudly instead of silently overwriting the winner's stamp (ADVICE
    r12's check-then-write race).

    Legacy compatibility: state dirs stamped by the old parquet protocol
    (``{path}/_suite/`` with ``_SUCCESS``) are still verified against, and
    re-stamped into the JSON form only when they MATCH. A state dir with
    committed counter versions but NO fingerprint at all predates the
    guard — it is NOT silently adopted (the counters may have been built
    by any suite); fail with the explicit remediation instead.
    """
    fs, _ = _fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path

    def _mismatch(persisted: str) -> ValueError:
        return ValueError(
            f"constraint state at {path} was built with a different "
            "suite — counters are positional by cid and cannot be "
            "merged across suite changes; start a new state path (or "
            "re-verify from scratch) when the suite changes.\n"
            f"persisted: {persisted}\ncurrent:   {fp}"
        )

    def _read_json_stamp() -> str:
        stream = fs.open(jpath(f"{path}/_suite.json"))
        try:
            raw = bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()
        return json.loads(raw)["fingerprint"]

    _, stamp = _fs(spark, f"{path}/_suite.json")
    if fs.exists(stamp):
        persisted = _read_json_stamp()
        if persisted != fp:
            raise _mismatch(persisted)
        return
    # legacy parquet stamp: verify, then migrate matching dirs to JSON
    _, legacy_ok = _fs(spark, f"{path}/_suite/_SUCCESS")
    if fs.exists(legacy_ok):
        persisted = (
            spark.read.parquet(f"{path}/_suite").collect()[0]["fingerprint"]
        )
        if persisted != fp:
            raise _mismatch(persisted)
    elif _committed(spark, path):
        raise ValueError(
            f"constraint state at {path} has committed counters but no "
            "suite fingerprint — it predates the suite guard, and the "
            "suite that built those counters cannot be verified. Either "
            "re-verify from a fresh state path, or — if you are CERTAIN "
            "the suite is unchanged — opt in explicitly with "
            "stamp_suite(spark, path, constraints) before starting the "
            "stream (silently adopting unverified counters was ADVICE "
            "r12's retro-stamp hazard)"
        )
    fs.mkdirs(jpath(path))
    doc = json.dumps({"fingerprint": fp}).encode("utf-8")
    try:
        out = fs.create(stamp, False)
    except Exception as e:
        if _is_already_exists(e):
            # lost the first-stamp race: the winner's suite is the frozen
            # one — re-read and compare against it
            persisted = _read_json_stamp()
            if persisted != fp:
                raise _mismatch(persisted)
            return
        raise
    try:
        out.write(bytearray(doc))
    finally:
        out.close()


def stamp_suite(spark, path: str, constraints: list[dict]) -> None:
    """EXPLICIT opt-in for legacy state dirs: force-write the suite
    fingerprint for ``constraints`` at ``{path}/_suite.json``, overwriting
    any prior stamp. Only for state built BEFORE the fingerprint guard
    existed, where the operator can vouch the suite never changed —
    everywhere else the stream stamps (create-exclusively) on first build
    and this function must not be used to silence a genuine mismatch."""
    fs, stamp = _fs(spark, f"{path}/_suite.json")
    fs.mkdirs(spark._jvm.org.apache.hadoop.fs.Path(path))
    out = fs.create(stamp, True)
    try:
        out.write(
            bytearray(
                json.dumps(
                    {"fingerprint": _suite_fingerprint(constraints)}
                ).encode("utf-8")
            )
        )
    finally:
        out.close()


def current_certificate(spark, path: str) -> DataFrame | None:
    """Latest committed certificate (same schema as batch
    check_constraints) — None before the first commit."""
    versions = _committed(spark, path)
    if not versions:
        return None
    counters = spark.read.parquet(f"{path}/v={versions[-1]}/counters")
    return counters_to_certificate(counters)


def current_counters(spark, path: str) -> DataFrame | None:
    """Latest committed raw counters — None before the first commit."""
    versions = _committed(spark, path)
    if not versions:
        return None
    return spark.read.parquet(f"{path}/v={versions[-1]}/counters")


def constraint_stream(
    events: DataFrame,
    path: str,
    checkpoint_dir: str,
    constraints: list[dict],
    keep_versions: int = 2,
):
    """foreachBatch writer maintaining a constraint-suite certificate over
    the whole stream seen so far. Returns the writeStream to ``.start()``.

    Invariant (pytest-pinned): after every commit, the streamed counters
    equal a batch ``constraint_counters`` run over the concatenation of all
    committed batches — in any batch arrival order, across restarts, and
    under at-least-once replay.
    """
    # validate the suite ONCE, loudly, before the stream starts — a bad
    # kind must not surface as a mid-stream task failure
    for c in constraints:
        if c["kind"] in ("unique", "foreign_key", "functional_dependency"):
            raise ValueError(
                f"constraint kind {c['kind']!r} is not additive — batch "
                "check_constraints verifies it; streaming distinctness is "
                "kmv_stream's job"
            )
        if c["kind"] not in ("not_null", "between", "in_set", "matches", "min_rows"):
            raise ValueError(f"unknown constraint kind: {c['kind']!r}")
    if not constraints:
        raise ValueError("empty constraint suite")
    spark = events.sparkSession

    # Freeze the suite identity next to the state: counters are keyed by
    # positional cid, so restarting with a modified/reordered suite would
    # silently merge one constraint's counts into another (or drop removed
    # cids through the merge join). First build persists the fingerprint
    # CREATE-EXCLUSIVELY (same arbitration as the manifest commit, ADVICE
    # r12 — the old check-then-write let two concurrent first-builds with
    # DIFFERENT suites both stamp, last-writer-wins, defeating the guard);
    # every later build must present the identical suite or fail loudly.
    _check_or_stamp_suite(spark, path, _suite_fingerprint(constraints))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        versions = _committed(spark, path)
        if versions and batch_id <= versions[-1]:
            return  # at-least-once replay of an already-merged batch
        partial = constraint_counters(batch_df, constraints)
        if versions:
            prev = spark.read.parquet(f"{path}/v={versions[-1]}/counters")
            merged = (
                partial.select("cid", "num", "den")
                .unionByName(prev.select("cid", "num", "den"))
                .groupBy("cid")
                .agg(
                    F.sum("num").alias("num"),
                    # den is NULL for min_rows on BOTH sides: sum keeps NULL
                    F.sum("den").alias("den"),
                )
                .join(
                    partial.select("cid", "constraint", "column", "threshold"),
                    "cid",
                )
                .select("cid", "constraint", "column", "num", "den", "threshold")
            )
        else:
            merged = partial
        merged = merged.localCheckpoint()  # bounded: one row per constraint
        merged.write.mode("overwrite").parquet(f"{path}/v={batch_id}/counters")
        fs, _ = _fs(spark, path)
        _, marker = _fs(spark, f"{path}/v={batch_id}/_COMMIT")
        fs.create(marker, True).close()
        for v in _committed(spark, path)[:-keep_versions]:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}"), True
            )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def _ref_paths(spark, path: str) -> tuple[str, str] | None:
    """Resolve the COMMITTED reference anchor: (meta_path, counts_path),
    or None before the first commit. The ``_ref/_COMMIT`` marker holds
    the winning attempt's token (r13 — see drift_stream's init); a legacy
    empty marker resolves to the plain pre-token dirs."""
    fs, jm = _fs(spark, f"{path}/_ref/_COMMIT")
    if not fs.exists(jm):
        return None
    stream = fs.open(jm)
    try:
        token = bytes(stream.readAllBytes()).decode("utf-8").strip()
    finally:
        stream.close()
    suffix = f"-{token}" if token else ""
    return f"{path}/_ref/meta{suffix}", f"{path}/_ref/counts{suffix}"


def current_drift(spark, path: str) -> DataFrame | None:
    """Latest committed PSI drift report (same schema as batch psi_report)
    — None before the first commit."""
    versions = _committed(spark, path)
    if not versions:
        return None
    from ..operators.quality import psi_from_counts

    ref = _ref_paths(spark, path)
    if ref is None:
        return None
    meta_path, counts_path = ref
    meta = spark.read.parquet(meta_path).collect()[0]
    rc = spark.read.parquet(counts_path).withColumnRenamed("_n", "_rn")
    cc = spark.read.parquet(f"{path}/v={versions[-1]}/counts").withColumnRenamed(
        "_n", "_cn"
    )
    return psi_from_counts(spark, rc, cc, int(meta["n_buckets"]))


def drift_stream(
    events: DataFrame,
    ref: DataFrame,
    col: str,
    path: str,
    checkpoint_dir: str,
    n_buckets: int = 10,
    keep_versions: int = 2,
):
    """foreachBatch writer maintaining a PSI drift report of the stream
    seen so far against a STATIC reference sample. Returns the writeStream
    to ``.start()``.

    The reference is frozen at stream build time: its min/max anchor and
    its bucket counts are computed once and persisted under ``{path}/_ref``
    (O(n_buckets) rows), so every micro-batch costs ONE aggregate over the
    batch — bucket counts are additive (operators/quality.py::
    psi_bucket_counts), and the cumulative current-side counts merge by
    cell-wise sum under the usual snapshot + ``_COMMIT`` + batch-id
    high-water protocol. State is O(n_buckets) at any stream length.

    Invariant (pytest-pinned): after every commit, ``current_drift`` equals
    batch ``psi_report`` over the concatenation of all committed batches —
    bit-identical contributions, any arrival order, replay-safe.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from ..operators.quality import psi_bucket_counts, psi_ref_stats

    spark = events.sparkSession
    fs, _ = _fs(spark, path)

    def _adopt_frozen() -> DataFrame:
        # restart (or lost first-build race): the anchor is the FROZEN
        # one — re-deriving it from the (possibly changed) ref argument
        # would bucket new batches against a different grid than the
        # persisted reference counts
        meta_path, _counts = _ref_paths(spark, path)
        meta = spark.read.parquet(meta_path).collect()[0]
        if int(meta["n_buckets"]) != int(n_buckets):
            raise ValueError(
                f"drift state at {path} was built with n_buckets="
                f"{meta['n_buckets']}, got {n_buckets}"
            )
        return spark.createDataFrame(
            [(meta["_lo"], meta["_hi"])], "_lo double, _hi double"
        )

    if _ref_paths(spark, path) is not None:
        stats = _adopt_frozen()
    else:
        # First build: stage the anchor under a UNIQUE token, then
        # CREATE-EXCLUSIVE the marker holding that token (r13 — the old
        # check-then-write init let two concurrent first-builds overwrite
        # each other's _ref dirs last-writer-wins while each kept
        # bucketing against its own in-memory anchor). Exactly one
        # token wins; the loser deletes its orphan dirs and adopts the
        # winner's frozen anchor (or fails loudly on n_buckets mismatch).
        import secrets

        token = secrets.token_hex(4)
        stats = psi_ref_stats(ref, col).localCheckpoint()  # 1 row, frozen
        psi_bucket_counts(ref, stats, col, n_buckets).write.parquet(
            f"{path}/_ref/counts-{token}"
        )
        stats.select(
            "_lo", "_hi", F.lit(int(n_buckets)).alias("n_buckets")
        ).write.parquet(f"{path}/_ref/meta-{token}")
        _, jm = _fs(spark, f"{path}/_ref/_COMMIT")
        try:
            out = fs.create(jm, False)
            try:
                out.write(bytearray(token.encode("utf-8")))
            finally:
                out.close()
        except Exception as e:
            if not _is_already_exists(e):
                raise
            jpath = spark._jvm.org.apache.hadoop.fs.Path
            for orphan in (f"{path}/_ref/counts-{token}",
                           f"{path}/_ref/meta-{token}"):
                fs.delete(jpath(orphan), True)
            stats = _adopt_frozen()

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        versions = _committed(spark, path)
        if versions and batch_id <= versions[-1]:
            return  # at-least-once replay of an already-merged batch
        partial = psi_bucket_counts(batch_df, stats, col, n_buckets)
        if versions:
            prev = spark.read.parquet(f"{path}/v={versions[-1]}/counts")
            merged = (
                partial.unionByName(prev)
                .groupBy("bucket")
                .agg(F.sum("_n").alias("_n"))
            )
        else:
            merged = partial
        merged = merged.localCheckpoint()  # bounded: <= n_buckets rows
        merged.write.mode("overwrite").parquet(f"{path}/v={batch_id}/counts")
        _, marker = _fs(spark, f"{path}/v={batch_id}/_COMMIT")
        fs.create(marker, True).close()
        for v in _committed(spark, path)[:-keep_versions]:
            fs.delete(
                spark._jvm.org.apache.hadoop.fs.Path(f"{path}/v={v}"), True
            )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def quarantine_stream(
    events: DataFrame,
    constraints: list[dict],
    ok_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
):
    """foreachBatch writer routing each micro-batch through
    ``validate_rows``: valid rows append to ``ok_path`` (original schema),
    violating rows append to ``quarantine_path`` WITH their violation
    labels and the batch id — per-row triage at ingest time instead of
    failing the load (the streaming form of ``quarantine_split``).

    Replay contract: appends are idempotent per batch because both sinks
    carry ``_batch_id`` and a replayed batch REPLACES its own partition
    (dynamic partition overwrite on ``_batch_id``) — an at-least-once
    re-delivery overwrites the same rows rather than duplicating them.
    Both sinks stay plain parquet readable by any engine.
    """
    from ..operators.quality import validate_rows

    for c in constraints:
        if c["kind"] not in ("not_null", "between", "in_set", "matches"):
            raise ValueError(
                f"constraint kind {c['kind']!r} is not row-local — "
                "quarantine routing is a per-row decision"
            )
    if not constraints:
        raise ValueError("empty constraint suite")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        v = validate_rows(batch_df, constraints)
        ok = v.where(F.col("is_valid")).select(*batch_df.columns)
        bad = v.where(~F.col("is_valid")).drop("is_valid")
        # array -> joined string: the quarantine sink stays readable by
        # engines without list types, and the labels sort/grep trivially
        bad = bad.withColumn("violations", F.array_join("violations", ","))
        # per-write dynamic overwrite — mutating the session-global
        # partitionOverwriteMode conf would race concurrent writers in the
        # same SparkSession (a static-mode overwrite in the window could
        # wipe sibling partitions; a concurrent restore could flip this
        # stream back to static mid-write)
        (
            ok.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(ok_path)
        )
        (
            bad.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(quarantine_path)
        )

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
