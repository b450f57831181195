"""Physical layout operators for 100 TB scale: bucketing, partition pruning,
skew salting.

These are the knobs that keep the big joins cheap on a 1000-executor
cluster:

- **Bucketed tables** (`write_bucketed`): both sides of a recurring
  fact-fact join stored bucketed by the join key → SortMergeJoin with NO
  shuffle Exchange (each bucket pairs 1:1). The per-query win is the whole
  shuffle of the larger table; the cost is paid once at write time.
- **Date-partitioned writes** (`write_partitioned`): directory-level
  partition pruning — a predicate on the partition column skips entire
  partitions before any IO (PartitionFilters in the scan node).
- **Salted joins** (`salted_join`): when one join key dominates (power-law
  CDC keys, hot customers), explode the hot side into N salts and replicate
  the other side N ways — the skewed key's work spreads over N tasks. AQE's
  skew-join split handles moderate skew automatically; salting is the
  explicit control for extreme cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+sorted) managed table; joins/aggs on the
    bucket key then require no Exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Directory-partitioned parquet: predicates on partition_cols prune
    whole directories (PartitionFilters, zero IO for skipped partitions)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed side, replicate the other.

    skewed gets a uniform salt in [0, n_salts); other is exploded ×n_salts;
    join on (key, salt). Row multiplicity of the result is unchanged."""
    s = skewed.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, [on, "_salt"], how)
    return out.drop("_salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    target_rows: int = 1_000_000,
) -> DataFrame:
    """Join/agg-key skew diagnosis: per-key row count, share of the table,
    and the salt factor ``salted_join``/AQE would need to bring each key's
    partition under ``target_rows`` rows.

    The report the operator playbook reads before a big shuffle: a key with
    ``salt_factor`` > 1 will straggle a plain hash partitioning (one reducer
    gets the whole key), and the factor says how many ways to split it.
    Salt factor is computed in exact integer arithmetic
    (``(n - 1) div target + 1``), never via float ceil, so the advice is
    identical in any engine. One keyed count shuffle (map-side partials)
    plus a broadcast of the single-row total — never a driver collect.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_tot"))
    return (
        counts.join(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_tot").cast("double")).alias(
                "share"
            ),
            F.expr(f"(n_rows - 1) div {int(target_rows)}").alias("_q"),
        )
        .select(
            *key_cols,
            "n_rows",
            "share",
            (F.col("_q") + 1).cast("long").alias("salt_factor"),
            (F.col("_q") > 0).alias("is_hot"),
        )
    )


def zorder_value(cols: list[str], bits: int = 16):
    """Z-order (Morton) interleave of N columns' rank-space positions.

    Each column value must already be a non-negative int in [0, 2^bits)
    (rank/bucketize first — `F.ntile` or min-max scaling); the returned
    column interleaves their bits so that sorting by it clusters rows that
    are close in EVERY dimension. Built from shifts/masks only — pure
    codegen'd JVM expressions, no UDF."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(F.col(c).cast("long"), b).bitwiseAND(
                F.lit(1).cast("long")
            )
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i).cast("long"))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 12,
    n_files: int = 32,
    stamp_zones: bool = False,
) -> None:
    """Write parquet clustered by Z-order over ``zorder_cols``.

    The multi-dimensional analog of sorting by one column: each output
    file covers a small hyper-rectangle of the key space, so parquet
    row-group min/max stats prune scans for range predicates on ANY of the
    z-ordered columns (a single-column sort only helps its leading column).
    This is what Delta's OPTIMIZE ZORDER BY does; on plain parquet it's a
    scale + interleave + repartitionByRange write:

    - cell assignment is min/max value-space binning — ONE tiny agg for the
      bounds, then a pure map-side expression per row (a global rank window
      would serialize the whole table through one task; heavy value skew is
      the tradeoff — pre-transform such a column or drop it from the key);
    - repartitionByRange on the z-value gives each file a contiguous
      z-range (range exchange + sample pass, one shuffle);
    - sortWithinPartitions tightens per-row-group stats inside each file.

    ``stamp_zones=True`` additionally writes the ``_pcr_zonemap.json``
    sidecar (one footer-only pass, :func:`stamp_zonemap`) with per-file
    zones for EVERY z-ordered column — :func:`read_range` then file-skips
    on any of them (the OPTIMIZE ZORDER BY + data-skipping combination:
    each file covers a small hyper-rectangle, so every dimension's zones
    are narrow).
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in zorder_cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in zorder_cols],
    ).first()
    scaled = df
    tmp_cols = []
    for c in zorder_cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        width = (hi - lo) or 1.0
        cell_col = f"_zc_{c}"
        scaled = scaled.withColumn(
            cell_col,
            F.least(
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(width)
                 * (1 << bits)).cast("long"),
                F.lit((1 << bits) - 1),
            ),
        )
        tmp_cols.append(cell_col)
    z = scaled.withColumn("_z", zorder_value(tmp_cols, bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *tmp_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    if stamp_zones:
        stamp_zonemap(df.sparkSession, path, list(zorder_cols), schema=df.schema)


# --- file-level zone maps: clustered writes + pruned range reads ------------

#: sidecar mapping each data file to its per-column [min, max] zone — the
#: Delta/Iceberg data-skipping stats re-expressed over plain parquet.
#: Underscore-prefixed so Spark's file index ignores it.
_ZONEMAP_SIDECAR = "_pcr_zonemap.json"


def _enc_stat(v):
    """JSON-encode one zone bound, tagging non-JSON-native types."""
    import datetime

    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, bytes):  # parquet binary stats for strings
        return v.decode("utf-8", errors="replace")
    return v


def _dec_stat(v):
    import datetime

    if isinstance(v, dict):
        if v.get("t") == "ts":
            return datetime.datetime.fromisoformat(v["v"])
        if v.get("t") == "date":
            return datetime.date.fromisoformat(v["v"])
    return v


def _coerce_bound(b, sample):
    """Normalize a caller-supplied bound to the zone values' type (iso
    strings accepted for date/timestamp zones)."""
    import datetime

    if b is None or sample is None:
        return b
    if isinstance(sample, datetime.datetime) and isinstance(b, str):
        return datetime.datetime.fromisoformat(b)
    if isinstance(sample, datetime.datetime) and isinstance(b, datetime.date) \
            and not isinstance(b, datetime.datetime):
        return datetime.datetime(b.year, b.month, b.day)
    if isinstance(sample, datetime.date) and isinstance(b, str):
        return datetime.date.fromisoformat(b)
    return b


def footer_stats(spark, files: list[str], cols: list[str]) -> dict:
    """Per-file footer metadata {file: {"rows": n, "bytes": b, "cols":
    {col: (lo, hi)}}} read from PARQUET FOOTERS only — metadata IO (KBs per
    file), never a data scan.

    Distributed: the file list parallelizes and each task opens only its
    files' footers (pyarrow), so stats for a 100k-file table cost one tiny
    job, not a table read. Columns with no usable stats (all-null file,
    stats disabled) are omitted — consumers must treat a missing zone as
    unprunable. String zones may be footer-truncated; truncated bounds are
    still valid bounds (parquet widens the max on truncation), so pruning
    stays sound."""
    cols = list(cols)
    paths_df = spark.createDataFrame([(f,) for f in files], "path string")

    def _read_footers(iterator):
        import json as _json

        import pandas as pd
        import pyarrow.parquet as pq

        def _meta(path):
            # resolve non-local URIs (hdfs://, s3a://, file://) through a
            # pyarrow filesystem — a bare ParquetFile(path) only reads the
            # local FS, which breaks exactly at the object-store scale this
            # module targets (ADVICE r10). s3a is Hadoop's scheme name for
            # what pyarrow calls s3.
            if "://" in path:
                from pyarrow import fs as pafs

                uri = path.replace("s3a://", "s3://", 1)
                filesystem, rel = pafs.FileSystem.from_uri(uri)
                return pq.ParquetFile(filesystem.open_input_file(rel)).metadata
            return pq.ParquetFile(path).metadata

        for pdf in iterator:
            out = []
            for path in pdf["path"]:
                meta = _meta(path)
                idx = {
                    meta.schema.column(i).name: i
                    for i in range(meta.num_columns)
                }
                nbytes = sum(
                    meta.row_group(rg).total_byte_size
                    for rg in range(meta.num_row_groups)
                )
                out.append((path, "", str(meta.num_rows), str(nbytes)))
                for c in cols:
                    if c not in idx:
                        continue
                    lo = hi = None
                    ok = True
                    for rg in range(meta.num_row_groups):
                        st = meta.row_group(rg).column(idx[c]).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    if ok and lo is not None:
                        out.append(
                            (
                                path,
                                c,
                                _json.dumps(_enc_stat(lo)),
                                _json.dumps(_enc_stat(hi)),
                            )
                        )
            yield pd.DataFrame(out, columns=["path", "col", "lo", "hi"])

    rows = paths_df.mapInPandas(
        _read_footers, "path string, col string, lo string, hi string"
    ).collect()  # bounded: |files| x (|cols|+1) tiny rows
    import json

    stats: dict = {}
    for r in rows:
        per = stats.setdefault(r["path"], {"rows": 0, "bytes": 0, "cols": {}})
        if r["col"] == "":
            per["rows"] = int(r["lo"])
            per["bytes"] = int(r["hi"])
        else:
            per["cols"][r["col"]] = (
                _dec_stat(json.loads(r["lo"])),
                _dec_stat(json.loads(r["hi"])),
            )
    return stats


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 32,
    extra_stats_cols: list[str] | None = None,
) -> int:
    """Write parquet range-clustered by ``cluster_col`` and stamp file-level
    zone maps — the data-skipping layout for time/range-scanned tables.

    ``repartitionByRange`` gives each file a contiguous, nearly disjoint
    value range (range exchange + sample pass — one shuffle);
    ``sortWithinPartitions`` tightens row-group stats inside each file.
    After the write, one FOOTER-ONLY pass (:func:`footer_stats` — no data
    re-scan) records each file's [min, max] for the cluster column (plus
    ``extra_stats_cols``) in a ``_pcr_zonemap.json`` sidecar;
    :func:`read_range` then opens only the files whose zone overlaps the
    predicate. This is Delta/Iceberg file skipping re-expressed on plain
    parquet: at 100 TB a narrow time-window query reads a handful of
    files, and the pruning decision costs one tiny JSON read, not a
    LIST + footer fetch per query. Returns the number of data files
    written. (Hash-bucketed CDC targets route POINT lookups by key —
    ``manifest_target.read_keys``; this layout serves RANGE scans, where
    hash routing cannot prune.)"""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return stamp_zonemap(
        df.sparkSession,
        path,
        [cluster_col, *(extra_stats_cols or [])],
        cluster_col=cluster_col,
        schema=df.schema,
    )


def stamp_zonemap(
    spark,
    path: str,
    stats_cols: list[str],
    cluster_col: str | None = None,
    schema=None,
    mode: str = "rebuild",
) -> int:
    """Build the ``_pcr_zonemap.json`` sidecar for an existing parquet dir:
    one footer-only pass over its files, per-file [min, max] zones for
    ``stats_cols``. Shared by :func:`write_range_clustered` and
    :func:`write_zordered` (any clustered layout can stamp zones — what
    changes between them is WHICH columns the layout makes prunable).
    Returns the number of data files whose footers were read.

    ``mode="append"`` is the growing-table path: only files NOT yet in
    the existing sidecar get a footer read (new batches of a continuously
    appended table), their zones merge in, and entries for files that no
    longer exist (compacted/vacuumed away) drop out. Stamping cost is
    O(new files) per maintenance call instead of O(table) — the
    difference between a cheap post-append hook and a daily full restamp
    at 100 TB. The stamped schema and cluster_col are kept from the
    existing sidecar (an appended file with evolved columns is simply
    unprunable on them — the read path's missing-zone rule)."""
    import json

    from .manifest_target import _fs

    if mode not in ("rebuild", "append"):
        raise ValueError(f"mode must be 'rebuild' or 'append', got {mode!r}")
    fs, pdir = _fs(spark, path)
    files = [
        str(st.getPath())
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    prior: dict = {}
    if mode == "append":
        _, spath = _fs(spark, f"{path}/{_ZONEMAP_SIDECAR}")
        if not fs.exists(spath):
            raise FileNotFoundError(
                f"no zone-map sidecar at {path} to append to — stamp with "
                "mode='rebuild' first"
            )
        stream = fs.open(spath)
        try:
            old = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
        finally:
            stream.close()
        live = {f.rsplit("/", 1)[-1] for f in files}
        prior = {f: z for f, z in old["files"].items() if f in live}
        cluster_col = old.get("cluster_col")
        schema_doc = old["schema"]
        files = [f for f in files if f.rsplit("/", 1)[-1] not in prior]
    else:
        if schema is None:
            schema = spark.read.parquet(path).schema
        schema_doc = json.loads(schema.json())
    zones = footer_stats(spark, files, stats_cols) if files else {}
    doc = {
        "cluster_col": cluster_col,
        "schema": schema_doc,
        "files": {
            **prior,
            **{
                f.rsplit("/", 1)[-1]: {
                    c: [_enc_stat(lo), _enc_stat(hi)]
                    for c, (lo, hi) in per["cols"].items()
                }
                for f, per in zones.items()
            },
        },
    }
    # tmp + delete + rename (the layout-sidecar idiom, apply.py): single
    # writer owns a clustered copy; torn sidecars must not survive a crash
    _, tmp = _fs(spark, f"{path}/.{_ZONEMAP_SIDECAR}.tmp")
    _, final = _fs(spark, f"{path}/{_ZONEMAP_SIDECAR}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)
    return len(files)


def read_range(
    spark,
    path: str,
    col: str,
    lower=None,
    upper=None,
):
    """Zone-map-pruned range scan over a :func:`write_range_clustered`
    table: open ONLY the files whose stamped [min, max] for ``col``
    overlaps [lower, upper] (either bound may be None → half-open), then
    apply the residual predicate for exactness.

    Pruning is sound regardless of zone quality: a file with no stamped
    zone for ``col`` is always read, a file present in the directory but
    absent from the sidecar entirely (appended since the last stamp) is
    always read, and the residual filter re-checks every surviving row
    (zones can only skip IO, never change results — all-null files are
    skippable because BETWEEN never matches NULL). Returns an empty frame
    with the stamped schema when nothing overlaps. Bounds accept the
    column's native Python type or ISO strings for date/timestamp zones."""
    return read_box(spark, path, {col: (lower, upper)})


def read_box(
    spark,
    path: str,
    predicates: dict,
):
    """Zone-map-pruned scan under a conjunction of range predicates:
    ``predicates = {col: (lower, upper), ...}`` — a file survives only if
    EVERY predicate's window overlaps its stamped zone for that column.
    The multi-dimensional read that pairs with
    ``write_zordered(stamp_zones=True)``: a z-ordered file covers a small
    hyper-rectangle, so a 2-D box intersects far fewer files than either
    1-D window alone. Same soundness contract as :func:`read_range`
    (missing zones are unprunable; residual predicates re-check every
    surviving row)."""
    import json

    from pyspark.sql.types import StructType

    from .manifest_target import _fs

    if not predicates:
        raise ValueError("predicates must be non-empty — use spark.read.parquet "
                         "for a full scan")
    for col, bounds in predicates.items():
        if not (isinstance(bounds, (tuple, list)) and len(bounds) == 2):
            raise ValueError(
                f"predicate for column {col!r} must be a (lower, upper) "
                f"pair, got {bounds!r}"
            )
    fs, spath = _fs(spark, f"{path}/{_ZONEMAP_SIDECAR}")
    if not fs.exists(spath):
        raise FileNotFoundError(
            f"no zone-map sidecar at {path} — write with write_range_clustered "
            "or stamp_zonemap"
        )
    stream = fs.open(spath)
    try:
        doc = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()
    schema = StructType.fromJson(doc["schema"])
    # fail up front with the offending column, not a KeyError/TypeError
    # mid-prune (ADVICE r10): every predicate column must exist in the
    # stamped schema, and bounds must be comparable with its zones
    stamped = {f.name for f in schema.fields}
    for col in predicates:
        if col not in stamped:
            raise ValueError(
                f"predicate column {col!r} is not in the stamped schema; "
                f"stamped columns: {sorted(stamped)}"
            )
    # the missing-zone soundness rule applied at FILE level: a data file
    # the sidecar has never seen (appended since the last stamp) is always
    # read — pruning must only ever SKIP files it has evidence about, or a
    # grown table silently loses its append window until the next
    # stamp_zonemap(mode="append")
    _, pdir = _fs(spark, path)
    live = [
        st.getPath().getName()
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    stamped_files = doc["files"]
    keep = [f for f in live if f not in stamped_files]
    for fname, per in stamped_files.items():
        if fname not in set(live):
            continue  # vacuumed since the last stamp
        ok = True
        for col, (lower, upper) in predicates.items():
            zone = per.get(col)
            if zone is None:
                continue  # unprunable on this column
            lo, hi = _dec_stat(zone[0]), _dec_stat(zone[1])
            try:
                lo_b = _coerce_bound(lower, lo)
                hi_b = _coerce_bound(upper, hi)
                ok = (hi_b is None or lo <= hi_b) and \
                    (lo_b is None or hi >= lo_b)
            except (TypeError, ValueError) as exc:
                bad = lower if upper is None else (lower, upper)
                raise ValueError(
                    f"predicate bound {bad!r} for column {col!r} is not "
                    f"comparable with its {type(lo).__name__} zone values "
                    f"({exc})"
                ) from None
            if not ok:
                break
        if ok:
            keep.append(fname)
    if not keep:
        return spark.createDataFrame([], schema).filter(F.lit(True))
    scan = spark.read.parquet(*[f"{path}/{f}" for f in keep])
    # residual literals are cast to the STAMPED column type — for temporal
    # columns pass ISO strings, which cast session-timezone-independently
    # (a bare python datetime lit is LTZ and would shift under a non-UTC
    # driver session; the repo-wide NTZ gotcha)
    field_dt = {f.name: f.dataType for f in schema.fields}  # validated above

    def _lit(b, dt):
        import datetime

        if isinstance(b, (datetime.date, datetime.datetime)):
            b = b.isoformat()
        return F.lit(b).cast(dt)

    pred = F.lit(True)
    for col, (lower, upper) in predicates.items():
        if lower is not None:
            pred = pred & (F.col(col) >= _lit(lower, field_dt[col]))
        if upper is not None:
            pred = pred & (F.col(col) <= _lit(upper, field_dt[col]))
    return scan.filter(pred)


#: per-file bloom-filter sidecar — the membership twin of the zone map
#: (zones prune RANGE predicates on clustered columns; blooms prune
#: EQUALITY predicates on columns the layout does NOT cluster)
_BLOOM_SIDECAR = "_pcr_bloom.json"


def _bloom_key(v) -> bytes:
    """Canonical hash bytes for a bloom member: integers normalize through
    int() (int8/int16/../numpy widths all hash alike), everything else
    hashes its str(). Floats/temporals work best-effort via str parity;
    the supported contract is int and string key columns."""
    import numpy as np

    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return str(int(v)).encode("utf-8")
    return str(v).encode("utf-8")


def _bloom_bit_positions(key: bytes, m: int, k: int) -> list[int]:
    """k bit indexes via double hashing over one md5 (Kirsch-Mitzenmacher:
    h1 + i*h2 preserves the fpp bound with two base hashes)."""
    import hashlib

    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_params(n: int, fpp: float, max_bits: int) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for n members at fpp, m byte-aligned and
    capped (a cap only raises the file's fpp — pruning stays sound)."""
    import math

    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, min(max_bits, m))
    m = (m + 7) // 8 * 8
    k = max(1, min(16, round(m / max(n, 1) * math.log(2))))
    return m, k


def stamp_bloom(
    spark,
    path: str,
    cols: list[str],
    fpp: float = 0.01,
    max_bits: int = 1 << 23,
    mode: str = "rebuild",
) -> int:
    """Stamp a ``_pcr_bloom.json`` sidecar on an existing parquet dir: one
    distributed pass reads ONLY ``cols`` from each file (column-pruned, no
    full scan) and records a per-file bloom filter of each column's
    distinct values. Returns the number of data files stamped.

    The point-lookup analog of :func:`stamp_zonemap` for columns the
    layout does NOT cluster: on a time-clustered table every file spans
    the full key range, so zones cannot prune ``key = X`` — but each file
    only CONTAINS ~rows/file distinct keys, so a bloom sized at ``fpp``
    skips ~(1-fpp) of the non-matching files. This is Parquet's own
    column-index bloom idea lifted to FILE granularity with the decision
    made from one tiny JSON read — at 100 TB a point probe on a
    secondary column opens O(matching files + fpp x files) instead of
    every file. NULLs are not members (equality never matches NULL, so
    skipping them is sound). Capped at ``max_bits`` per column per file —
    a saturated bloom degrades toward fpp=1 (reads everything), never
    toward a wrong skip.

    ``mode="append"``: only files NOT yet in the existing sidecar are
    read and bloomed (O(new files) per maintenance call on a growing
    table); entries for vacuumed/compacted-away files drop out; fpp and
    the stamped schema are kept from the existing sidecar."""
    import base64
    import json

    from .manifest_target import _fs

    if mode not in ("rebuild", "append"):
        raise ValueError(f"mode must be 'rebuild' or 'append', got {mode!r}")
    fs, pdir = _fs(spark, path)
    files = [
        str(st.getPath())
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    prior: dict = {}
    if mode == "append":
        _, spath = _fs(spark, f"{path}/{_BLOOM_SIDECAR}")
        if not fs.exists(spath):
            raise FileNotFoundError(
                f"no bloom sidecar at {path} to append to — stamp with "
                "mode='rebuild' first"
            )
        stream = fs.open(spath)
        try:
            old = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
        finally:
            stream.close()
        live = {f.rsplit("/", 1)[-1] for f in files}
        prior = {f: b for f, b in old["files"].items() if f in live}
        fpp = old.get("fpp", fpp)
        schema_doc = old["schema"]
        files = [f for f in files if f.rsplit("/", 1)[-1] not in prior]
    else:
        schema = spark.read.parquet(path).schema
        missing = [c for c in cols if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"bloom columns {missing} not in the table schema; "
                f"columns: {schema.fieldNames()}"
            )
        schema_doc = json.loads(schema.json())
    cols = list(cols)
    paths_df = spark.createDataFrame([(f,) for f in files], "path string")

    def _build(iterator):
        import pandas as pd
        import pyarrow.parquet as pq

        def _open(p):
            if "://" in p:
                from pyarrow import fs as pafs

                uri = p.replace("s3a://", "s3://", 1)
                filesystem, rel = pafs.FileSystem.from_uri(uri)
                return pq.ParquetFile(filesystem.open_input_file(rel))
            return pq.ParquetFile(p)

        for pdf in iterator:
            out = []
            for p in pdf["path"]:
                pf = _open(p)
                present = [c for c in cols if c in pf.schema_arrow.names]
                if not present:
                    continue
                tbl = pf.read(columns=present)
                for c in present:
                    vals = tbl.column(c).drop_null().unique().to_pylist()
                    m, k = _bloom_params(max(len(vals), 1), fpp, max_bits)
                    bits = bytearray(m // 8)
                    for v in vals:
                        for pos in _bloom_bit_positions(_bloom_key(v), m, k):
                            bits[pos >> 3] |= 1 << (pos & 7)
                    out.append((
                        p, c, m, k,
                        base64.b64encode(bytes(bits)).decode("ascii"),
                    ))
            yield pd.DataFrame(
                out, columns=["path", "col", "m", "k", "b64"]
            )

    rows = (
        paths_df.mapInPandas(
            _build, "path string, col string, m long, k long, b64 string"
        ).collect()  # bounded: |files| x |cols| rows of m/8-byte blobs
        if files
        else []
    )
    per_file: dict = dict(prior)
    for r in rows:
        per_file.setdefault(r["path"].rsplit("/", 1)[-1], {})[r["col"]] = {
            "m": int(r["m"]), "k": int(r["k"]), "b64": r["b64"],
        }
    doc = {
        "fpp": fpp,
        "schema": schema_doc,
        "files": per_file,
    }
    _, tmp = _fs(spark, f"{path}/.{_BLOOM_SIDECAR}.tmp")
    _, final = _fs(spark, f"{path}/{_BLOOM_SIDECAR}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)
    return len(files)


def read_point(
    spark,
    path: str,
    eq: dict,
):
    """Bloom-pruned point scan: ``eq = {col: value, ...}`` opens only the
    files whose stamped bloom filter MAY contain every value, then
    re-checks survivors with the residual equality filter.

    Soundness is one-directional by construction: a bloom answers
    "definitely absent" or "maybe present", so pruning only ever SKIPS
    files that cannot hold a match (false positives cost extra IO at the
    stamped fpp, never wrong results); a file with no stamped bloom for a
    column is always read, and so is a file the sidecar has never seen
    (appended since the last stamp — the missing-evidence rule at file
    level). Returns an empty frame with the stamped schema when every
    file is excluded. NULL probes are rejected — equality never matches
    NULL, so the query is statically empty."""
    import base64
    import json

    from pyspark.sql.types import StructType

    from .manifest_target import _fs

    if not eq:
        raise ValueError("eq must be non-empty — use spark.read.parquet "
                         "for a full scan")
    for col, v in eq.items():
        if v is None:
            raise ValueError(
                f"probe value for column {col!r} is None — equality never "
                "matches NULL; filter IS NULL on a plain scan instead"
            )
    fs, spath = _fs(spark, f"{path}/{_BLOOM_SIDECAR}")
    if not fs.exists(spath):
        raise FileNotFoundError(
            f"no bloom sidecar at {path} — stamp with stamp_bloom"
        )
    stream = fs.open(spath)
    try:
        doc = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()
    schema = StructType.fromJson(doc["schema"])
    stamped = {f.name for f in schema.fields}
    for col in eq:
        if col not in stamped:
            raise ValueError(
                f"probe column {col!r} is not in the stamped schema; "
                f"stamped columns: {sorted(stamped)}"
            )

    def _may_contain(bloom, v) -> bool:
        m, k = bloom["m"], bloom["k"]
        bits = base64.b64decode(bloom["b64"])
        return all(
            bits[pos >> 3] & (1 << (pos & 7))
            for pos in _bloom_bit_positions(_bloom_key(v), m, k)
        )

    _, pdir = _fs(spark, path)
    live = [
        st.getPath().getName()
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    stamped_files = doc["files"]
    keep = [f for f in live if f not in stamped_files]  # unstamped: read
    for fname, per in stamped_files.items():
        if fname not in set(live):
            continue  # vacuumed since the last stamp
        ok = True
        for col, v in eq.items():
            bloom = per.get(col)
            if bloom is None:
                continue  # unprunable on this column
            if not _may_contain(bloom, v):
                ok = False
                break
        if ok:
            keep.append(fname)
    if not keep:
        return spark.createDataFrame([], schema).filter(F.lit(True))
    scan = spark.read.parquet(*[f"{path}/{f}" for f in keep])
    field_dt = {f.name: f.dataType for f in schema.fields}
    pred = F.lit(True)
    for col, v in eq.items():
        import datetime

        if isinstance(v, (datetime.date, datetime.datetime)):
            v = v.isoformat()
        pred = pred & (F.col(col) == F.lit(v).cast(field_dt[col]))
    return scan.filter(pred)


#: per-file KMV (bottom-k hash) sidecar — table NDV statistics as metadata.
#: Zones answer range prunes, blooms answer point prunes; this answers the
#: PLANNER's question (how many distinct keys live here?) with zero data IO
#: after stamping. Per-file bottom-k lists merge to the EXACT global
#: bottom-k (a file's bottom-k contains every hash of that file that could
#: reach the merged bottom-k), so table- or subset-level estimates carry
#: the full KMV error bound (~1/sqrt(k-2)), not a merge penalty.
_NDV_SIDECAR = "_pcr_ndv.json"


def _kmv_py_hash(v, salt: str) -> int:
    """Python twin of operators.sketches.kmv_hash: md5 over the salted
    string form, first 15 hex digits as a 60-bit int. Integer widths
    normalize through int() so int8/int64/numpy all hash like Spark's
    cast('string'); the supported contract is int and string columns
    (same as the bloom sidecar)."""
    import hashlib

    import numpy as np

    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        s = str(int(v))
    else:
        s = str(v)
    return int(hashlib.md5(f"{salt}:{s}".encode("utf-8")).hexdigest()[:15], 16)


def stamp_ndv(
    spark,
    path: str,
    cols: list[str],
    k: int = 64,
    salt: str = "kmv-v1",
    mode: str = "rebuild",
) -> int:
    """Stamp a ``_pcr_ndv.json`` sidecar on an existing parquet dir: one
    column-pruned distributed pass records each file's bottom-k distinct
    KMV hashes per column. Returns the number of data files stamped.

    The stats sidecar a query planner wants at 100 TB: after one stamping
    pass, "how many distinct keys in this table / this partition's files /
    the files a zone prune selected?" is answered from one tiny JSON read
    (:func:`read_ndv`) — no scan, and the per-file lists are exactly
    mergeable, so ANY file subset gets a sound estimate. A column absent
    from a file's schema contributes nothing, which is CORRECT for NDV
    (those rows hold NULL for the evolved column, and NULLs are not
    distinct members). ``mode="append"`` mirrors the zone/bloom growing-
    table path: only new files are read (O(new files) per maintenance
    call), dead entries drop out, and k/salt/schema carry over from the
    existing sidecar."""
    import json

    from .manifest_target import _fs

    if mode not in ("rebuild", "append"):
        raise ValueError(f"mode must be 'rebuild' or 'append', got {mode!r}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    fs, pdir = _fs(spark, path)
    files = [
        str(st.getPath())
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    prior: dict = {}
    if mode == "append":
        _, spath = _fs(spark, f"{path}/{_NDV_SIDECAR}")
        if not fs.exists(spath):
            raise FileNotFoundError(
                f"no NDV sidecar at {path} to append to — stamp with "
                "mode='rebuild' first"
            )
        stream = fs.open(spath)
        try:
            old = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
        finally:
            stream.close()
        live = {f.rsplit("/", 1)[-1] for f in files}
        prior = {f: e for f, e in old["files"].items() if f in live}
        k = old["k"]
        salt = old["salt"]
        schema_doc = old["schema"]
        files = [f for f in files if f.rsplit("/", 1)[-1] not in prior]
    else:
        schema = spark.read.parquet(path).schema
        missing = [c for c in cols if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"NDV columns {missing} not in the table schema; "
                f"columns: {schema.fieldNames()}"
            )
        schema_doc = json.loads(schema.json())
    cols = list(cols)
    paths_df = spark.createDataFrame([(f,) for f in files], "path string")
    salt_b, k_b = salt, k

    def _build(iterator):
        import heapq
        import json as _json

        import pandas as pd
        import pyarrow.parquet as pq

        def _open(p):
            if "://" in p:
                from pyarrow import fs as pafs

                uri = p.replace("s3a://", "s3://", 1)
                filesystem, rel = pafs.FileSystem.from_uri(uri)
                return pq.ParquetFile(filesystem.open_input_file(rel))
            return pq.ParquetFile(p)

        for pdf in iterator:
            out = []
            for p in pdf["path"]:
                pf = _open(p)
                present = [c for c in cols if c in pf.schema_arrow.names]
                if not present:
                    continue
                tbl = pf.read(columns=present)
                for c in present:
                    vals = tbl.column(c).drop_null().unique().to_pylist()
                    hs = {_kmv_py_hash(v, salt_b) for v in vals}
                    bottom = heapq.nsmallest(k_b, hs)
                    out.append((p, c, _json.dumps(bottom)))
            yield pd.DataFrame(out, columns=["path", "col", "hs"])

    rows = (
        paths_df.mapInPandas(
            _build, "path string, col string, hs string"
        ).collect()  # bounded: |files| x |cols| rows of <=k ints
        if files
        else []
    )
    per_file: dict = dict(prior)
    for r in rows:
        per_file.setdefault(r["path"].rsplit("/", 1)[-1], {})[r["col"]] = (
            json.loads(r["hs"])
        )
    doc = {"k": k, "salt": salt, "schema": schema_doc, "files": per_file}
    _, tmp = _fs(spark, f"{path}/.{_NDV_SIDECAR}.tmp")
    _, final = _fs(spark, f"{path}/{_NDV_SIDECAR}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)
    return len(files)


def read_ndv(
    spark,
    path: str,
    cols: list[str] | None = None,
    files: list[str] | None = None,
):
    """Distinct-count estimates from the ``_pcr_ndv.json`` sidecar ALONE —
    zero data IO. Returns one row per column: (col, n_files, n_hashes,
    kth_hash, est_distinct), where est_distinct is the KMV estimator over
    the merged bottom-k (exact when the merged universe held fewer than k
    hashes). ``files`` restricts the merge to a file subset (e.g. the
    survivors of a zone/bloom prune) — per-file lists merge exactly, so
    subset estimates carry the same error bound. The estimator arithmetic
    is the same fixed-order double math as operators.sketches
    (Python float IS an IEEE double), so results are engine-portable."""
    import heapq
    import json

    from .manifest_target import _fs

    fs, spath = _fs(spark, f"{path}/{_NDV_SIDECAR}")
    if not fs.exists(spath):
        raise FileNotFoundError(
            f"no NDV sidecar at {path} — stamp with stamp_ndv"
        )
    stream = fs.open(spath)
    try:
        doc = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()
    k = doc["k"]
    stamped_cols = sorted(
        {c for per in doc["files"].values() for c in per}
    )
    use_cols = list(cols) if cols is not None else stamped_cols
    bad = [c for c in use_cols if c not in stamped_cols]
    if bad:
        raise ValueError(
            f"columns {bad} are not NDV-stamped; stamped: {stamped_cols}"
        )
    entries = doc["files"]
    if files is not None:
        missing = [f for f in files if f not in entries]
        if missing:
            raise ValueError(
                f"files {missing} are not in the NDV sidecar — re-stamp "
                "(mode='append') after appends"
            )
        entries = {f: entries[f] for f in files}
    rows = []
    for c in use_cols:
        merged: set[int] = set()
        n_files = 0
        for per in entries.values():
            if c in per:
                n_files += 1
                merged.update(per[c])
        bottom = heapq.nsmallest(k, merged)
        n = len(bottom)
        if n == 0:
            est = 0.0
            kth = None
        elif n < k:
            est = float(n)
            kth = bottom[-1]
        else:
            kth = bottom[-1]
            est = float(k - 1) * float(1 << 60) / float(kth)
        rows.append((c, n_files, n, kth, est))
    return spark.createDataFrame(
        rows,
        "col string, n_files long, n_hashes long, kth_hash long, "
        "est_distinct double",
    )


def table_size_stats(spark, path: str, driver_side_max_files: int = 64) -> dict:
    """Total rows / uncompressed bytes / file count for a parquet dir from
    FOOTERS only — the input a cost-based join decision needs when no
    sidecar has been stamped yet.

    Planning must stay interactive: up to ``driver_side_max_files`` the
    footers are read directly on the driver (pyarrow, ~ms per footer — no
    Spark job, no Python-worker spin-up), above that the distributed
    :func:`footer_stats` pass takes over (a 100k-file table's metadata is
    one small job, never a driver loop). Both paths read the same footer
    fields, so the decision is identical either way."""
    from .manifest_target import _fs

    fs, pdir = _fs(spark, path)
    files = [
        str(st.getPath())
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    if len(files) <= driver_side_max_files:
        import pyarrow.parquet as pq

        rows = nbytes = 0
        for f in files:
            local = f[5:] if f.startswith("file:") else f  # file:/p, file:///p
            if "://" in local:
                from pyarrow import fs as pafs

                uri = local.replace("s3a://", "s3://", 1)
                filesystem, rel = pafs.FileSystem.from_uri(uri)
                meta = pq.ParquetFile(filesystem.open_input_file(rel)).metadata
            else:
                meta = pq.ParquetFile(local).metadata
            rows += meta.num_rows
            nbytes += sum(
                meta.row_group(rg).total_byte_size
                for rg in range(meta.num_row_groups)
            )
        return {"n_files": len(files), "rows": rows, "bytes": nbytes}
    per = footer_stats(spark, files, [])
    return {
        "n_files": len(files),
        "rows": sum(p["rows"] for p in per.values()),
        "bytes": sum(p["bytes"] for p in per.values()),
    }


def join_plan(
    spark,
    left_path: str,
    right_path: str,
    left_on: str,
    right_on: str,
    broadcast_bytes: int = 64 << 20,
    target_rows_per_key: int = 2_000_000,
    left_filter: tuple | None = None,
    right_filter: tuple | None = None,
) -> dict:
    """Cost-based join strategy from table METADATA alone — the decision
    Spark's optimizer can't make well over plain parquet dirs (its size
    estimate is compressed file bytes and its NDV knowledge is nothing
    until an ANALYZE scan): pick the broadcast side from footer-exact row/
    byte totals, and read per-key skew risk off the KMV NDV sidecar.

    Decision rules (all metadata, zero data IO):
    - the smaller side broadcasts iff its UNCOMPRESSED footer byte total is
      <= ``broadcast_bytes`` (footer ``total_byte_size`` approximates the
      in-memory relation far better than compressed file size, which is
      what ``spark.sql.autoBroadcastJoinThreshold`` sees);
    - if the join must shuffle instead, each side carrying a
      ``_pcr_ndv.json`` stamp for its join column gets rows-per-key =
      rows / NDV estimated; a key class above ``target_rows_per_key`` gets
      a salt recommendation in exact integer arithmetic (the
      ``skew_report`` formula, but from statistics instead of a
      diagnostic scan).

    Returns ``{"broadcast": "left"|"right"|None, "left": stats, "right":
    stats, "reason": str, "skew": {"left": {...}|None, "right":
    {...}|None} | None}``. :func:`stats_join`
    executes the decision; this function is exposed separately so plans
    can be audited (and pytest-pinned) without running the join.

    ``left_filter``/``right_filter`` = ``(col, lower, upper)`` tells the
    planner the join input is range-FILTERED: the histogram sidecar
    (:func:`stamp_hist`) turns the predicate into an estimated surviving
    row count and the side's bytes scale by est/rows + its hard error
    bound (pessimistic — never under-sizes a broadcast). This is the
    selectivity step real optimizers take: a 10 TB fact filtered to a
    narrow range is often the RIGHT side to broadcast, and whole-table
    stats alone can never see that. A side without a histogram stamp for
    the filter column keeps its unfiltered size (sound, just
    conservative)."""
    ls = table_size_stats(spark, left_path)
    rs = table_size_stats(spark, right_path)

    def _apply_filter(stats, path, flt):
        if flt is None:
            return stats
        col, f_lo, f_hi = flt
        try:
            e = estimate_range_rows(spark, path, col, f_lo, f_hi)
        except FileNotFoundError:
            return stats  # no histogram stamp: keep the unfiltered size
        # pessimistic surviving-row estimate: est + its hard bound, so a
        # broadcast decision can never be fed an undercount
        surv = min(stats["rows"], e["est"] + e["bound"])
        scale = surv / stats["rows"] if stats["rows"] else 1.0
        return {
            **stats,
            "rows": int(surv),
            "bytes": int(stats["bytes"] * scale),
            "filtered": {"col": col, "est": e["est"], "bound": e["bound"]},
        }

    ls = _apply_filter(ls, left_path, left_filter)
    rs = _apply_filter(rs, right_path, right_filter)
    small, small_name = (ls, "left") if ls["bytes"] <= rs["bytes"] else (rs, "right")
    plan: dict = {"left": ls, "right": rs, "skew": None}
    if small["bytes"] <= broadcast_bytes:
        plan["broadcast"] = small_name
        plan["reason"] = (
            f"{small_name} is {small['bytes']}B uncompressed "
            f"(<= {broadcast_bytes}B threshold) — broadcast it; "
            "a broadcast join also cannot skew"
        )
        return plan
    plan["broadcast"] = None
    plan["reason"] = (
        f"both sides exceed {broadcast_bytes}B uncompressed — shuffle join"
    )

    # both shuffled sides can carry hot keys; estimate each where stamped
    def _skew(path, on, stats):
        try:
            ndv_rows = {
                r["col"]: r["est_distinct"]
                for r in read_ndv(spark, path, [on]).collect()
            }
            est_ndv = max(1.0, float(ndv_rows[on]))
        except (FileNotFoundError, ValueError, KeyError):
            return None  # no NDV stamp for the join column
        rows_per_key = int(stats["rows"] / est_ndv)
        q = (rows_per_key - 1) // target_rows_per_key if rows_per_key > 0 else 0
        return {
            "col": on,
            "est_distinct": est_ndv,
            "est_rows_per_key": rows_per_key,
            "salt_factor": q + 1,
            "is_hot": q > 0,
        }

    sides = {
        "left": _skew(left_path, left_on, ls),
        "right": _skew(right_path, right_on, rs),
    }
    if sides["left"] is not None or sides["right"] is not None:
        plan["skew"] = sides
    return plan


def stats_join(
    spark,
    left_path: str,
    right_path: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
    broadcast_bytes: int = 64 << 20,
    target_rows_per_key: int = 2_000_000,
    left_filter: tuple | None = None,
    right_filter: tuple | None = None,
    plan: dict | None = None,
) -> DataFrame:
    """Execute a join between two parquet dirs under :func:`join_plan`'s
    metadata-driven strategy: the chosen small side gets an explicit
    ``broadcast()`` hint (footer-exact sizing — immune to the compressed-
    bytes underestimate/overestimate that makes the auto threshold
    misfire), otherwise the join ships to the shuffle planner with AQE.
    ``left_filter``/``right_filter`` = ``(col, lower, upper)`` both sizes
    the plan (histogram selectivity) AND applies the predicate to the
    scan (pushed down — the filter is a plain range on the read).
    The plan itself is attached as ``df._pcr_join_plan`` for audits.

    ``plan``: a dict previously returned by :func:`join_plan` (or read off
    ``df._pcr_join_plan``). Planning is compile-time work — a caller
    re-executing the same join against unchanged dirs (a dashboard
    refresh, a bench rep) passes the cached plan and pays zero metadata
    IO; omitted, the plan is computed fresh from the current footers."""
    if plan is None:
        plan = join_plan(
            spark,
            left_path,
            right_path,
            left_on,
            right_on,
            broadcast_bytes=broadcast_bytes,
            target_rows_per_key=target_rows_per_key,
            left_filter=left_filter,
            right_filter=right_filter,
        )

    def _filtered(path, flt):
        df = spark.read.parquet(path)
        if flt is None:
            return df
        col, f_lo, f_hi = flt
        if f_lo is not None:
            df = df.filter(F.col(col) >= F.lit(f_lo))
        if f_hi is not None:
            df = df.filter(F.col(col) <= F.lit(f_hi))
        return df

    left = _filtered(left_path, left_filter)
    right = _filtered(right_path, right_filter)
    if plan["broadcast"] == "left":
        left = F.broadcast(left)
    elif plan["broadcast"] == "right":
        right = F.broadcast(right)
    out = left.join(right, left[left_on] == right[right_on], how)
    out._pcr_join_plan = plan
    return out


def compact_clustered(
    spark,
    src_path: str,
    dst_path: str,
    cluster_col: str | None = None,
    n_files: int | None = None,
    target_file_bytes: int = 128 << 20,
) -> dict:
    """Compact a GROWN clustered dir into ``dst_path``: re-cluster every
    row (stamped and unstamped appends alike) by the cluster column and
    restamp every sidecar present at the source. Returns
    ``{"n_files": written, "zonemap": cols|None, "bloom": cols|None,
    "ndv": cols|None}``.

    The small-file answer for plain clustered parquet at 100 TB: each
    streamed/batched append adds files that (a) each pay a task + an open
    at read time and (b) overlap the cluster range arbitrarily, so zone
    prunes degrade toward read-everything as appends accumulate.
    Compaction restores the invariant the layout's pruning lives on —
    few, large, range-disjoint files — and re-stamps zones/blooms/NDV so
    the sidecars describe exactly the new files. Sidecar parameters
    (cluster col, stamped columns, bloom fpp, NDV k/salt) carry over from
    the source sidecars.

    Same no-data-loss contract as semantic_index_compact: the destination
    must be a NEW (or empty) path — compacting in place over live readers
    has no atomic cutover on plain parquet; callers swap paths at the
    manifest/config layer above."""
    import json

    from .manifest_target import _fs

    fs, dpath = _fs(spark, dst_path)
    if fs.exists(dpath) and fs.listStatus(dpath):
        raise ValueError(
            f"destination {dst_path} already exists and is non-empty — "
            "compact to a new path and swap at the layer above"
        )

    def _sidecar(name):
        fs_, spath = _fs(spark, f"{src_path}/{name}")
        if not fs_.exists(spath):
            return None
        stream = fs_.open(spath)
        try:
            return json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
        finally:
            stream.close()

    zdoc = _sidecar(_ZONEMAP_SIDECAR)
    bdoc = _sidecar(_BLOOM_SIDECAR)
    ndoc = _sidecar(_NDV_SIDECAR)
    if cluster_col is None:
        cluster_col = (zdoc or {}).get("cluster_col")
        if cluster_col is None:
            raise ValueError(
                "cluster_col not given and no zone-map sidecar records one "
                f"at {src_path}"
            )
    df = spark.read.parquet(src_path)
    if cluster_col not in df.columns:
        raise ValueError(
            f"cluster column {cluster_col!r} not in the table; "
            f"columns: {df.columns}"
        )
    if n_files is None:
        _, sdir = _fs(spark, src_path)
        total = sum(
            st.getLen()
            for st in fs.listStatus(sdir)
            if st.getPath().getName().endswith(".parquet")
        )
        n_files = max(1, -(-total // target_file_bytes))
    (
        df.repartitionByRange(int(n_files), F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    out = {"n_files": None, "zonemap": None, "bloom": None, "ndv": None}
    _, ddir = _fs(spark, dst_path)
    out["n_files"] = sum(
        1
        for st in fs.listStatus(ddir)
        if st.getPath().getName().endswith(".parquet")
    )
    if zdoc is not None:
        cols = sorted({c for per in zdoc["files"].values() for c in per})
        cols = cols or [cluster_col]
        stamp_zonemap(spark, dst_path, cols, cluster_col=cluster_col)
        out["zonemap"] = cols
    if bdoc is not None:
        cols = sorted({c for per in bdoc["files"].values() for c in per})
        if cols:
            stamp_bloom(spark, dst_path, cols, fpp=bdoc.get("fpp", 0.01))
            out["bloom"] = cols
    if ndoc is not None:
        cols = sorted({c for per in ndoc["files"].values() for c in per})
        if cols:
            stamp_ndv(
                spark, dst_path, cols, k=ndoc["k"], salt=ndoc["salt"]
            )
            out["ndv"] = cols
    return out


#: per-file equi-depth histogram sidecar — the SELECTIVITY statistics tier.
#: Zones answer "can this file match at all", blooms "does this key live
#: here", KMV "how many distinct keys"; histograms answer the planner's
#: remaining question: "how MANY rows does this range predicate select?" —
#: the row-count estimate that sizes a filtered join input without
#: scanning it.
_HIST_SIDECAR = "_pcr_hist.json"


def stamp_hist(
    spark,
    path: str,
    cols: list[str],
    buckets: int = 16,
    mode: str = "rebuild",
) -> int:
    """Stamp a ``_pcr_hist.json`` sidecar: per file and column, EXACT
    equi-depth bucket boundaries (the sorted column's values at positions
    ``floor(i*n/k)``) plus exact per-bucket row counts. One column-pruned
    distributed pass (the stamp_ndv shape); numeric columns only (ints,
    floats — range selectivity over strings is a different estimator).

    Per-file histograms are the mergeable form: any file subset's estimate
    is the sum of its members' estimates, so the same sidecar serves the
    whole table, a partition, or the survivors of a zone prune.
    ``mode="append"`` mirrors the other sidecars' growing-table path
    (only new files pay a read; dead entries drop; k carries over)."""
    import json

    from .manifest_target import _fs

    if mode not in ("rebuild", "append"):
        raise ValueError(f"mode must be 'rebuild' or 'append', got {mode!r}")
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    fs, pdir = _fs(spark, path)
    files = [
        str(st.getPath())
        for st in fs.listStatus(pdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    prior: dict = {}
    if mode == "append":
        _, spath = _fs(spark, f"{path}/{_HIST_SIDECAR}")
        if not fs.exists(spath):
            raise FileNotFoundError(
                f"no histogram sidecar at {path} to append to — stamp with "
                "mode='rebuild' first"
            )
        stream = fs.open(spath)
        try:
            old = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
        finally:
            stream.close()
        live = {f.rsplit("/", 1)[-1] for f in files}
        prior = {f: e for f, e in old["files"].items() if f in live}
        buckets = old["buckets"]
        files = [f for f in files if f.rsplit("/", 1)[-1] not in prior]
    else:
        schema = spark.read.parquet(path).schema
        numeric = {
            f.name
            for f in schema.fields
            if f.dataType.typeName()
            in ("byte", "short", "integer", "long", "float", "double",
                "decimal")
        }
        bad = [c for c in cols if c not in numeric]
        if bad:
            raise ValueError(
                f"histogram columns must be numeric; {bad} are not "
                f"(numeric columns: {sorted(numeric)})"
            )
    cols = list(cols)
    paths_df = spark.createDataFrame([(f,) for f in files], "path string")
    k_b = buckets

    def _build(iterator):
        import json as _json

        import pandas as pd
        import pyarrow.parquet as pq

        def _open(p):
            if "://" in p:
                from pyarrow import fs as pafs

                uri = p.replace("s3a://", "s3://", 1)
                filesystem, rel = pafs.FileSystem.from_uri(uri)
                return pq.ParquetFile(filesystem.open_input_file(rel))
            return pq.ParquetFile(p)

        for pdf in iterator:
            out = []
            for p in pdf["path"]:
                pf = _open(p)
                present = [c for c in cols if c in pf.schema_arrow.names]
                if not present:
                    continue
                tbl = pf.read(columns=present)
                for c in present:
                    vals = tbl.column(c).drop_null().to_pandas().sort_values(
                        ignore_index=True
                    )
                    n = len(vals)
                    if n == 0:
                        continue
                    # boundaries at floor(i*n/k), i=0..k (last = max);
                    # counts are the exact position diffs -> equi-depth
                    pos = [min(i * n // k_b, n - 1) for i in range(k_b)] + [
                        n - 1
                    ]
                    bounds = [float(vals[i]) for i in pos]
                    edges = [i * n // k_b for i in range(k_b + 1)]
                    counts = [edges[i + 1] - edges[i] for i in range(k_b)]
                    out.append(
                        (p, c, _json.dumps({"b": bounds, "n": counts}))
                    )
            yield pd.DataFrame(out, columns=["path", "col", "h"])

    rows = (
        paths_df.mapInPandas(_build, "path string, col string, h string")
        .collect()  # bounded: |files| x |cols| rows of <=k+1 floats
        if files
        else []
    )
    import json

    per_file: dict = dict(prior)
    for r in rows:
        per_file.setdefault(r["path"].rsplit("/", 1)[-1], {})[r["col"]] = (
            json.loads(r["h"])
        )
    doc = {"buckets": buckets, "files": per_file}
    _, tmp = _fs(spark, f"{path}/.{_HIST_SIDECAR}.tmp")
    _, final = _fs(spark, f"{path}/{_HIST_SIDECAR}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()
    fs.delete(final, False)
    fs.rename(tmp, final)
    return len(files)


def estimate_range_rows(
    spark, path: str, col: str, lower=None, upper=None
) -> dict:
    """Selectivity estimate for ``lower <= col <= upper`` from the
    histogram sidecar ALONE — zero data IO.

    Per file, each bucket contributes its row count times the fraction of
    its [lo, hi) span the predicate covers (uniform-within-bucket, the
    classic equi-depth estimator); a degenerate bucket (lo == hi, heavy
    duplicates) contributes all-or-nothing. Returns ``{"est": float,
    "bound": float, "n_files": int}`` where ``bound`` is a HARD error
    bound, not a confidence interval: the true count can differ from the
    estimate only inside partially-covered buckets, and each contributes
    at most its own count — |true - est| <= sum of partial buckets'
    counts. Fixed-order Python-double arithmetic end-to-end, so the
    estimate is reproducible anywhere."""
    import json

    from .manifest_target import _fs

    fs, spath = _fs(spark, f"{path}/{_HIST_SIDECAR}")
    if not fs.exists(spath):
        raise FileNotFoundError(
            f"no histogram sidecar at {path} — stamp with stamp_hist"
        )
    stream = fs.open(spath)
    try:
        doc = json.loads(bytes(stream.readAllBytes()).decode("utf-8"))
    finally:
        stream.close()
    lo = float("-inf") if lower is None else float(lower)
    hi = float("inf") if upper is None else float(upper)
    if lo > hi:
        raise ValueError(f"lower {lower} exceeds upper {upper}")
    est = 0.0
    bound = 0.0
    n_files = 0
    for per in doc["files"].values():
        h = per.get(col)
        if h is None:
            continue
        n_files += 1
        bounds, counts = h["b"], h["n"]
        for i, cnt in enumerate(counts):
            b_lo, b_hi = bounds[i], bounds[i + 1]
            if b_hi < lo or b_lo > hi:
                continue  # no intersection: contributes nothing, exactly
            if b_lo >= lo and b_hi <= hi:
                est += cnt  # fully covered: contributes everything, exactly
                continue
            # partial cover. The uniform-within-bucket fraction is the
            # estimate; the WHOLE bucket goes into the bound — mass can
            # concentrate at an endpoint the fraction gives measure zero
            # (a [x, 7] bucket probed with [7, 7] truly holds its 7s), so
            # any partially-covered bucket can be off by its full count.
            if b_hi > b_lo:
                frac = (min(hi, b_hi) - max(lo, b_lo)) / (b_hi - b_lo)
                est += cnt * min(1.0, max(0.0, frac))
            bound += cnt
    return {"est": est, "bound": bound, "n_files": n_files}


def prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    mode: str = "coarse",
    n_buckets: int = 1 << 20,
    n_hashes: int = 2,
) -> DataFrame:
    """Runtime-filter join: prune the BIG side by the small side's key
    membership BEFORE the big side's shuffle — the pattern Spark's AQE
    bloom-filter injection (spark.sql.optimizer.runtime.bloomFilter.*)
    applies opportunistically, expressed as an explicit operator with
    deterministic memory bounds (AQE only injects when its stats line up;
    a pipeline that NEEDS the pruning can't leave it to chance).

    Lossless by construction for ``how`` in (inner, left_semi): both
    filters pass a SUPERSET of the matching keys, and the exact join
    removes the false positives — result is value-identical to the plain
    join (pytest-pinned and oracle-checked).

    mode="exact": broadcast the small side's DISTINCT key set and
    left-semi the big side against it. Zero false positives; memory is
    O(NDV(small keys)) — the right call when the key set fits a broadcast
    even if the full small rows don't (wide dims).

    mode="coarse": a bloom filter expressed relationally — ``n_hashes``
    independent xxhash64 bucket sets of ``n_buckets`` each; a big-side row
    survives only if EVERY hash lands in an occupied bucket. Memory is
    O(min(NDV, n_buckets)) LONGs per hash regardless of key width or NDV;
    false-positive rate ~ occupancy^n_hashes. All whole-stage-codegen
    expressions (xxhash64 + pmod + broadcast semi-join), no UDF, no
    driver-side bitmap. SIZE n_buckets >= ~16x NDV(small keys) or the
    buckets saturate and nothing prunes (measured: 30k keys into 4096
    buckets = occupancy 1.0, zero pruning; into 2^19 = 5.5% per hash,
    ~0.3% false-pass at n_hashes=2) — the NDV sidecar (stamp_ndv/read_ndv)
    is the cheap way to know NDV before picking. Saturation degrades
    toward no-pruning, never toward wrong results.

    The shuffle win: with a SortMergeJoin big x small (small too big to
    broadcast in full), the big side's Exchange carries only
    matching + fpp x big rows instead of all of them. With a broadcast-able
    small side the pre-filter is pointless — use the plain join.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"prefilter_join supports inner/left_semi (lossless), got {how!r}"
            " — outer joins must keep non-matching big rows"
        )
    if mode not in ("exact", "coarse"):
        raise ValueError(f"mode must be exact|coarse, got {mode!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if mode == "exact":
        kset = small.select(*keys).distinct()
        filtered = big.join(F.broadcast(kset), keys, "left_semi")
    else:
        if n_buckets < 2 or n_hashes < 1:
            raise ValueError("n_buckets must be >= 2 and n_hashes >= 1")
        filtered = big
        for i in range(n_hashes):
            b = F.pmod(
                F.xxhash64(*[F.col(k) for k in keys], F.lit(i)),
                F.lit(n_buckets),
            )
            occupied = small.select(b.alias("_pb")).distinct()
            filtered = filtered.join(
                F.broadcast(occupied),
                b == F.col("_pb"),
                "left_semi",
            )
    return filtered.join(small, keys, how)
