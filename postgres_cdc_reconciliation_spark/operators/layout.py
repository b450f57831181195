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
