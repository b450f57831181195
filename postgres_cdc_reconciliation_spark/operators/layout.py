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
