"""[EXT] Incremental view maintenance under CDC deltas: keep derived
AGGREGATE and JOIN views current by touching only what a change batch
touched, never recomputing the base.

The reference applies CDC into base tables and reconciles THEM
(jdbc-sink upsert/delete semantics, apply.py); every derived artifact —
per-customer rollups, fact x dim join tables — is left to full recompute.
At 100 TB that recompute IS the cost: a nightly groupBy over the whole
fact table to refresh a dashboard the CDC feed changed 0.01% of. These
operators maintain the view from the delta:

- **aggregate views** (`build_agg_view` / `maintain_agg_view`): the
  classic retraction form. For each key the batch touches, subtract the
  key's OLD contribution (one join of batch keys against the
  before-state) and add its NEW contribution (the after-image). Net
  per-group deltas then merge into the view with one outer join on the
  group — work scales with |touched keys| + |touched groups|, not |base|.
  Count-to-zero groups drop (a view never carries empty groups), so
  insert/update/delete all reduce to the same subtract-add plan.
- **join views** (`build_join_view` / `maintain_join_view`): a fact x dim
  equi-join keyed by the fact key. Touched fact keys anti-join out of the
  view; upsert after-images re-join against the dim and union in — the
  scoped-recompute form (only changed keys re-join). The dim must be
  unique on the join key (the dimension contract); fact-side churn is the
  CDC-heavy side this maintains incrementally.

Exactness contract: aggregate views sum in whatever type the caller
feeds; feed DECIMAL for money (the repo-wide exact-money convention) and
maintained sums equal full-recompute sums EXACTLY in any delta order —
the fixpoint tests/test_ivm.py pins, and what makes the registered
queries oracle-checkable (a float running sum would drift by summation
order). Delta ordering inside a batch follows the apply contract:
latest-per-key by LSN wins (operators/apply.py::latest_per_key), 'd'
deletes, anything else upserts the after-image.

Scale notes: the batch side of every join here is batch-sized —
broadcastable — so maintenance is map-shaped over the view/base scans it
must touch; pair the before-state lookup with a bucketed manifest target
(manifest_target.read_keys) to make it O(touched buckets) instead of a
base scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .apply import latest_per_key

_AUDIT_COLS = ("op", "source_lsn", "ts_ms", "__deleted")


def build_agg_view(
    base: DataFrame, group_col: str, sum_cols: list[str]
) -> DataFrame:
    """Materialize the aggregate view ``maintain_agg_view`` keeps current:
    (group_col, n_rows, sum_<c>...). n_rows is the retraction ledger —
    it is what lets a maintained view know when a group emptied."""
    return base.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def maintain_agg_view(
    view: DataFrame,
    base_before: DataFrame,
    events: DataFrame,
    key_cols: list[str],
    group_col: str,
    sum_cols: list[str],
    lsn_col: str = "source_lsn",
    op_col: str = "op",
    lsn_is_text: bool = True,
) -> DataFrame:
    """Apply one change batch to an aggregate view WITHOUT touching the
    untouched base: per-key retractions from ``base_before`` (the base
    state the batch applies to — scope it with a keyed point-lookup at
    scale), additions from the after-images, one outer-join merge on the
    group. Returns the new view; groups whose n_rows reaches 0 drop.
    Maintained == rebuilt from the applied base, exactly, for exact sum
    types (decimal/integer)."""
    latest = latest_per_key(
        events, key_cols, lsn_col=lsn_col, lsn_is_text=lsn_is_text
    )
    touched = latest.select(*key_cols)
    old = base_before.join(touched, key_cols, "inner").select(
        F.col(group_col).alias("_g"),
        F.lit(-1).cast("long").alias("_dn"),
        *[(-F.col(c)).alias(f"_ds_{c}") for c in sum_cols],
    )
    new = latest.filter(F.col(op_col) != "d").select(
        F.col(group_col).alias("_g"),
        F.lit(1).cast("long").alias("_dn"),
        *[F.col(c).alias(f"_ds_{c}") for c in sum_cols],
    )
    deltas = (
        old.unionByName(new)
        .groupBy("_g")
        .agg(
            F.sum("_dn").alias("_dn"),
            *[F.sum(f"_ds_{c}").alias(f"_ds_{c}") for c in sum_cols],
        )
    )
    field_types = {f.name: f.dataType for f in view.schema.fields}
    merged = view.join(
        deltas, view[group_col] == deltas["_g"], "full_outer"
    ).select(
        F.coalesce(view[group_col], deltas["_g"]).alias(group_col),
        (
            F.coalesce(view["n_rows"], F.lit(0))
            + F.coalesce(deltas["_dn"], F.lit(0))
        ).cast("long").alias("n_rows"),
        *[
            (
                F.coalesce(view[f"sum_{c}"], F.lit(0))
                + F.coalesce(deltas[f"_ds_{c}"], F.lit(0))
            ).cast(field_types[f"sum_{c}"]).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.filter(F.col("n_rows") > 0)


def build_join_view(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Materialize the fact x dim join view ``maintain_join_view`` keeps
    current. The dim must be unique on ``on`` (dimension contract), so
    the view stays keyed by the fact key."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return fact.join(dim, on, how)


def maintain_join_view(
    view: DataFrame,
    events: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    on: str,
    how: str = "inner",
    lsn_col: str = "source_lsn",
    op_col: str = "op",
    drop_cols: tuple[str, ...] = _AUDIT_COLS,
    lsn_is_text: bool = True,
) -> DataFrame:
    """Apply one fact-side change batch to a join view: touched fact keys
    anti-join out, upsert after-images re-join the dim and union in —
    only changed keys pay a join. Inner semantics drop an upsert whose
    new foreign key has no dim match (and therefore also handle
    fk-retargeting); left keeps it with NULL dim columns. Dim-side
    changes are the rebuild case (every fact row referencing the changed
    dim key is affected) — re-run build_join_view scoped to those dim
    keys instead."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    latest = latest_per_key(
        events, key_cols, lsn_col=lsn_col, lsn_is_text=lsn_is_text
    )
    touched = latest.select(*key_cols)
    upserts = latest.filter(F.col(op_col) != "d").drop(*drop_cols)
    fresh = upserts.join(dim, on, how)
    untouched = view.join(touched, key_cols, "left_anti")
    aligned = fresh.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in view.schema.fields
        ]
    )
    # the anti-join moves key_cols to the front; restore the view's own
    # column order so maintained views chain without re-selecting
    return untouched.unionByName(aligned).select(*view.columns)
