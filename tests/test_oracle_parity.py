"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet testdata, then compares row count + column names + values
(order-insensitive, exact for non-floats, bit-exact expected for floats —
a float tolerance failure here predicts a driver hash mismatch).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from postgres_cdc_reconciliation_spark.plans.registry import all_queries

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c])
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def compare(name, spark_pdf, duck_pdf):
    assert sorted(spark_pdf.columns) == sorted(
        duck_pdf.columns
    ), f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    assert len(spark_pdf) == len(
        duck_pdf
    ), f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            for i, (x, y) in enumerate(zip(av, bv)):
                both_nan = (x is None or (isinstance(x, float) and math.isnan(x))) and (
                    y is None or (isinstance(y, float) and math.isnan(y))
                )
                if both_nan:
                    continue
                assert x == y, f"{name}: col {c} row {i}: {x!r} != {y!r} (float, driver hash would differ)"
        else:
            mism = av.astype(object).where(pd.notna(av), None).tolist() != bv.astype(
                object
            ).where(pd.notna(bv), None).tolist()
            if mism:
                diff_idx = [
                    i
                    for i, (x, y) in enumerate(
                        zip(
                            av.astype(object).where(pd.notna(av), None),
                            bv.astype(object).where(pd.notna(bv), None),
                        )
                    )
                    if x != y
                ][:5]
                sample = [(i, av.iloc[i], bv.iloc[i]) for i in diff_idx]
                raise AssertionError(f"{name}: col {c} differs, sample {sample}")


SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_parity(name, spark, sf_dir):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors driver
        return
    con = duck_con(sf_dir)
    ddf = con.execute(spec.oracle).fetchdf()
    compare(name, sdf, ddf)
