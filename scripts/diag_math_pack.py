"""Per-row diff of q_math_pack: Spark vs DuckDB at sf0.01.

Finds which column's values differ (the driver reported rows+schema green but
hash red), and for rounded columns reports the margin to the nearest
.5e-6 rounding boundary.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from postgres_cdc_reconciliation_spark.session import get_spark
from postgres_cdc_reconciliation_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.01"

spark = get_spark()
spec = all_queries()["q_math_pack"]
spark_df = spec.fn(spark, SF).toPandas().sort_values("s_suppkey").reset_index(drop=True)

con = duckdb.connect()
con.execute(f"CREATE VIEW supplier AS SELECT * FROM read_parquet('{SF}/supplier.parquet')")
oracle_df = con.execute(spec.oracle).df().sort_values("s_suppkey").reset_index(drop=True)

print("spark dtypes:", dict(spark_df.dtypes.astype(str)))
print("oracle dtypes:", dict(oracle_df.dtypes.astype(str)))

for col in spark_df.columns:
    s = spark_df[col]
    o = oracle_df[col]
    neq = s != o
    # nan-safe
    both_nan = s.isna() & o.isna()
    neq = neq & ~both_nan
    if neq.any():
        idx = neq[neq].index[:10]
        print(f"\nCOLUMN {col}: {neq.sum()} mismatches")
        for i in idx:
            sv, ov = s[i], o[i]
            print(f"  row s_suppkey={spark_df['s_suppkey'][i]}: spark={sv!r} oracle={ov!r} diff={float(sv)-float(ov) if pd.notna(sv) and pd.notna(ov) else 'NA'}")
    else:
        print(f"COLUMN {col}: OK")
spark.stop()
