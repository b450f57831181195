"""Whole-registry determinism sweep: run every registered query twice —
(local[3], shuffle.partitions=5) vs (local[16], 32) — and compare full
sorted result sets. Partition-count/parallelism invariance is the
property the driver's value-hash gate silently depends on: a query whose
output changes with partitioning (unstable tie-break, float summation
order leaking into a rounded column, first()-style nondeterminism) will
flake the correctness gate even though each individual run looks fine.

Round-7 result: 148/148 bit-identical at sf0.001 (recorded in NOTES_r7).
Run after adding any query with ordering, sampling, or float rounding.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

def run_all(parts, master):
    spark = (SparkSession.builder.master(master)
             .config("spark.sql.shuffle.partitions", str(parts))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    import __spark_entry__ as E
    qs = E.queries()
    out = {}
    sf = "/root/testdata/sf0.001"
    for name, fn in qs.items():
        try:
            df = fn(spark, sf)
            rows = sorted(map(tuple, df.collect()), key=lambda t: tuple(str(x) for x in t))
            out[name] = (tuple(sorted(df.columns)), rows)
        except Exception as e:
            out[name] = ("ERR", f"{type(e).__name__}: {str(e)[:100]}")
    spark.stop()
    return out

a = run_all(5, "local[3]")
b = run_all(32, "local[16]")
diff = [n for n in a if a[n] != b[n]]
print("queries:", len(a), "mismatches:", len(diff))
for n in diff:
    print("MISMATCH", n)
    ra, rb = a[n][1], b[n][1]
    if ra == "ERR" or isinstance(ra, str) or isinstance(rb, str):
        print("  a:", str(a[n])[:200]); print("  b:", str(b[n])[:200]); continue
    only_a = [r for r in ra if r not in rb][:3]
    only_b = [r for r in rb if r not in ra][:3]
    print("  only_a:", only_a); print("  only_b:", only_b)
