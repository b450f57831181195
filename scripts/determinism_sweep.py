"""Whole-registry determinism sweep: run every registered query twice —
(local[3], shuffle.partitions=5) vs (local[16], 32) — and compare full
sorted result sets. Partition-count/parallelism invariance is the
property the driver's value-hash gate silently depends on: a query whose
output changes with partitioning (unstable tie-break, float summation
order leaking into a rounded column, first()-style nondeterminism) will
flake the correctness gate even though each individual run looks fine.

Round-7 result: 148/148 bit-identical at sf0.001 (recorded in NOTES_r7),
and 148/148 on each of the three DIRTY corpora (dirty text, numeric dirt,
planted skew — scripts/dirty_determinism_sweep_r7.py), which is the harder
property: dirty data CREATES the ordering ties (duplicate LSNs/seqs/
timestamps) whose arrival-order resolution is the classic source of
partition-dependence. Run after adding any query with ordering, sampling,
or float rounding.

Usage: python scripts/determinism_sweep.py [corpus_dir]
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

def run_all(parts, master, sf):
    spark = (SparkSession.builder.master(master)
             .config("spark.sql.shuffle.partitions", str(parts))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    import __spark_entry__ as E
    qs = E.queries()
    out = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf)
            # canonicalize values to repr for COMPARISON, not just sorting:
            # Python's nan != nan, so a tuple containing NaN never equals
            # its bit-identical twin — on dirty corpora that flagged 11
            # false mismatches whose only_a/only_b printed the same rows
            rows = sorted(
                tuple(repr(x) for x in t) for t in map(tuple, df.collect())
            )
            out[name] = (tuple(sorted(df.columns)), rows)
        except Exception as e:
            out[name] = ("ERR", f"{type(e).__name__}: {str(e)[:100]}")
    spark.stop()
    return out


def compare(sf):
    a = run_all(5, "local[3]", sf)
    b = run_all(32, "local[16]", sf)
    diff = [n for n in a if a[n] != b[n]]
    print(f"corpus: {sf}  queries: {len(a)}  mismatches: {len(diff)}")
    for n in diff:
        print("MISMATCH", n)
        ra, rb = a[n][1], b[n][1]
        if ra == "ERR" or isinstance(ra, str) or isinstance(rb, str):
            print("  a:", str(a[n])[:200]); print("  b:", str(b[n])[:200]); continue
        only_a = [r for r in ra if r not in rb][:3]
        only_b = [r for r in rb if r not in ra][:3]
        print("  only_a:", only_a); print("  only_b:", only_b)
    return diff


if __name__ == "__main__":
    compare(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
