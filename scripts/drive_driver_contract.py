"""Driver simulation: import __spark_entry__ the way the harness does,
run entry() smoke + full queries()/oracle_sql() compare at sf0.01."""
import sys, time, math
import duckdb, pandas as pd
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E

from pyspark.sql import SparkSession
# deliberately a DRIVER-LIKE session (not our get_spark): defaults, no NTZ conf
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false").appName("driver-sim").getOrCreate())

t0=time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()[:200]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

SF="/root/testdata/sf0.01"
qs, os_ = E.queries(), E.oracle_sql()
print(f"queries={len(qs)} oracles={len(os_)}")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(p):
    p = p.reindex(sorted(p.columns), axis=1)
    return p.sort_values(by=list(p.columns), ignore_index=True, na_position="last")

only = set(sys.argv[1:])  # optional subset: script.py q_a q_b (default: all)
if only:
    unknown = only - set(qs)
    assert not unknown, f"unknown queries: {unknown}"

fails=[]
for name in sorted(only or qs):
    t0=time.time()
    try:
        sp = qs[name](spark, SF).toPandas()
        if name not in os_:
            print(f"  {name}: rows-only {len(sp)} rows  {time.time()-t0:.1f}s"); continue
        dk = con.execute(os_[name]).fetchdf()
        ok = sorted(sp.columns)==sorted(dk.columns) and len(sp)==len(dk)
        detail=""
        if ok:
            a,b=norm(sp),norm(dk)
            for c in a.columns:
                av,bv=a[c],b[c]
                if av.dtype.kind=="f" or bv.dtype.kind=="f":
                    av,bv=av.astype(float),bv.astype(float)
                    eq = all((math.isnan(x) and math.isnan(y)) if (isinstance(x,float) and math.isnan(x)) or (isinstance(y,float) and math.isnan(y)) else x==y for x,y in zip(av,bv))
                else:
                    eq = av.astype(object).where(pd.notna(av),None).tolist()==bv.astype(object).where(pd.notna(bv),None).tolist()
                if not eq: ok=False; detail=f"col {c} differs"; break
        else:
            detail=f"shape {sp.shape} vs {dk.shape} cols {sorted(sp.columns)[:5]}|{sorted(dk.columns)[:5]}"
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH '+detail}  {len(sp)} rows  {time.time()-t0:.1f}s")
        if not ok: fails.append(name)
    except Exception as ex:
        print(f"  {name}: ERROR {type(ex).__name__}: {str(ex)[:150]}"); fails.append(name)
checked = sorted(only or qs)
n_oracled = sum(1 for n in checked if n in os_)
print(
    f"SUMMARY: {len(checked)} checked, {n_oracled - len(fails)} MATCH, "
    f"{len(checked) - n_oracled} rows-only, {len(fails)} fail"
)
print("FAILS:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
