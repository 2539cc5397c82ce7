"""One-off: run the round-5 driver window (first 50 names) against the
DuckDB oracle at sf0.01 — the same SF the driver uses."""
import sys, time, traceback
sys.path.insert(0, ".")
import __spark_entry__ as e
from load_datawarehouse_spark.session import get_spark
from tests.oracle_harness import compare_query, duckdb_connect

SF = "/root/testdata/sf0.01"
spark = get_spark(app_name="window-check")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb_connect(SF)
q, o = e._registry()
names = list(q)[:50]
fails = []
for name in names:
    t0 = time.time()
    try:
        df = q[name](spark, SF)
        if o.get(name) is None:
            n = df.count()
            status = f"rows-only {n}"
        else:
            compare_query(df, con, o[name], name)
            status = "ok"
    except Exception as ex:
        status = "FAIL"
        fails.append(name)
        traceback.print_exc()
    print(f"{name}: {status} ({time.time()-t0:.1f}s)", flush=True)
print("FAILS:", fails)
