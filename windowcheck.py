"""Verify a slice of the driver correctness window (__spark_entry__._FIRST_NAMES)
against the DuckDB oracles under the driver's exact conditions: a VANILLA
SparkSession (no engine configs) at sf0.01.

Usage:  python windowcheck.py [START [END]]
        python windowcheck.py            # head-50 (the live driver window)
        python windowcheck.py 50 130     # the staged next-round windows

Used each round to certify a rotation before it is committed, so a driver
sweep can never consume an unverified window."""
import sys, time, traceback

sys.path.insert(0, ".")
import __spark_entry__ as e
from tests.oracle_harness import compare_query, duckdb_connect

from load_datawarehouse_spark.ops._util import release_lineage_cuts

start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
end = int(sys.argv[2]) if len(sys.argv) > 2 else start + 50

SF = "/root/testdata/sf0.01"
from pyspark.sql import SparkSession

# the driver builds its own plain session — mirror that, not get_spark()
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb_connect(SF)
q, o = e._registry()
names = [n for n in e._FIRST_NAMES[start:end] if n in q]
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
    except Exception:
        status = "FAIL"
        fails.append(name)
        traceback.print_exc()
    # per-query epilogue: compare_query releases lineage-cut persists
    # itself; this covers the rows-only and FAIL paths too
    release_lineage_cuts()
    print(f"{name}: {status} ({time.time()-t0:.1f}s)", flush=True)
print(f"checked {len(names)} window names [{start}:{end}]  FAILS: {fails}")
