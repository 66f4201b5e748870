"""Driver simulation: vanilla SparkSession (non-UTC tz to be hostile),
import __spark_entry__, smoke entry(), diff every oracle query.

Usage: python tools/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
The project verify skill runs this before every commit."""
import os
import sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "America/New_York")  # hostile
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

sys.path.insert(0, os.path.join(REPO, "tests"))
from oracle_harness import compare

qs, os_ = e.queries(), e.oracle_sql()
print(f"{len(qs)} queries, {len(os_)} oracles")
fails = []
for name in sorted(os_):
    try:
        compare(qs[name](spark, SF_DIR), con.sql(os_[name]), name)
        print(f"  OK   {name}")
    except Exception as ex:
        fails.append(name)
        print(f"  FAIL {name}: {str(ex)[:300]}")
# rows-only keys have no oracle, but the driver still EXECUTES them —
# a crash there is a driver failure, so the sim must execute them too
# (invariant-level checks live in pytest; here: runs + row count >= 0).
for name in sorted(set(qs) - set(os_)):
    try:
        n = len(qs[name](spark, SF_DIR).collect())
        print(f"  RAN  {name} ({n} rows, rows-only)")
    except Exception as ex:
        fails.append(name)
        print(f"  FAIL {name} (rows-only run): {str(ex)[:300]}")
print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
