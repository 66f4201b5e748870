"""Check SPECIFIC query keys against their oracles — the per-key
iterating loop of the verify skill (subset of tools/driver_sim.py:
same hostile non-UTC session, same tests/oracle_harness.compare exact
diff), without the ~15-minute full-registry sweep.

Usage: python tools/check_keys.py key1 key2 ... [--sf /root/testdata/sf0.01]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = "/root/testdata/sf0.01"
argv = sys.argv[1:]
if "--sf" in argv:
    i = argv.index("--sf")
    SF_DIR = argv[i + 1]
    del argv[i : i + 2]
args = argv

import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("key-check")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from oracle_harness import compare

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
fails = []
for name in args:
    if name not in qs:
        print(f"  ???  {name}: not registered")
        fails.append(name)
        continue
    try:
        if name in os_:
            compare(qs[name](spark, SF_DIR), con.sql(os_[name]), name)
            print(f"  OK   {name}")
        else:
            n = qs[name](spark, SF_DIR).count()
            print(f"  RAN  {name} ({n} rows, rows-only)")
    except Exception as ex:
        fails.append(name)
        print(f"  FAIL {name}: {str(ex)[:500]}")
print("RESULT:", "ALL MATCH" if not fails else f"FAILS: {fails}")
sys.exit(1 if fails else 0)
