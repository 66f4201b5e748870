"""Driver simulation: vanilla SparkSession (non-UTC tz to be hostile),
import __spark_entry__, smoke entry(), diff every oracle query.

Usage: python tools/driver_sim.py [sf_dir] [--keys k1,k2] [--sample N --seed R]
  (default sf_dir /root/testdata/sf0.01; default = run EVERY key)

--keys     comma-separated subset to run (fast iteration on changed keys)
--sample   seeded random subset of N keys (the per-round rotation check:
           the driver's own CORRECTNESS sample is a FIXED 50 keys, so a
           seeded rotating sample is how the other ~310 keys get a
           driver-mechanism check on record — r9 verdict ask #5)
--seed     RNG seed for --sample (use the round number)
The project verify skill runs the no-filter form before every commit.
"""
import argparse
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
ap.add_argument("--keys", default=None, help="comma-separated key subset")
ap.add_argument("--sample", type=int, default=None, help="seeded random N keys")
ap.add_argument("--seed", type=int, default=0, help="seed for --sample")
args = ap.parse_args()
SF_DIR = args.sf_dir

import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "America/New_York")  # hostile
         .config("spark.ui.enabled", "false")
         # the sweep runs ~370 keys in ONE JVM; at sf0.1 the default 1g
         # driver heap died mid-sweep (r10: everything after
         # q_orders_basket_jaccard failed with py4j connection-refused;
         # every key passes in isolation) — headroom + per-key cache
         # clearing below keep the long session bounded
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def _reset() -> None:
    """Release cached/persisted blocks between keys: operator-internal
    persist_if_uncached frames and localCheckpoint blocks otherwise
    accumulate across the whole sweep (each key re-persists what it
    needs, so clearing is correctness-neutral)."""
    spark.catalog.clearCache()

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

selected = set(qs)
if args.keys:
    selected = set(k.strip() for k in args.keys.split(",") if k.strip())
    unknown = selected - set(qs)
    if unknown:
        print(f"unknown keys: {sorted(unknown)}")
        sys.exit(2)
elif args.sample:
    # deterministic: same (seed, registry) -> same subset, so the round
    # record can name exactly which keys were checked
    selected = set(random.Random(args.seed).sample(sorted(qs), args.sample))
    print(f"sample(seed={args.seed}, n={args.sample}): {sorted(selected)}")

fails = []
for name in sorted(set(os_) & selected):
    try:
        _reset()
        compare(qs[name](spark, SF_DIR), con.sql(os_[name]), name)
        print(f"  OK   {name}")
    except Exception as ex:
        fails.append(name)
        print(f"  FAIL {name}: {str(ex)[:300]}")
# rows-only keys have no oracle, but the driver still EXECUTES them —
# a crash there is a driver failure, so the sim must execute them too
# (invariant-level checks live in pytest; here: runs + row count >= 0).
for name in sorted((set(qs) - set(os_)) & selected):
    try:
        _reset()
        n = len(qs[name](spark, SF_DIR).collect())
        print(f"  RAN  {name} ({n} rows, rows-only)")
    except Exception as ex:
        fails.append(name)
        print(f"  FAIL {name} (rows-only run): {str(ex)[:300]}")
print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
