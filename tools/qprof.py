"""Per-key optimization profiler (round 12): bench-methodology timing +
.explain("formatted") capture for the before/after evidence the
optimization rounds require.

For each named key: warm once at sf0.001 (codegen/JIT), then
clearCache + min-of-two noop-sink runs at the target SF (exactly
bench.py's `_run_gated` discipline), and write the formatted physical
plan to plans/<round>/<key>_<tag>.txt.

Usage:
  python tools/qprof.py --keys k1,k2 [--tag before] [--round r12]
                        [--sf /root/testdata/sf0.1] [--runs 2]
                        [--no-plan] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("--keys", required=True)
ap.add_argument("--tag", default="before")
ap.add_argument("--round", default="r12")
ap.add_argument("--sf", default="/root/testdata/sf0.1")
ap.add_argument("--runs", type=int, default=2)
ap.add_argument("--no-plan", action="store_true")
ap.add_argument("--json", default=None)
args = ap.parse_args()

from kafka_streams_clojure_spark.queries import queries
from kafka_streams_clojure_spark.session import get_spark

spark = get_spark("kscs-qprof")
qs = queries()
keys = [k.strip() for k in args.keys.split(",") if k.strip()]
missing = [k for k in keys if k not in qs]
if missing:
    raise SystemExit(f"unknown keys: {missing}")

plan_dir = os.path.join(REPO, "plans", args.round)
os.makedirs(plan_dir, exist_ok=True)

out: dict[str, float] = {}
for name in keys:
    spark.sparkContext.setJobDescription(f"qprof-warm:{name}")
    qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
for name in keys:
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(args.runs):
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
    if not args.no_plan:
        # the plan of the DataFrame as declared (pre-execution AQE
        # wrapper; Exchange/join-strategy/PushedFilters all visible)
        plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(
            os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w"
        ) as f:
            f.write(plan)
    print(f"{out[name]:8.3f}  {name}", flush=True)

print(json.dumps({"sf": args.sf, "tag": args.tag, "timings": out}))
if args.json:
    with open(args.json, "w") as f:
        json.dump({"sf": args.sf, "tag": args.tag, "timings": out}, f, indent=1)
