"""End-probe inflation experiment (r11 verdict #5): both r11 bench
validation runs showed START probes ~1.1 but END probes 1.6-1.9.
Candidate explanations: (a) genuine box drift during the ~20-min run,
(b) ENDOGENOUS interference — the end probes run while the bench's own
Spark JVM (32 task threads, heap near cap after ~130 keys) is still
alive, so the 32 spawned probe interpreters compete with JVM GC /
background threads and cold page cache, which a start probe (no JVM
yet) never sees.

Protocol (idle box required):
  r0  scalar+mt probe, no JVM
  --  start the engine session, run a heavy shuffle workload ~60 s
  r1  probes immediately after the workload, JVM alive
  r2  probes after 20 s quiesce, JVM alive
  r3  probes after spark.stop() + 5 s

Readout: r1 >> r0 with r3 ~ r0 → endogenous (fix: measure end probes
after spark.stop()); r1 ~ r0 → the r11 inflation was box drift and the
current mean-of-ends rule stands.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (the probes under test)


def both() -> dict:
    return {
        "scalar": round(bench.cpu_probe() / bench.PROBE_REFERENCE_SEC, 3),
        "mt": round(bench.cpu_probe_mt() / bench.PROBE_MT_REFERENCE_SEC, 3),
    }


def main() -> None:
    out = {"r0_no_jvm": both()}
    print("r0", json.dumps(out["r0_no_jvm"]), flush=True)

    from kafka_streams_clojure_spark.queries import queries
    from kafka_streams_clojure_spark.session import get_spark

    spark = get_spark("probe-experiment")
    qs = queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.perf_counter()
    # heavy shuffle-bound keys, the bench tail's profile
    for k in ("q_llm_ivfpq_topk", "q_llm_dedup_reconcile", "q_llm_semdedup"):
        spark.catalog.clearCache()
        qs[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out["workload_sec"] = round(time.perf_counter() - t0, 1)
    print("workload", out["workload_sec"], flush=True)

    out["r1_jvm_hot"] = both()
    print("r1", json.dumps(out["r1_jvm_hot"]), flush=True)
    time.sleep(20)
    out["r2_jvm_quiesced_20s"] = both()
    print("r2", json.dumps(out["r2_jvm_quiesced_20s"]), flush=True)
    spark.stop()
    time.sleep(5)
    out["r3_jvm_stopped"] = both()
    print("r3", json.dumps(out["r3_jvm_stopped"]), flush=True)
    print("PROBE_EXPERIMENT", json.dumps(out))


if __name__ == "__main__":
    main()
