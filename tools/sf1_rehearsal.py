"""sf~1 scale rehearsal (r5 verdict #6): generate a 10x-sf0.1
synthetic `documents` table (50k docs, same generator idioms as the
driver fixtures: small fixed vocabulary, 15-60-word docs, planted
near-dup pairs at a few percent, a handful of exact dups), run the
dedup/triplet chain on it, and report wall-clock + shuffle bytes per
query from the Spark UI REST API. Output feeds SCALE.md "sf~1
rehearsal" — measured headroom, not extrapolation.

Usage: python tools/sf1_rehearsal.py [n_docs]  (default 50_000)
Writes the table to /tmp/sf1_rehearsal/documents.parquet (never
touches /root/testdata).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = "/tmp/sf1_rehearsal"

VOCAB = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group agg filter query big key window vector table stream data "
    "join customer the a"
).split()


def generate(n_docs: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(42)
    texts: list[str] = []
    for _ in range(n_docs):
        n = rng.randint(15, 60)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(n)))
    # planted near-dups: ~4% of docs are a mutated copy of an earlier
    # doc (10% of words resampled) — the jaccard>=0.5 population
    n_near = n_docs // 25
    for i in range(n_near):
        src = rng.randrange(n_docs - n_near)
        words = texts[src].split()
        for _ in range(max(1, len(words) // 10)):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        texts[n_docs - n_near + i] = " ".join(words)
    # a few exact dups
    for i in range(n_docs // 500):
        texts[rng.randrange(n_docs)] = texts[rng.randrange(n_docs)]
    os.makedirs(OUT_DIR, exist_ok=True)
    langs = ["en"] * 8 + ["de", "zh"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i % 10] for i in range(n_docs)]),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{OUT_DIR}/documents.parquet")


def stage_metrics(ui: str) -> dict[str, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return {
        "n_stages": len(stages),
        "shuffle_read_b": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write_b": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "input_b": sum(s.get("inputBytes", 0) for s in stages),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    if not os.path.exists(f"{OUT_DIR}/documents.parquet"):
        t0 = time.perf_counter()
        generate(n_docs)
        print(f"generated {n_docs} docs in {time.perf_counter()-t0:.1f}s")

    from pyspark.sql import SparkSession

    from kafka_streams_clojure_spark.queries import queries

    # SF1_NEG_B overrides the triplet negative-bucket count so the
    # rehearsal can demonstrate the "raise B with the corpus" rule
    # (queries/llm._NEG_B docstring): at fixed B a 10x corpus grows the
    # candidate shuffle ~100x (both join sides grow), at B ∝ N it stays
    # ~linear. The registered key keeps B=5 — oracle SQL bakes the
    # literal — so this knob exists only here.
    neg_b = os.environ.get("SF1_NEG_B")
    if neg_b:
        from kafka_streams_clojure_spark.queries import llm as _llm

        _llm._NEG_B = int(neg_b)

    # get_spark() disables the UI; the rehearsal needs the REST API for
    # shuffle metrics, so build an equivalent session with it enabled.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sf1-rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    qs = queries()
    keys = [
        "q_llm_ngram_jaccard",
        "q_llm_ngram_jaccard_capped",
        "q_llm_winnowing",
        "q_llm_passage_dedup",
        "q_llm_triplets",
    ]
    report = {}
    prev = {"n_stages": 0, "shuffle_read_b": 0, "shuffle_write_b": 0, "input_b": 0}
    for k in keys:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[k](spark, OUT_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        cur = stage_metrics(ui) if ui else {}
        delta = {m: cur[m] - prev[m] for m in cur} if cur else {}
        prev = cur or prev
        report[k] = {"sec": round(dt, 1), **{m: delta.get(m) for m in delta}}
        print(k, json.dumps(report[k]))
    print("REPORT", json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
