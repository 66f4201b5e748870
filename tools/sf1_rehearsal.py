"""sf~1 scale rehearsal (r5 verdict #6): generate a 10x-sf0.1
synthetic `documents` table (50k docs, same generator idioms as the
driver fixtures: small fixed vocabulary, 15-60-word docs, planted
near-dup pairs at a few percent, a handful of exact dups), run the
dedup/triplet chain on it, and report wall-clock + shuffle bytes per
query from the Spark UI REST API. Output feeds SCALE.md "sf~1
rehearsal" — measured headroom, not extrapolation.

Usage: python tools/sf1_rehearsal.py [n_docs]  (default 50_000)
  --x30 [mult]: the standing 30× re-run (r11 verdict #6) — ANN family
  keys at mult (default 30) + the hierarchical-banding switch-point
  candidate-mass A/B (levels 1 vs 2 on the >2^16-class fixture).
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
    events_mode = "--events" in sys.argv
    asof_mode = "--asof" in sys.argv
    r7_mode = "--r7" in sys.argv
    r8_mode = "--r8" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 50_000
    if asof_mode:
        run_asof_rehearsal(int(args[0]) if args else 2_000_000)
        return
    if r7_mode:
        run_r7_rehearsal(int(args[0]) if args else 1)
        return
    if r8_mode:
        run_r7_rehearsal(int(args[0]) if args else 1, keys=R8_KEYS)
        return
    if "--r9" in sys.argv:
        run_r7_rehearsal(int(args[0]) if args else 1, keys=R9_KEYS)
        return
    if "--r10" in sys.argv:
        run_r7_rehearsal(int(args[0]) if args else 1, keys=R10_KEYS)
        return
    if "--r11" in sys.argv:
        run_r7_rehearsal(int(args[0]) if args else 1, keys=R11_KEYS)
        return
    if "--graph" in sys.argv:
        # r12 verdict #2: the iterative-graph exchange question at
        # scale. Optional arg = mult (default 30).
        run_graph_rehearsal(int(args[0]) if args else 30)
        return
    if "--x30" in sys.argv:
        # r11 verdict #6: the one-off 30× measurements promoted to a
        # standing flag — the ANN family at mult=30 plus the banding
        # at-the-switch-point candidate-mass A/B. Optional arg = mult.
        m = int(args[0]) if args else 30
        run_r7_rehearsal(m, keys=X30_KEYS, min2=True)
        run_banding_switchpoint(m)
        return
    if events_mode:
        if not os.path.exists(f"{OUT_DIR}/events.parquet"):
            t0 = time.perf_counter()
            generate_events(n_docs)
            print(f"generated {n_docs} events in {time.perf_counter()-t0:.1f}s")
        # the event keys only read events.parquet, but load_table of the
        # other fixtures must not fail if a key touches them
    elif not os.path.exists(f"{OUT_DIR}/documents.parquet"):
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
    keys = EVENT_KEYS if events_mode else [
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




def generate_events(n_rows: int) -> None:
    """10×-sf0.1-shaped synthetic `events` (fixture profile: 100k rows,
    1.5k users, 5 types, 30 days) scaled to ``n_rows`` with users
    scaled ∝ rows — the events-family counterpart of generate()."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(7)
    n_users = max(150, (n_rows * 15) // 1000)
    types = ["signup", "click", "error", "view", "purchase"]
    os.makedirs(OUT_DIR, exist_ok=True)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    span_us = 30 * 86_400_000_000
    ts = sorted(rng.randrange(span_us) for _ in range(n_rows))
    tbl = pa.table(
        {
            "event_id": pa.array(range(n_rows), pa.int64()),
            "ts": pa.array(
                [base_us + t for t in ts], pa.timestamp("us")
            ),
            "user_id": pa.array(
                [rng.randrange(n_users) for _ in range(n_rows)], pa.int64()
            ),
            "event_type": pa.array(
                [types[rng.randrange(5)] for _ in range(n_rows)]
            ),
            "value": pa.array(
                [round(rng.uniform(0, 100), 4) for _ in range(n_rows)]
            ),
            "props": pa.array(['{"k":1}'] * n_rows),
        }
    )
    pq.write_table(tbl, f"{OUT_DIR}/events.parquet")


EVENT_KEYS = [
    "q_events_rolling_dau",
    "q_events_retention",
    "q_events_funnel",
    "q_events_rolling_zscore",
]




def run_asof_rehearsal(n_rows: int) -> None:
    """Hot-key as-of rehearsal (r6 verdict #3's scale evidence): one
    user holds 30% of an n_rows event stream spanning ~60 days; the
    PLAIN as-of must sort that user's whole history in one task, the
    BUCKETED form spreads it over one task per day. Reports wall-clock
    and shuffle for both (results asserted row-identical first)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.operators.joins import (
        asof_join,
        asof_join_bucketed,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("asof-rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl

    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    # 30% hot user, rest uniform over 1000 cold users; ts over ~60 days
    ev = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 1000).cast("string")))
        .alias("user_id"),
        (base + F.make_interval(secs=(F.col("id") % 5_184_000).cast("double")))
        .alias("ts"),
        (F.col("id") % 2 == 0).alias("is_probe"),
    )
    left = ev.filter(F.col("is_probe")).select("event_id", "user_id", "ts")
    right = (
        ev.filter(~F.col("is_probe"))
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    kw = dict(on="user_id", left_ts="ts", right_ts="ts",
              right_cols=["click_id", "click_ts"], how="left")

    # row-identity first (checksum both forms)
    def checksum(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.hash("event_id", "user_id", "click_id").cast("bigint")).alias("h"),
        ).collect()[0]

    plain_df = asof_join(left, right, **kw)
    bucket_df = asof_join_bucketed(left, right, bucket="1 day", **kw)
    cp, cb = checksum(plain_df), checksum(bucket_df)
    assert (cp.n, cp.h) == (cb.n, cb.h), (cp, cb)
    print(f"row-identity OK: {cp.n} rows, checksum {cp.h}")

    report = {}
    for name, df_fn in (
        ("asof_plain", lambda: asof_join(left, right, **kw)),
        ("asof_bucketed", lambda: asof_join_bucketed(left, right, bucket="1 day", **kw)),
    ):
        spark.catalog.clearCache()
        prev = stage_metrics(ui) if ui else {}
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        cur = stage_metrics(ui) if ui else {}
        delta = {m: cur[m] - prev[m] for m in cur} if cur else {}
        report[name] = {"sec": round(dt, 1), **delta}
        print(name, json.dumps(report[name]))
    print("REPORT", json.dumps(report))
    spark.stop()


#: r7-family rehearsal keys (r7 verdict #3): measure shuffle/exchange
#: growth at 1x vs 10x fixture scale for the round-7 additions.
R7_KEYS = [
    "q_llm_semdedup",            # cells ∝ √corpus (the r8 fix under test)
    "q_llm_bitext_mining",       # label-blocked margin candidates
    "q_llm_decontaminate_fuzzy", # broadcast eval-fp probe
    "q_graph_kcore",             # 4-round peeling ∝ E
]

#: r8-family rehearsal keys (r8 verdict #5): the Arrow-bucketed
#: sign-LSH ANN, IVF-PQ (ADC candidate join), and the cross-family
#: reconcile (two pair chains + a pair-table full-outer). Runs on the
#: same generate_r7 fixtures.
R8_KEYS = [
    "q_llm_cosine_ann",
    "q_llm_ivfpq_topk",
    "q_llm_dedup_reconcile",
]

#: r9-session rehearsal keys (the audit/layout/ingest additions). Runs
#: on the same generate_r7 fixtures, which now include a scaled
#: `events` table for the z-order audit. q_cdc_merge is excluded
#: (needs `customer`; it is one full-outer equi-join — the q_join_outer
#: shape the r1-family already covers).
R9_KEYS = [
    "q_llm_isotropy",              # one-pass Gram-sum (no pair join)
    "q_llm_dedup_threshold_curve", # one pair build × 8-row fan-out
    "q_llm_ccnet_buckets",         # vocab join + global_index ranks
    "q_llm_gopher_rules",          # one map-side scan, 1-row agg
    "q_zorder_skipping",           # 3 range-partitioned total sorts
    "q_stream_quota_ingest",       # delta window + broadcast totals
    "q_multimodal_audio_near_dup", # encode+hash mapInPandas + banding
    "q_llm_dsir_select",           # vocab-sized freq join + top-k
    "q_llm_top_direction",         # 5 key-width aggregate passes
    "q_stream_ingest_pipeline",    # composed 2-store foreachBatch
]

#: r10-session rehearsal keys (r9 verdict #7: the late-r9 keys the r9
#: close only shape-noted, plus the r10 additions). Same generate_r7
#: fixtures (scaled documents/embeddings/events).
R10_KEYS = [
    "q_agg_session_capped",     # vectorized mapInPandas gap+cap scan
    "q_stream_session_capped",  # per-key engine-state streaming twin
    "q_llm_bpe_curve",          # per-round tokenizer compression
    "q_events_ab_cuped",        # user-keyed agg + 1-row moment fold
    "q_events_did",             # same shape, DiD readout
    "q_llm_dedup_savings",      # capped pair chain + grouped sum
    "q_llm_cdc_chunks",         # codegen hash pass + chunk-hash shuffle
    "q_llm_ann_probe_curve",    # one ADC scoring pass × 4 settings
    "q_llm_compress_ratio",     # zlib mapInPandas scan, no shuffle
]


#: r11-session rehearsal keys (r10 verdict #5: the r10 keys that shipped
#: unrehearsed, plus the r11 CDC kernel and the sampled-training ANN
#: re-measure — the N^1.5 wall fix under test). Same generate_r7
#: fixtures.
R11_KEYS = [
    "q_llm_lsh_band_curve",      # 1 signature build × 3 (b,r) configs
    "q_llm_cdc_chunks",          # windowed oracle twin (char exchange)
    "q_llm_cdc_chunks_kernel",   # r11 mapInPandas kernel (chunk rows only)
    "q_llm_cdc_chunks_hashed",   # kernel + 8-byte identity keys
    "q_llm_shard_export",        # manifest: shard window + grouped agg
    "q_stream_cdc_ingest",       # per-batch kernel + store anti-join
    "q_llm_ann_probe_curve",     # sampled-training IVF-PQ build + curve
    "q_llm_ivfpq_topk",          # sampled-training build + ADC search
    "q_llm_semdedup",            # sampled-training √N-cell quantizer
]


#: `--x30` keys (r11 verdict #6): the families whose 30× behavior was
#: measured one-off in round 11 — re-runnable whenever they change.
X30_KEYS = [
    "q_llm_ann_probe_curve",  # sampled-training IVF-PQ build + curve
    "q_llm_ivfpq_topk",       # sampled-training build + ADC search
    "q_llm_semdedup",         # √N-cell quantizer + grouped verify
]


def run_graph_rehearsal(mult: int) -> None:
    """r12 verdict #2 (standing --graph flag): settle the iterative-graph
    per-round exchange question AT SCALE instead of local[32]/sf0.1 A/Bs.
    On the x``mult`` orders/lineitem co-purchase graph, measure wall +
    shuffle read/write for (a) operators/graph.pagerank and
    (b) connected_components as shipped, and (c/d) pre-partitioned
    variants that hash-partition the edge state by the per-round join
    key at an EXPLICIT count (32, matching shuffle.partitions — not the
    1-partition AQE cliff the r12 local A/B hit) before the loop's
    checkpoint, so each round's |E|-side join reuses the partitioning
    and only the |V|-row label/rank side exchanges. The variant bodies
    are inline copies of the operators' loops (same expressions) — they
    land in operators/graph.py only if this measures a win."""
    d = f"/tmp/sf1_r7_x{mult}"
    if not os.path.exists(f"{d}/lineitem.parquet"):
        t0 = time.perf_counter()
        generate_r7(d, mult)
        print(f"generated x{mult} fixtures in {time.perf_counter()-t0:.1f}s")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("graph-rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    import bench

    report = {
        "mult": mult,
        "probe": {
            "scalar_ratio": round(bench.cpu_probe() / bench.PROBE_REFERENCE_SEC, 2),
            "mt_ratio": round(bench.cpu_probe_mt() / bench.PROBE_MT_REFERENCE_SEC, 2),
        },
    }
    print("probe", json.dumps(report["probe"]))
    o = spark.read.parquet(f"{d}/orders.parquet")
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("id_a"),
        (F.col("l_suppkey") + 1000000).alias("id_b"),
    )

    def timed(tag, fn):
        spark.catalog.clearCache()
        prev = stage_metrics(ui)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        cur = stage_metrics(ui)
        row = {"sec": round(dt, 1)}
        row.update({m: cur[m] - prev[m] for m in cur})
        report[tag] = row
        print(tag, json.dumps(row))

    def pagerank_prepart(parts: int):
        # inline twin of operators/graph.pagerank with und explicitly
        # hash-partitioned on the per-round join key before the
        # degree-annotated checkpoint
        iters, unit, dn, dd = 5, 10**12, 85, 100
        und = (
            edges.filter(F.col("id_a").isNotNull() & F.col("id_b").isNotNull())
            .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
            .union(
                edges.filter(
                    F.col("id_a").isNotNull() & F.col("id_b").isNotNull()
                ).select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
            )
            .distinct()
            .repartition(parts, "a")
            .persist()
        )
        deg = und.groupBy("a").agg(F.count("*").alias("d"))
        ed = und.join(deg, "a").localCheckpoint(eager=True)
        verts = und.select(F.col("a").alias("id")).distinct()
        n = verts.count()
        base = ((dd - dn) * unit) // (dd * n)
        ranks = verts.withColumn("r", F.lit(unit // n).cast("long")).localCheckpoint(
            eager=True
        )
        for _ in range(iters):
            contrib = ed.join(ranks.withColumnRenamed("id", "a"), "a").select(
                F.col("b").alias("id"),
                F.expr(f"({dn} * r) DIV ({dd} * d)").alias("share"),
            )
            ranks = (
                contrib.groupBy("id")
                .agg((F.lit(base) + F.sum("share")).cast("long").alias("r"))
                .localCheckpoint(eager=True)
            )
        und.unpersist()
        return ranks.select("id", F.col("r").alias("rank"))

    def cc_prepart(parts: int):
        und = (
            edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
            .union(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
            .distinct()
            .repartition(parts, "b")
            .persist()
        )
        labels = (
            und.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("component", F.col("id"))
            .localCheckpoint(eager=True)
        )
        for _ in range(20):
            nbr = und.join(labels.withColumnRenamed("id", "b"), "b").select(
                F.col("a").alias("id"), "component"
            )
            m = (
                labels.select("id", "component")
                .union(nbr)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
            new_labels = (
                m.join(
                    m.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("c2"),
                    ),
                    "component",
                )
                .select("id", F.col("c2").alias("component"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        und.unpersist()
        return labels

    timed("pagerank_shipped", lambda: pagerank(edges))
    timed("pagerank_prepart32", lambda: pagerank_prepart(32))
    timed("cc_shipped", lambda: connected_components(edges))
    timed("cc_prepart32", lambda: cc_prepart(32))
    # repeat shipped to bracket box drift
    timed("pagerank_shipped_rep", lambda: pagerank(edges))
    report["probe_end"] = {
        "scalar_ratio": round(bench.cpu_probe() / bench.PROBE_REFERENCE_SEC, 2),
        "mt_ratio": round(bench.cpu_probe_mt() / bench.PROBE_MT_REFERENCE_SEC, 2),
    }
    print("GRAPH_REPORT", json.dumps(report))
    spark.stop()


def run_banding_switchpoint(mult: int) -> None:
    """The hierarchical-banding at-the-switch-point A/B (r11 one-off,
    now standing): on the x``mult`` documents fixture — whose distinct
    simhash class count exceeds the 2¹⁶ level-1 band space at mult≈30 —
    measure band rows, CANDIDATE pair mass and candidate-join wall for
    levels=1 vs levels=2, plus what `auto_band_levels` derives. The
    level-2 cut is the scale argument (r11: 149.4M → 14.7M candidates,
    10.1×, zero recall loss by double-pigeonhole)."""
    d = f"/tmp/sf1_r7_x{mult}"
    if not os.path.exists(f"{d}/documents.parquet"):
        t0 = time.perf_counter()
        generate_r7(d, mult)
        print(f"generated x{mult} fixtures in {time.perf_counter()-t0:.1f}s")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.operators.dedup import (
        auto_band_levels,
        hamming_band_rows,
        simhash_signatures,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("banding-switchpoint")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    classes = (
        simhash_signatures(docs).select("simhash").distinct().persist()
    )
    n_classes = classes.count()
    lvl = auto_band_levels(n_classes, max_hamming=3)
    report = {"n_classes": n_classes, "auto_level": lvl}
    for levels in (1, 2):
        rows = hamming_band_rows(classes, "simhash", 3, levels=levels).persist()
        n_rows = rows.count()
        a = rows.select(F.col("simhash").alias("ha"), "band", "bucket")
        b = rows.select(F.col("simhash").alias("hb"), "band", "bucket")
        t0 = time.perf_counter()
        n_cand = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("ha") < F.col("hb"))
            .count()
        )
        dt = time.perf_counter() - t0
        report[f"level{levels}"] = {
            "band_rows": n_rows,
            "candidates": n_cand,
            "join_sec": round(dt, 1),
        }
        print(f"levels={levels}", json.dumps(report[f"level{levels}"]))
        rows.unpersist()
    print("BANDING_REPORT", json.dumps(report))
    spark.stop()


def generate_r7(d: str, mult: int) -> None:
    """sf0.1-shaped documents/embeddings/orders/lineitem scaled by
    ``mult`` (sf0.1 = 5k docs / 2k vecs / 150k orders / 600k lines).
    Embeddings follow the fixture profile (64-dim float32, label
    0..9) with ~2% planted exact copies so semdedup has work to do;
    orders/lineitem carry only the columns q_graph_kcore reads."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    rng = random.Random(42)
    nprng = np.random.default_rng(42)

    n_docs = 5_000 * mult
    texts: list[str] = []
    for _ in range(n_docs):
        n = rng.randint(15, 60)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(n)))
    n_near = n_docs // 25
    for i in range(n_near):
        src = rng.randrange(n_docs - n_near)
        words = texts[src].split()
        for _ in range(max(1, len(words) // 10)):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        texts[n_docs - n_near + i] = " ".join(words)
    langs = ["en"] * 8 + ["de", "zh"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([langs[i % 10] for i in range(n_docs)]),
                "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )

    n_vec = 2_000 * mult
    emb = nprng.standard_normal((n_vec, 64)).astype(np.float32)
    n_copy = n_vec // 50
    for i in range(n_copy):  # planted exact copies of earlier vectors
        emb[n_vec - n_copy + i] = emb[nprng.integers(0, n_vec - n_copy)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array([i % 10 for i in range(n_vec)], pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )

    # fixture-profile events (sf0.1 = 100k rows, 1.5k users, 30 days)
    # for the z-order / quota / events-family keys
    n_ev = 100_000 * mult
    n_users = 1_500 * mult
    types = ["signup", "click", "error", "view", "purchase"]
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    span_us = 30 * 86_400_000_000
    ev_ts = sorted(rng.randrange(span_us) for _ in range(n_ev))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "ts": pa.array(
                    [base_us + t for t in ev_ts], pa.timestamp("us")
                ),
                "user_id": pa.array(
                    [rng.randrange(n_users) for _ in range(n_ev)], pa.int64()
                ),
                "event_type": pa.array(
                    [types[rng.randrange(5)] for _ in range(n_ev)]
                ),
                "value": pa.array(
                    [round(rng.uniform(0, 100), 4) for _ in range(n_ev)]
                ),
                "props": pa.array(['{"k":1}'] * n_ev),
            }
        ),
        f"{d}/events.parquet",
    )

    n_ord, n_li = 150_000 * mult, 600_000 * mult
    n_cust, n_supp = 15_000 * mult, 1_000 * mult
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    nprng.integers(0, n_cust, n_ord), pa.int64()
                ),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(nprng.integers(0, n_ord, n_li), pa.int64()),
                "l_suppkey": pa.array(nprng.integers(0, n_supp, n_li), pa.int64()),
            }
        ),
        f"{d}/lineitem.parquet",
    )


def run_r7_rehearsal(
    mult: int, keys: "list[str] | None" = None, min2: bool = False
) -> None:
    d = f"/tmp/sf1_r7_x{mult}"
    # events.parquet was added to the r7 fixture set in round 9 — a dir
    # generated by an earlier round is regenerated rather than half-used
    if not os.path.exists(f"{d}/documents.parquet") or not os.path.exists(
        f"{d}/events.parquet"
    ):
        t0 = time.perf_counter()
        generate_r7(d, mult)
        print(f"generated x{mult} fixtures in {time.perf_counter()-t0:.1f}s")

    from pyspark.sql import SparkSession

    from kafka_streams_clojure_spark.queries import queries

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sf1-r7-rehearsal")
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
    report = {}
    # box-state probes (the bench.py discipline): rehearsal rows are
    # compared ACROSS ROUNDS, so without a contention reading a 1.3×
    # box swing reads as a 1.3× regression (r12 lesson — the first
    # GEMM A/B looked like a probe-curve regression until probed)
    import bench

    report["probe"] = {
        "scalar_ratio": round(bench.cpu_probe() / bench.PROBE_REFERENCE_SEC, 2),
        "mt_ratio": round(bench.cpu_probe_mt() / bench.PROBE_MT_REFERENCE_SEC, 2),
    }
    print("probe", json.dumps(report["probe"]))
    if min2:
        # bench._run_gated's warm-up discipline, scaled: run every key
        # once on the x1 fixtures first so whole-JVM/codegen JIT is paid
        # before any timed run — without it the FIRST key in the list
        # absorbs the JVM warm-up that later keys get for free (the r11
        # 10×/30× rows ran probe-curve late in a 9-key sequence, i.e.
        # warm; a cold-first run is not comparable to them)
        d1 = "/tmp/sf1_r7_x1"
        if not os.path.exists(f"{d1}/documents.parquet") or not os.path.exists(
            f"{d1}/events.parquet"
        ):
            generate_r7(d1, 1)
        for k in keys or R7_KEYS:
            qs[k](spark, d1).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    # snapshot AFTER any warm-up so the first key's shuffle delta is its own
    prev = (stage_metrics(ui) if ui else None) or {
        "n_stages": 0, "shuffle_read_b": 0, "shuffle_write_b": 0, "input_b": 0
    }
    for k in keys or R7_KEYS:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[k](spark, d).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        cur = stage_metrics(ui) if ui else {}
        delta = {m: cur[m] - prev[m] for m in cur} if cur else {}
        report[k] = {"sec": round(dt, 1), **{m: delta.get(m) for m in delta}}
        if min2:
            # the HEADLINE min-of-two discipline (bench._run_gated): a
            # warm second run damps first-call JIT/GC on multi-stage
            # plans — the form the r11 FINAL 10×/30× rows used, so
            # cross-round A/Bs compare like with like. Shuffle metrics
            # stay run-1's (run 2 would double the deltas).
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[k](spark, d).write.format("noop").mode("overwrite").save()
            dt2 = time.perf_counter() - t0
            report[k]["sec_run1"] = report[k]["sec"]
            report[k]["sec"] = round(min(dt, dt2), 1)
            cur = stage_metrics(ui) if ui else cur
        prev = cur or prev
        print(k, json.dumps(report[k]))
    report["probe_end"] = {
        "scalar_ratio": round(bench.cpu_probe() / bench.PROBE_REFERENCE_SEC, 2),
        "mt_ratio": round(bench.cpu_probe_mt() / bench.PROBE_MT_REFERENCE_SEC, 2),
    }
    print("REPORT", json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
