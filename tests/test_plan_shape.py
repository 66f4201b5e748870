"""Plan-shape audits: results being right is necessary, the PLAN being
right is what survives a 100× scale-up (BASELINE.md engineering
targets). These tests pin the physical properties we rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from kafka_streams_clojure_spark.plans import (
    has_pushed_filters,
    physical_plan,
    scan_read_schema,
    shuffle_count,
    uses_broadcast_join,
)
from kafka_streams_clojure_spark.queries._util import load_table

_Q = entrymod.queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = _Q["q_filter"](spark, sf_dir)
    assert has_pushed_filters(df), physical_plan(df)


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = _Q["q_scan_source"](spark, sf_dir)
    cols = set(scan_read_schema(df))
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"}, cols


def test_range_scan_pushes_between(spark, sf_dir):
    df = _Q["q_sort_range_scan"](spark, sf_dir)
    plan = physical_plan(df)
    assert "GreaterThanOrEqual(l_orderkey,1000" in plan.replace(" ", "") or "l_orderkey" in plan
    assert has_pushed_filters(df), plan


def test_dim_join_broadcasts(spark, sf_dir):
    for key in ("q_join_inner", "q_join_broadcast"):
        df = _Q[key](spark, sf_dir)
        assert uses_broadcast_join(df), f"{key} did not broadcast:\n{physical_plan(df)}"


def test_broadcast_join_no_fact_shuffle_before_join(spark, sf_dir):
    """The broadcast join must not shuffle lineitem for the join; the
    only exchange is the final small aggregation."""
    df = _Q["q_join_broadcast"](spark, sf_dir)
    assert shuffle_count(df) == 1, physical_plan(df)


def test_groupby_is_two_phase(spark, sf_dir):
    """Partial (map-side) + final aggregation — shuffle volume ∝ groups."""
    df = _Q["q_agg_reduce_sum"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Spark 3.5+ pushes rank<=k below the exchange (WindowGroupLimit),
    so the shuffle carries ~k rows per group instead of everything."""
    df = _Q["q_topk_per_group"](spark, sf_dir)
    assert "WindowGroupLimit" in physical_plan(df)


def test_global_topk_avoids_total_sort(spark, sf_dir):
    df = _Q["q_topk_global"](spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_asof_join_is_single_shuffle_sort(spark, sf_dir):
    """The as-of join must be union + one window — never a cartesian or
    range-exploded join."""
    df = _Q["q_join_asof"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Window") >= 1


def test_asof_bucketed_windows_on_key_and_bucket(spark, sf_dir):
    """r6 verdict #3 'done' condition, plan half: the bucketed as-of's
    main window must partition by (key, bucket) — the hot-key split —
    and stay cartesian-free."""
    import re

    df = _Q["q_join_asof_bucketed"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the within-bucket as-of window partitions by both __k and __b
    assert re.search(r"windowspecdefinition\(__k#\d+L?, __b#\d+L?,", plan), plan


def test_asof_bucketed_splits_hot_key_across_tasks(spark):
    """r6 verdict #3 'done' condition, runtime half: ONE hot key whose
    history spans many buckets must be processed by >1 task in the
    bucketed form (the plain form provably sorts it in one), while the
    results stay row-identical to the plain as-of."""
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.operators.joins import (
        asof_join,
        asof_join_bucketed,
    )

    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    # one user, 2000 left rows + 1000 right rows spread over ~42 days
    left = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.lit("hot").alias("user_id"),
        (base + F.make_interval(hours=F.col("id") % 1000)).alias("ts"),
    )
    right = spark.range(1000).select(
        F.lit("hot").alias("user_id"),
        (base + F.make_interval(hours=F.col("id"), mins=F.lit(30))).alias("ts"),
        F.col("id").alias("click_id"),
    )
    kw = dict(
        on="user_id", left_ts="ts", right_ts="ts", right_cols=["click_id"]
    )
    bucketed = asof_join_bucketed(left, right, bucket="1 day", **kw)
    got = {(r.event_id, r.click_id) for r in bucketed.collect()}
    exp = {(r.event_id, r.click_id) for r in asof_join(left, right, **kw).collect()}
    assert got == exp and len(got) == 2000
    # spark_partition_id at the output reflects the (key, bucket) hash
    # exchange the window ran on: the single hot key must span tasks
    npart = (
        bucketed.withColumn("pid", F.spark_partition_id())
        .agg(F.countDistinct("pid"))
        .collect()[0][0]
    )
    assert npart > 1, f"hot key still processed by {npart} task(s)"


def test_entry_stays_jvm_side(spark):
    """The flagship pipeline must contain no Python UDF evaluation."""
    df = entrymod.entry(spark)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunks_and_hash_sample_are_map_side_only(spark, sf_dir):
    """Chunking and deterministic sampling must be exactly as parallel
    as the parquet scan: zero exchanges."""
    for key in ("q_llm_chunks", "q_llm_hash_sample"):
        df = _Q[key](spark, sf_dir)
        assert shuffle_count(df) == 0, f"{key}:\n{physical_plan(df)}"


def test_funnel_exchanges_all_keyed_by_user(spark, sf_dir):
    """Every visible hash exchange in the funnel is keyed by user_id,
    and there is no range partitioning (global sort) anywhere — scale
    is bounded by user cardinality. The persisted stage aggregates hide
    their own exchanges inside InMemoryRelation, so this also descends
    into the cached plans via the analyzed plan string."""
    import re

    df = _Q["q_events_funnel"](spark, sf_dir)
    full = physical_plan(df) + df._jdf.queryExecution().analyzed().toString()
    assert "rangepartitioning" not in full, full
    kinds = re.findall(r"Exchange (\w+)", full)
    for kind in kinds:
        # SinglePartition only ever carries the partial-agg outputs of
        # the three 1-row stage counts (bounded: one row per task) —
        # every data-bearing exchange must be hashpartitioning
        assert kind in ("hashpartitioning", "SinglePartition"), (kind, full)
    for kind, first_col in re.findall(r"Exchange (\w+)\(([^,)]+)", full):
        if kind == "hashpartitioning":
            assert first_col.split("#")[0] == "user_id", (kind, first_col)


def test_pack_sequences_single_shard_shuffle(spark, sf_dir):
    """Packing shuffles once on the shard key (source) and computes the
    running sum inside the shard — no global ordering anywhere."""
    df = _Q["q_llm_pack_sequences"](spark, sf_dir)
    assert shuffle_count(df) == 1, physical_plan(df)


def test_outliers_broadcast_stats_no_fact_shuffle(spark, sf_dir):
    """The per-type stats join must broadcast; the only exchange is the
    tiny stats aggregate itself, never the events fact table."""
    df = _Q["q_events_outliers"](spark, sf_dir)
    assert uses_broadcast_join(df), physical_plan(df)
    assert shuffle_count(df) == 1, physical_plan(df)


def test_runtime_bloom_filter_prunes_shuffled_join(spark, sf_dir):
    """Runtime bloom-filter join pruning (the injected-runtime-filter
    lever for selective fact⋈filtered-dim joins at 100 TB: the scan
    side drops rows that can't match BEFORE the exchange). Default
    size thresholds (10 MB creation side) are cluster-scale, so the
    tiny fixtures never trigger it naturally — lower them to prove
    the engine's sessions have the optimization ON and the plan picks
    it up when the sizes warrant."""
    confs = {
        # applicationSideScanSizeThreshold is a MINIMUM probe size
        # (default 10 GB); creationSideThreshold is a MAXIMUM build
        # size (default 10 MB, already far above the fixture)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "32b",
        # force the shuffled-join path: bloom filters only help when the
        # probe side actually scans+shuffles (broadcast joins prune via
        # the hashed relation itself)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "PRIO_1"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, (
            "runtime bloom filter not injected:\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_minhash_lsh_candidate_dedup_is_id_width(spark, sf_dir):
    """The LSH candidate distinct() must exchange ONLY (id_a, id_b) —
    a pair colliding in several bands dedup'd carrying two 32-long
    signatures would be a ~30× wider shuffle at 100 TB. Signatures
    re-join after dedup, keyed by id."""
    from kafka_streams_clojure_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    df = minhash_lsh_pairs(docs, n_hashes=32, bands=8, threshold=0.5)
    plan = physical_plan(df)
    dedup_keys = [
        line
        for line in plan.splitlines()
        if line.strip().startswith("Keys") and "id_a" in line and "id_b" in line
    ]
    assert dedup_keys, "candidate-dedup HashAggregate not found:\n" + plan[:2000]
    for line in dedup_keys:
        assert "sig" not in line, "signature rides the dedup exchange: " + line
        assert line.strip().startswith("Keys [2]"), line


def test_range_join_binned_avoids_nested_loop(spark, sf_dir):
    """The keyless band join's whole point: interval binning turns the
    non-equi predicate into a shuffled equi join — no BNLJ/cartesian."""
    plan = physical_plan(_Q["q_join_range_binned"](spark, sf_dir))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_triplet_negative_mining_avoids_nested_loop(spark, sf_dir):
    """r5 verdict's single scale-killer, closed: negative candidate
    generation is the decomposable md5-bucket EQUI-join
    (queries/llm._neg_candidates), never an anchors×corpus BNLJ. The
    whole triplet chain — and both siblings that share its cand set —
    must plan with zero nested-loop/cartesian operators."""
    for key in ("q_llm_triplets", "q_llm_triplet_eval",
                "q_llm_hard_negatives"):
        plan = physical_plan(_Q[key](spark, sf_dir))
        assert "NestedLoop" not in plan and "Cartesian" not in plan, (
            key + ":\n" + plan[:3000]
        )


def test_capped_pair_joins_carry_doc_freq_filter(spark, sf_dir):
    """r6 verdict #1's 'done' condition, plan half: the three
    formerly-uncapped pair-join keys must plan the doc-freq cut — the
    `__df <= cap` filter on the join input. A refactor that silently
    drops the cap reverts the family to quadratic-on-hot-keys; this
    catches it structurally (headline3 catches it as a number)."""
    import re

    for key, cap in (
        ("q_llm_containment", 2),
        ("q_llm_dup_provenance", 2),
        ("q_llm_winnowing", 4),
    ):
        plan = _Q[key](spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        assert re.search(rf"__df#\d+L? <= {cap}\)", plan), (key, plan[:2000])


def test_scaled_triplets_keep_bucket_equi_join(spark, sf_dir):
    """The B∝N form (r6 verdict #4) may broadcast its 1-ROW corpus
    count onto the two bucket projections (exactly 2 bounded BNLJs),
    but the candidate join itself must remain the md5-bucket EQUI-join
    — a shuffle keyed by nb — and never a cartesian."""
    import re

    plan = physical_plan(_Q["q_llm_triplets_scaled"](spark, sf_dir))
    assert "Cartesian" not in plan, plan[:3000]
    # formatted explain prints each node in the tree AND the detail
    # section — count node headers, not substrings
    bnlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj) <= 2, plan[:3000]
    # the candidate join is keyed on the bucket id (hash join at
    # fixture scale, shuffled at 100 TB — either way an EQUI join)
    assert re.search(r"keys \[1\]: \[nb#\d+L?\]", plan), plan[:3000]


def test_cdc_chunk_scan_prunes_and_pins(spark, sf_dir):
    """The CDC chunk pass reads ONLY (doc_id, text) from the documents
    scan (a chunker that drags every column through the char explode
    would be wrong at any scale), its boundary hash runs JVM-side (no
    Python anywhere in the plan), and the char-window exchange is the
    PINNED explicit repartition, never an AQE-coalesced single
    partition."""
    from kafka_streams_clojure_spark.operators.dedup import cdc_chunk_table

    # earlier test modules may leave `documents` persisted — a cached
    # InMemoryRelation would hide the parquet scan this test audits
    spark.catalog.clearCache()
    df = cdc_chunk_table(load_table(spark, sf_dir, "documents"))
    for cols in scan_read_schema(df):
        assert set(cols.split(",")) <= {"doc_id", "text"}, cols
    plan = physical_plan(df)
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan or \
        "hashpartitioning(doc_id" in plan, plan


def test_cdc_report_exchanges_are_id_width(spark, sf_dir):
    """After the chunk slice, the dedup report's shuffles carry only
    (id, start, len, hash) — the raw text column must not survive past
    the chunk projection into any exchange."""
    from kafka_streams_clojure_spark.operators.dedup import cdc_dedup_report

    spark.catalog.clearCache()
    plan = physical_plan(
        cdc_dedup_report(load_table(spark, sf_dir, "documents"))
    )
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_shard_export_is_single_shuffle_per_phase(spark, sf_dir):
    """The export manifest plans one shard-keyed exchange feeding both
    the sequence window and the final aggregate (same key — Catalyst
    must not re-shuffle between them)."""
    df = _Q["q_llm_shard_export"](spark, sf_dir)
    assert shuffle_count(df) <= 2, physical_plan(df)
