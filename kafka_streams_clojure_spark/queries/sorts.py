"""Sorts / limits / top-k keys (SURVEY.md §2.6).

The `[impl]` rows here are the reference's ordered state-store reads:
`range(store, a, b)` and `all(store)` (api.clj:108-111,118-129,
146-152) — key-ordered scans with point/range predicates. `take`/`drop`
are the positional transducers; top-k is the `[ext]` analytic
completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_streams_clojure_spark import xform as X
from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import load_table


@query(
    "q_sort_range_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
    """,
)
def q_sort_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(range store start end)` parity (api.clj:108-111): ordered
    iteration between keys. The BETWEEN predicate is pushed into the
    parquet scan (row-group pruning via min/max stats — the columnar
    analog of RocksDB's ordered seek)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey").between(1000, 2000))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_sort_orderby",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(all store)` parity (api.clj:106-107): full key-ordered scan.
    Spark sorts with a range-partitioned exchange — the scalable total
    sort."""
    n = load_table(spark, sf_dir, "nation")
    return n.select("n_nationkey", "n_name", "n_regionkey").orderBy("n_name")


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(take n)` over a pinned total order. Spark plans TakeOrderedAndProject:
    per-partition top-n then a driver-side merge of n*partitions rows —
    no global sort materialized."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return X.take(10, order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")])(o)


@query(
    "q_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10
    """,
)
def q_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(drop n)` + `(take n)` — pagination over a pinned order."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    pipe = X.compose(
        X.drop(10, order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")]),
        X.take(20),
    )
    return pipe(o)


@query(
    "q_take_per_key",
    oracle="""
    SELECT event_id, user_id, ts FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def q_take_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(take n)` with the REFERENCE's per-partition semantics: its
    stateful transducers get a fresh transformer per Kafka partition
    (api.clj:41-45), so `take 3` keeps 3 records per key-partition.
    One shuffle on the key; WindowGroupLimit prunes to n rows/group
    before the exchange."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return X.take(3, order_by=["ts", "event_id"], per_partition_key=["user_id"])(ev)


@query(
    "q_take_while",
    oracle="""
    SELECT event_id, ts, value FROM (
      SELECT event_id, ts, value,
             min(CASE WHEN value < 99.5 THEN 1 ELSE 0 END)
               OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS ok
      FROM events
    ) WHERE ok = 1
    """,
)
def q_take_while(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(take-while pred)`: longest prefix satisfying the predicate in
    a pinned global order — parallel two-phase prefix scan (running min
    within range partitions AND broadcast min of earlier partitions),
    never a single-task global window."""
    from kafka_streams_clojure_spark.operators.order import take_while_global

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    return take_while_global(ev, F.col("value") < 99.5, ["ts", "event_id"])


@query(
    "q_drop_while",
    oracle="""
    SELECT event_id, ts, value FROM (
      SELECT event_id, ts, value,
             min(CASE WHEN value < 99.5 THEN 1 ELSE 0 END)
               OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS ok
      FROM events
    ) WHERE ok = 0
    """,
)
def q_drop_while(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(drop-while pred)`: the complement suffix of q_take_while —
    everything from the first predicate-failing row onward, same pinned
    global order and the same parallel two-phase prefix scan (running
    min within range partitions + broadcast min of earlier partitions);
    the oracle is the exact `ok = 0` complement of q_take_while's."""
    from kafka_streams_clojure_spark.operators.order import drop_while_global

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    return drop_while_global(ev, F.col("value") < 99.5, ["ts", "event_id"])


@query(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 5
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — TakeOrderedAndProject (per-partition heaps, merge
    k·p rows on the driver; never a full sort)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return li.orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    ).limit(5)


@query(
    "q_topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: row_number window + filter — one shuffle on the
    group key; Spark 3.5+ pushes a per-partition rank limit before the
    exchange (WindowGroupLimit), so the shuffle carries ~k rows/group."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


from kafka_streams_clojure_spark.operators.order import morton2, morton2_sql  # noqa: E402

# Z-order key over (user_id, floor(value)) — both comfortably inside
# 16 bits on the fixture; at scale you'd first quantile-bucket each
# dimension into 2^16 bins (q_agg_percentile's GK sketch is the tool).
_Z_SQL = morton2_sql("user_id", "CAST(floor(value) AS BIGINT)")


@query(
    "q_zorder_curve",
    oracle=f"""
    SELECT event_id, {_Z_SQL} AS zkey
    FROM events
    """,
)
def q_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) layout key over two dimensions of the events
    table — the space-filling-curve column you `repartitionByRange` +
    sort files by so multi-dimensional box filters prune via parquet
    min/max stats (single-column sort clusters ONE dimension; Z-order
    bounds every file's box in BOTH). Pure shift/mask integer ladder
    (operators/order.py:morton2) — codegen, bit-identical across
    engines; round-trip + tile-contiguity invariants in
    tests/test_zorder.py, file-skipping demo in
    tests/test_storage_layout.py."""
    ev = load_table(spark, sf_dir, "events")
    z = morton2(F.col("user_id"), F.floor(F.col("value")).cast("long"))
    return ev.select("event_id", z.alias("zkey"))


_ZS_PROBE_LO, _ZS_PROBE_HI = 64, 79  # a 1/16 slice of the y rank space


@query(
    "q_zorder_skipping",
    oracle=f"""
    WITH e AS (SELECT event_id, user_id, value FROM events),
    nn AS (SELECT count(*) AS n_rows FROM e),
    r AS (SELECT event_id,
                 row_number() OVER (ORDER BY user_id, event_id) - 1 AS rx,
                 row_number() OVER (ORDER BY value, event_id) - 1 AS ry
          FROM e),
    b AS (SELECT event_id, rx,
                 (rx * 256) // n_rows AS bx,
                 (ry * 256) // n_rows AS by
          FROM r, nn),
    z AS (SELECT event_id, rx, bx, by,
                 {morton2_sql('bx', 'by')} AS zval
          FROM b),
    f AS (SELECT bx, by,
                 (row_number() OVER (ORDER BY zval, event_id) - 1) // 100
                   AS fid_z,
                 rx // 100 AS fid_lin
          FROM z),
    fz AS (SELECT fid_z,
                  max(bx) - min(bx) AS span_x,
                  max(by) - min(by) AS span_y,
                  CASE WHEN min(by) <= {_ZS_PROBE_HI}
                        AND max(by) >= {_ZS_PROBE_LO} THEN 1 ELSE 0 END AS hit
           FROM f GROUP BY fid_z),
    fl AS (SELECT fid_lin,
                  max(bx) - min(bx) AS span_x,
                  max(by) - min(by) AS span_y,
                  CASE WHEN min(by) <= {_ZS_PROBE_HI}
                        AND max(by) >= {_ZS_PROBE_LO} THEN 1 ELSE 0 END AS hit
           FROM f GROUP BY fid_lin)
    SELECT 'zorder' AS scheme, count(*) AS n_files,
           CAST(sum(span_x) AS BIGINT) AS sum_span_x,
           CAST(sum(span_y) AS BIGINT) AS sum_span_y,
           CAST(sum(hit) AS BIGINT) AS files_scanned
    FROM fz
    UNION ALL
    SELECT 'linear' AS scheme, count(*) AS n_files,
           CAST(sum(span_x) AS BIGINT) AS sum_span_x,
           CAST(sum(span_y) AS BIGINT) AS sum_span_y,
           CAST(sum(hit) AS BIGINT) AS files_scanned
    FROM fl
    """,
)
def q_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-SKIPPING effectiveness of the Z-order layout, measured —
    the audit behind Delta/Iceberg `OPTIMIZE ZORDER BY`: lay the table
    out in 100-row "files" two ways (Morton order over the two rank-
    bucketed dimensions vs a plain single-column sort), compute each
    file's min/max box — exactly the parquet footer stats a reader
    prunes on — and report, per scheme, the summed per-file spans on
    BOTH dimensions plus how many files a 1/16-slice predicate on the
    SECOND dimension has to scan. Z-order bounds both spans, so the
    y-probe prunes most files; the linear sort leaves span_y unbounded
    and the same probe scans everything — the number that justifies
    re-clustering a 100 TB table.

    Plan: ranks and file ids come from the parallel `global_index`
    idiom (range partition + broadcast prefix counts — a total sort
    with NO single-task window, i.e. exactly what writing sorted files
    does); the corpus count rides as a broadcast 1-row side; bucketing
    to 256 cells is exact integer `div`, the Morton ladder is the
    shared shift/mask text of q_zorder_curve. Everything stays int64,
    so both engines agree bit-for-bit."""
    from kafka_streams_clojure_spark.operators.order import global_index

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    nn = ev.agg(F.count("*").alias("n_rows"))
    # project consumed sort keys out between rankings (§2.3 — the
    # second/third range exchanges shouldn't carry them): user_id is
    # only ranking 1's key, value only ranking 2's
    r = global_index(
        global_index(ev, ["user_id", "event_id"], idx_col="rx").drop("user_id"),
        ["value", "event_id"],
        idx_col="ry",
    ).drop("value")
    b = r.crossJoin(F.broadcast(nn)).select(
        "event_id",
        "rx",
        F.expr("(rx * 256) div n_rows").alias("bx"),
        F.expr("(ry * 256) div n_rows").alias("by"),
    )
    z = b.withColumn("zval", morton2(F.col("bx"), F.col("by")))
    f = global_index(z, ["zval", "event_id"], idx_col="rz").select(
        "bx",
        "by",
        F.expr("rz div 100").alias("fid_z"),
        F.expr("rx div 100").alias("fid_lin"),
    )
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

    f = persist_if_uncached(f)

    def summarize(fid_col: str, scheme: str) -> DataFrame:
        hit = F.when(
            (F.min("by") <= _ZS_PROBE_HI) & (F.max("by") >= _ZS_PROBE_LO), 1
        ).otherwise(0)
        files = f.groupBy(fid_col).agg(
            (F.max("bx") - F.min("bx")).alias("span_x"),
            (F.max("by") - F.min("by")).alias("span_y"),
            hit.alias("hit"),
        )
        return files.agg(
            F.count("*").alias("n_files"),
            F.sum("span_x").cast("bigint").alias("sum_span_x"),
            F.sum("span_y").cast("bigint").alias("sum_span_y"),
            F.sum("hit").cast("bigint").alias("files_scanned"),
        ).select(F.lit(scheme).alias("scheme"), "*")

    return summarize("fid_z", "zorder").unionByName(
        summarize("fid_lin", "linear")
    )
