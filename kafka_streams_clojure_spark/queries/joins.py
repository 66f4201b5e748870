"""Join query keys (SURVEY.md §2.3).

The reference ships the ``value-joiner`` combine adapter (api.clj:90-94)
and declares the KS 1.0 join taxonomy as parity targets (README.md:30-32,
api.clj:53-55); semi/anti/theta/cross are the `[ext]` completions that
make the surface a full relational join algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators.joins import asof_join, interval_join
from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import dsum, load_table, load_tables, sql_dsum


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name,
           c_name || ':' || o_orderstatus AS joined_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join + the `value-joiner` combine step (api.clj:90-94):
    the output carries f(v_left, v_right). Catalyst broadcasts the
    customer side automatically (dimension-sized)."""
    orders, cust = load_tables(spark, sf_dir, "orders", "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey",
        "o_totalprice",
        "c_name",
        F.concat_ws(":", F.col("c_name"), F.col("o_orderstatus")).alias("joined_value"),
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """leftJoin parity — explicitly named by the reference (api.clj:55)."""
    orders, cust = load_tables(spark, sf_dir, "orders", "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name, o.n_orders
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
    FULL OUTER JOIN
         (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
    ON c.c_custkey = o.o_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (KS outerJoin parity, README.md:68-70): nulls on
    both sides."""
    orders, cust = load_tables(spark, sf_dir, "orders", "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return rich.join(per_cust, rich.c_custkey == per_cust.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_name", "n_orders"
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand,
           count(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlobalKTable-style join (KTable roadmap, README.md:33-34): the
    dimension is explicitly broadcast — zero shuffle of the fact table
    for the join; the only shuffle is the final small aggregation."""
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum(rev).alias("revenue"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 250000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence filtering (the relational form of
    branch-by-membership)."""
    orders, cust = load_tables(spark, sf_dir, "orders", "customer")
    big = orders.filter(F.col("o_totalprice") > 250000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: non-existence (KTable deletion semantics analog)."""
    orders, cust = load_tables(spark, sf_dir, "orders", "customer")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_theta",
    oracle="""
    SELECT p_partkey, s_suppkey
    FROM part JOIN supplier
      ON p_retailprice > s_acctbal AND p_size < s_suppkey % 64
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join — broadcast nested loop; only sane when one
    side is small, which Catalyst enforces by broadcasting supplier."""
    part, supp = load_tables(spark, sf_dir, "part", "supplier")
    cond = (part.p_retailprice > supp.s_acctbal) & (part.p_size < supp.s_suppkey % 64)
    return part.join(supp, cond).select("p_partkey", "s_suppkey")


@query(
    "q_join_cross",
    oracle="SELECT r_name, s_name FROM region CROSS JOIN supplier",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, supp = load_tables(spark, sf_dir, "region", "supplier")
    return region.crossJoin(supp).select("r_name", "s_name")


@query(
    "q_join_interval",
    oracle="""
    SELECT l.event_id AS purchase_id, r.event_id AS click_id,
           l.user_id AS user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 5 MINUTE
     AND r.ts <= l.ts + INTERVAL 5 MINUTE
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream⋈KStream windowed join, batch shadow (KS JoinWindows ±5min,
    README.md:30-32): clicks within 5 minutes of a purchase by the same
    user."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = interval_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower=F.expr("-INTERVAL 5 MINUTE"),
        upper=F.expr("INTERVAL 5 MINUTE"),
    )
    return joined.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.user_id").alias("user_id"),
    )


@query(
    "q_join_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, c.click_id, c.ts AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream⋈KTable enrichment join, batch shadow (README.md:30-34):
    each purchase sees the latest click state of its user at purchase
    time. Right side deduped per (key, ts) so ties are well-defined —
    the SURVEY §7 watch-list item."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id", "click_ts"],
        how="left",
    ).select("event_id", "user_id", "click_id", "click_ts")


@query(
    "q_join_salted",
    oracle="""
    SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate-side salted skew join (operators.skew.salted_join):
    lineitem (the big side) carries an 8-way row salt, orders is
    replicated 8x, the join keys on (orderkey, salt) — so a
    pathologically hot orderkey splits across 8 reducers instead of
    sinking one executor. Results are row-identical to the plain join,
    which IS the oracle."""
    from kafka_streams_clojure_spark.operators.skew import salted_join

    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    out = salted_join(
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"),
        orders.select("o_orderkey", "o_orderstatus"),
        on=["o_orderkey"],
        n_salts=8,
    )
    return out.select("o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity")


@query(
    "q_join_asof_forward",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, c.click_id, c.ts AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'; the
    "next state after" enrichment — e.g. first click following each
    purchase). Same one-shuffle union+window plan as the backward
    form, sorted descending; DuckDB's ASOF JOIN expresses it by
    flipping the inequality."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id", "click_ts"],
        how="left",
        direction="forward",
    ).select("event_id", "user_id", "click_id", "click_ts")


@query(
    "q_join_asof_bucketed",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, c.click_id, c.ts AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join at PRODUCTION SKEW — the KStream⋈KTable
    enrichment row (reference README.md:30-34) under the
    one-user-is-10%-of-the-stream load a real deployment sees
    (r6 verdict #3, SCALE.md "Joins"): identical semantics — and the
    identical DuckDB ``ASOF JOIN`` oracle text — as `q_join_asof`,
    but windowed over
    ``(user, day-bucket)`` instead of the user alone, with each
    bucket's inherited state carried in as a seed row
    (operators/joins.asof_join_bucketed). The plain form puts a hot
    user's ENTIRE history in one task's sort; here it splits across
    one task per day it spans, which is what survives the one-user-=-
    10%-of-the-stream case at 100 TB. Exactness is oracle-gated;
    the >1-task-per-hot-key split is pinned in
    tests/test_plan_shape.py."""
    from kafka_streams_clojure_spark.operators.joins import asof_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    return asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id", "click_ts"],
        bucket="1 day",
        how="left",
    ).select("event_id", "user_id", "click_id", "click_ts")


@query(
    "q_join_asof_tolerance",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.click_id END
             AS click_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.ts END
             AS click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with TOLERANCE (pandas merge_asof's max-staleness
    band): the latest click state attaches only while it is at most
    1 hour old at purchase time — stale state is nulled, the purchase
    row survives. This is the KStream⋈KTable-with-TTL enrichment
    shape: at 100 TB the tolerance is also the state-retention bound a
    streaming deployment would give the table side. Same one-shuffle
    union+window plan; the tolerance is a post-window null-out, not a
    second join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id", "click_ts"],
        how="left",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).select("event_id", "user_id", "click_id", "click_ts")


@query(
    "q_join_range_binned",
    oracle="""
    SELECT l.event_id AS error_id, r.event_id AS purchase_id
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') l
    JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') r
      ON abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 60000000
    """,
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS band join ("every purchase within ±1 minute of any
    error, across all users"): no equi conjunct exists, so the naive
    predicate is a quadratic nested-loop. operators.joins.range_join
    manufactures the equi key by interval binning (left exploded to
    its 3-bucket neighborhood) and runs a plain shuffled equi join +
    exact band filter — |L|·3 + |R| shuffle instead of |L|·|R| pairs.
    Plan-tested to contain no nested-loop/cartesian."""
    from kafka_streams_clojure_spark.operators.joins import range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("l_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("r_ts")
    )
    return range_join(
        errors, purchases, left_ts="l_ts", right_ts="r_ts", band="1 MINUTE"
    ).select("error_id", "purchase_id")


@query(
    "q_join_spatial_grid",
    oracle="""
    WITH p AS (
      SELECT c_custkey AS pid,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS x,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
                  AS BIGINT) % 1000000 AS y
      FROM customer
    ),
    c AS (SELECT pid, x, y, x // 10000 AS cx, y // 10000 AS cy FROM p),
    a AS (
      SELECT c.pid, c.x, c.y,
             c.cx + o1.dx AS probe_cx, c.cy + o2.dy AS probe_cy
      FROM c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) o1
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) o2
    )
    SELECT a.pid AS id_a, b.pid AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM a JOIN c b ON b.cx = a.probe_cx AND b.cy = a.probe_cy
                   AND a.pid < b.pid
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= 100000000
    """,
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL radius join via grid-cell blocking — the canonical
    geospatial join shape on Spark (no native spatial index): entities
    get deterministic integer coordinates in a 1000×1000 km plane
    (md5-derived, the engine-portable `_bucket` idiom), one side
    explodes to its 3×3 neighborhood of 10 km grid cells, candidates
    come from the (cell_x, cell_y) EQUI-join, and the exact integer
    squared-distance filter keeps pairs within the 10 km radius.
    Pigeonhole-exact: radius = cell size, so any qualifying pair
    differs by at most one cell per axis — zero recall loss, never
    points²; each pair matches through exactly ONE offset (the cell
    delta), so no dedup pass. All arithmetic is int64, hence
    engine-exact (a geodetic deployment computes equirectangular
    µ-degree deltas the same way; haversine's trig is libm-banned on
    oracle paths). Cost: 9·n probe rows against an n-row build — the
    sort-join profile that replaces the quadratic cross join; skewed
    hot cells would take the `max_bucket` loud-fail guard the
    perceptual-hash family uses."""
    cust = load_table(spark, sf_dir, "customer")
    hx = F.md5(F.col("c_custkey").cast("string"))

    def chunk(pos: int) -> "F.Column":
        return F.conv(F.substring(hx, pos, 8), 16, 10).cast("bigint")

    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        (chunk(1) % 1_000_000).alias("x"),
        (chunk(9) % 1_000_000).alias("y"),
    ).select(
        "pid",
        "x",
        "y",
        F.expr("x div 10000").alias("cx"),
        F.expr("y div 10000").alias("cy"),
    )
    offs = F.array(*[F.lit(v) for v in (-1, 0, 1)])
    a = (
        pts.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            F.col("pid").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("probe_cx"),
            (F.col("cy") + F.col("dy")).alias("probe_cy"),
        )
    )
    b = pts.select(
        F.col("pid").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(
            b,
            (F.col("probe_cx") == F.col("cx"))
            & (F.col("probe_cy") == F.col("cy"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(dist_sq <= 100_000_000)
        .select("id_a", "id_b", dist_sq.cast("bigint").alias("dist_sq"))
    )


@query(
    "q_geo_density_cores",
    oracle="""
    WITH p AS (
      SELECT c_custkey AS pid,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS x,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
                  AS BIGINT) % 1000000 AS y
      FROM customer
    ),
    c AS (SELECT pid, x, y, x // 10000 AS cx, y // 10000 AS cy FROM p),
    a AS (
      SELECT c.pid, c.x, c.y,
             c.cx + o1.dx AS probe_cx, c.cy + o2.dy AS probe_cy
      FROM c
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) o1
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) o2
    ),
    neigh AS (
      SELECT a.pid, count(*) AS n_neighbors
      FROM a JOIN c b ON b.cx = a.probe_cx AND b.cy = a.probe_cy
                     AND b.pid <> a.pid
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= 100000000
      GROUP BY a.pid
    )
    SELECT pid, CAST(n_neighbors AS BIGINT) AS n_neighbors
    FROM neigh WHERE n_neighbors >= 3
    """,
)
def q_geo_density_cores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN CORE-POINT detection over the grid-blocked spatial join
    (`q_join_spatial_grid`'s chain, asymmetric b.pid <> a.pid so the
    neighbor count is per-point): points with >= minPts=3 neighbors
    within the 10 km radius are density cores — the first (and
    distributable) stage of DBSCAN; full cluster expansion is the
    min-label closure the dedup_clusters operator already provides
    over core-core edges. Same pigeonhole-exact blocking and int64
    arithmetic, so the core set is engine-exact; cost 9·n probe rows,
    never points²."""
    cust = load_table(spark, sf_dir, "customer")
    hx = F.md5(F.col("c_custkey").cast("string"))

    def chunk(pos: int) -> "F.Column":
        return F.conv(F.substring(hx, pos, 8), 16, 10).cast("bigint")

    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        (chunk(1) % 1_000_000).alias("x"),
        (chunk(9) % 1_000_000).alias("y"),
    ).select(
        "pid",
        "x",
        "y",
        F.expr("x div 10000").alias("cx"),
        F.expr("y div 10000").alias("cy"),
    )
    offs = F.array(*[F.lit(v) for v in (-1, 0, 1)])
    a = (
        pts.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            F.col("pid").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("probe_cx"),
            (F.col("cy") + F.col("dy")).alias("probe_cy"),
        )
    )
    b = pts.select(
        F.col("pid").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(
            b,
            (F.col("probe_cx") == F.col("cx"))
            & (F.col("probe_cy") == F.col("cy"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .filter(dist_sq <= 100_000_000)
        .groupBy(F.col("id_a").alias("pid"))
        .agg(F.count("*").cast("bigint").alias("n_neighbors"))
        .filter(F.col("n_neighbors") >= 3)
    )
