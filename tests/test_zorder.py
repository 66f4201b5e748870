"""Morton / Z-order curve invariants: exact round-trip, the
tile-contiguity property that makes file skipping work, and a
file-bounding-box demo against a single-column sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators.order import (
    compact_bits,
    morton2,
    morton2_inverse,
    spread_bits,
)
from kafka_streams_clojure_spark.queries._util import load_table


def _grid(spark, n):
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )


def test_morton_roundtrip_bijective(spark):
    """morton2 is a bijection on the 16-bit × 16-bit domain: inverse
    recovers (x, y) exactly, and all z keys are distinct (64×64 grid +
    the corners of the full domain)."""
    corners = spark.createDataFrame(
        [(0, 65535), (65535, 0), (65535, 65535), (12345, 54321)],
        "x long, y long",
    )
    pts = _grid(spark, 64).unionByName(corners)
    z = pts.select("x", "y", morton2(F.col("x"), F.col("y")).alias("z"))
    xi, yi = morton2_inverse(F.col("z"))
    bad = z.filter((xi != F.col("x")) | (yi != F.col("y"))).count()
    assert bad == 0
    assert z.select("z").distinct().count() == z.count()


def test_morton_tile_contiguity(spark):
    """Points inside any aligned 2^k × 2^k tile occupy EXACTLY the
    contiguous z range [morton(tile origin), +4^k) — the property that
    lets a box filter prune to O(few) file ranges. Checked for every
    8×8 tile of a 64×64 grid."""
    k = 3
    z = _grid(spark, 64).select(
        (F.col("x") / (1 << k)).cast("long").alias("tx"),
        (F.col("y") / (1 << k)).cast("long").alias("ty"),
        morton2(F.col("x"), F.col("y")).alias("z"),
    )
    tiles = z.groupBy("tx", "ty").agg(
        F.min("z").alias("lo"), F.max("z").alias("hi"), F.count("*").alias("n")
    )
    side = 1 << (2 * k)
    bad = tiles.filter(
        (F.col("hi") - F.col("lo") != side - 1) | (F.col("n") != side)
    ).count()
    assert bad == 0
    origin = morton2(F.col("tx") * (1 << k), F.col("ty") * (1 << k))
    assert tiles.filter(F.col("lo") != origin).count() == 0


def test_spread_compact_inverse(spark):
    df = spark.range(1000).select((F.col("id") * 61 % 65536).alias("v"))
    bad = df.filter(compact_bits(spread_bits(F.col("v"))) != F.col("v")).count()
    assert bad == 0


def test_zorder_layout_bounds_both_dims(spark, sf_dir, tmp_path):
    """Files written in z-key range order have small bounding boxes in
    BOTH dimensions; a user_id-only sort leaves the value dimension
    unclustered. This is the min/max-stats file-skipping payoff."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.floor("value").cast("long").alias("vbin")
    )
    span = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("du"),
        (F.max("vbin") - F.min("vbin")).alias("dv"),
    ).first()

    zed = ev.withColumn("zkey", morton2(F.col("user_id"), F.col("vbin")))
    zp = str(tmp_path / "zorder")
    zed.repartitionByRange(8, "zkey").sortWithinPartitions("zkey").write.parquet(zp)

    boxes = (
        spark.read.parquet(zp)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("user_id") - F.min("user_id")).alias("bu"),
            (F.max("vbin") - F.min("vbin")).alias("bv"),
        )
    )
    rel = boxes.select(
        F.avg(
            (F.col("bu") / F.lit(float(span.du)))
            * (F.col("bv") / F.lit(float(span.dv)))
        ).alias("area")
    ).first()
    # 8 z-range files → each box covers ~1/8 of the plane; allow 2×.
    assert rel.area < 0.25, f"z-order files not clustered: avg rel box area {rel.area}"


def test_ranked_prefix_sum_matches_window(spark, sf_dir):
    """ranked_prefix_sum == the single-task sum() OVER (ORDER BY ...)
    it parallelizes, on decimal values (exact), across several
    partition counts (layout independence)."""
    from pyspark.sql import Window as W

    from kafka_streams_clojure_spark.operators.order import ranked_prefix_sum
    from kafka_streams_clojure_spark.queries._util import load_table

    o = load_table(spark, sf_dir, "orders")
    t = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s")
    )
    w = W.orderBy(F.col("s").desc(), "o_custkey").rowsBetween(
        W.unboundedPreceding, 0
    )
    exp = {
        r.o_custkey: (r.rnk, r.cum)
        for r in t.select(
            "o_custkey",
            F.row_number().over(W.orderBy(F.col("s").desc(), "o_custkey")).alias("rnk"),
            F.sum("s").over(w).alias("cum"),
        ).collect()
    }
    for n_parts in (3, 8):
        got = {
            r.o_custkey: (r.rnk, r.cum)
            for r in ranked_prefix_sum(
                t,
                order_by=[F.col("s").desc(), F.col("o_custkey")],
                value_col="s",
                idx_col="rnk",
                cum_col="cum",
                num_partitions=n_parts,
            ).collect()
        }
        assert got == exp, f"divergence at num_partitions={n_parts}"


def test_zorder_skipping_prunes_second_dimension(spark, sf_dir):
    """The claim q_zorder_skipping exists to measure: under the Morton
    layout a probe on the SECOND dimension scans strictly fewer files
    than under the single-column (first-dimension) sort, and the
    summed per-file y-spans are strictly smaller — the parquet
    min/max-stat pruning win that justifies re-clustering."""
    from kafka_streams_clojure_spark.queries.sorts import q_zorder_skipping

    rows = {r.scheme: r for r in q_zorder_skipping(spark, sf_dir).collect()}
    assert set(rows) == {"zorder", "linear"}
    z, lin = rows["zorder"], rows["linear"]
    assert z.n_files == lin.n_files  # same table, same file size
    # the linear layout sorts by x only: y is unclustered, the y-probe
    # scans (almost) everything; z-order bounds both dimensions
    assert z.files_scanned < lin.files_scanned
    assert z.sum_span_y < lin.sum_span_y
    # the price: x-spans widen vs a perfect x-sort, but stay bounded
    assert z.sum_span_x >= lin.sum_span_x
