"""Scale-safe global-order primitives (the zipWithIndex idiom in
DataFrame form).

A bare ``Window.orderBy(...)`` with no ``partitionBy`` funnels the
WHOLE table through one task — fine for a 10k-row report, fatal at
100 TB. These helpers keep a pinned global total order while staying
parallel:

1. ``repartitionByRange`` on the order key → a parallel range sort
   (each partition holds a contiguous key range, sorted within);
2. per-partition local indexes from ``monotonically_increasing_id``
   (pid << 33 | local_counter — no window, fully codegen);
3. a tiny per-partition summary (counts / flag-mins — one row per
   partition) prefix-scanned and broadcast back.

The range-partitioned intermediate is consumed by two plan branches
(the rows and the per-partition summary). Range partitioning samples
its child to pick boundaries, so two independent exchanges could pick
DIFFERENT boundaries — the intermediate is therefore persisted so both
branches read the SAME partitioning (at cluster scale swap persist for
localCheckpoint if memory is tight; the summary is one row per
partition either way).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

ColumnOrName = Column | str

#: mask for the per-partition counter bits of monotonically_increasing_id
_MID_MASK = (1 << 33) - 1


def _ranged(
    df: DataFrame,
    order_by: Sequence[ColumnOrName],
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort on the order key, stamp partition id and
    the per-partition 0-based local index. Persisted (see module doc).
    ``order_by`` must totally order rows (include a unique tiebreaker)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(num_partitions, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__local_idx", F.col("__mid").bitwiseAND(F.lit(_MID_MASK)))
        .drop("__mid")
    )
    return persist_if_uncached(d)


def global_index(
    df: DataFrame,
    order_by: Sequence[ColumnOrName],
    idx_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based dense global sequence numbers in a pinned total order,
    without a single-task sort: local index + broadcast prefix counts.
    Equivalent to ``row_number() OVER (ORDER BY ...) - 1``."""
    d = _ranged(df, order_by, num_partitions)
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # one row per partition — the unpartitioned window here is over
    # #partitions rows, not the data
    offsets = (
        d.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        d.join(F.broadcast(offsets), "__pid")
        .withColumn(idx_col, (F.col("__local_idx") + F.col("__off")).cast("long"))
        .drop("__pid", "__local_idx", "__off")
    )


def ranked_prefix_sum(
    df: DataFrame,
    order_by: Sequence[ColumnOrName],
    value_col: str,
    idx_col: str = "idx",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based rank AND running sum of ``value_col`` in a pinned
    total order — `sum(x) OVER (ORDER BY ...)` without the single-task
    global window: per-range-partition local cumsums + ONE broadcast
    prefix of per-partition (count, sum) summaries (the
    :func:`global_index` idiom extended to an arbitrary monoid).
    Exactness: pass a DECIMAL-cast ``value_col`` and the partition
    split can't change the totals (decimal addition is associative
    exactly; a double column would make the result layout-dependent).
    """
    d = _ranged(df, order_by, num_partitions)
    w_local = Window.partitionBy("__pid").orderBy("__local_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # one row per partition — the window is over #partitions rows
    offsets = (
        d.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"), F.sum(value_col).alias("__psum"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__coff"),
            F.sum("__psum").over(w_prev).alias("__soff"),
        )
    )
    return (
        d.withColumn("__lcum", F.sum(value_col).over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(idx_col, (F.col("__local_idx") + F.col("__coff") + 1).cast("long"))
        .withColumn(
            cum_col,
            F.when(F.col("__soff").isNull(), F.col("__lcum")).otherwise(
                F.col("__lcum") + F.col("__soff")
            ),
        )
        .drop("__pid", "__local_idx", "__lcum", "__coff", "__soff")
    )


# Morton (Z-order) interleave: the space-filling-curve layout key for
# MULTI-dimensional pruning. Sorting/range-partitioning by a single
# column clusters one dimension only; writing files ordered by
# morton2(x, y) keeps every file's (x, y) bounding box small, so a scan
# filtered on EITHER dimension (or a 2-D box) skips most files via
# parquet min/max stats — the Databricks Z-ORDER / Iceberg sort-order
# technique expressed as a plain deterministic integer column. Pure
# shift/mask integer ops → codegen on Spark, bit-identical in any
# engine (oracle-able).

#: (shift, mask) ladder spreading 16 bits into the even bit positions
_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def spread_bits(col: Column, bits: int = 16) -> Column:
    """The low ``bits`` of ``col`` moved to even bit positions (bit i →
    bit 2i). Two's-complement masking makes negative inputs well-defined
    and engine-identical."""
    c = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    for sh, mask in _SPREAD:
        c = c.bitwiseOR(F.shiftleft(c, sh)).bitwiseAND(F.lit(mask))
    return c


def morton2(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave two ``bits``-bit integers into the Z-order curve key:
    result bit 2i = bit i of x, bit 2i+1 = bit i of y."""
    return spread_bits(x, bits).bitwiseOR(F.shiftleft(spread_bits(y, bits), 1))


def compact_bits(col: Column) -> Column:
    """Inverse of :func:`spread_bits`: gather the even bit positions
    back into the low 16 bits."""
    c = col.cast("long").bitwiseAND(F.lit(0x55555555))
    for sh, mask in ((1, 0x33333333), (2, 0x0F0F0F0F), (4, 0x00FF00FF), (8, 0x0000FFFF)):
        c = c.bitwiseOR(F.shiftright(c, sh)).bitwiseAND(F.lit(mask))
    return c


def morton2_inverse(z: Column) -> tuple[Column, Column]:
    """(x, y) back out of a :func:`morton2` key."""
    return compact_bits(z), compact_bits(F.shiftright(z, 1))


def _sql_spread(expr: str, bits: int = 16) -> str:
    e = f"(({expr}) & {(1 << bits) - 1})"
    for sh, mask in _SPREAD:
        e = f"((({e}) | (({e}) << {sh})) & {mask})"
    return e


def morton2_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB/ANSI twin of :func:`morton2` — textual shift/mask ladder
    over the same constants, so oracle parity is structural."""
    return f"({_sql_spread(x_expr, bits)} | ({_sql_spread(y_expr, bits)} << 1))"


def _prefix_ok(
    df: DataFrame,
    pred: Column,
    order_by: Sequence[ColumnOrName],
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows annotated with ``__run_ok``/``__prior_ok`` — the parallel
    two-phase prefix scan shared by :func:`take_while_global` and
    :func:`drop_while_global`: running min of the predicate flag within
    each range partition, plus the broadcast min over all EARLIER
    partitions. A row is in the satisfying prefix iff both are 1."""
    d = _ranged(df, order_by, num_partitions)
    flag = F.when(pred, F.lit(1)).otherwise(F.lit(0))
    wp = Window.partitionBy("__pid").orderBy("__local_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_prefix = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    prior = (
        d.groupBy("__pid")
        .agg(F.min(flag).alias("__pmin"))
        .withColumn(
            "__prior_ok", F.coalesce(F.min("__pmin").over(w_prefix), F.lit(1))
        )
        .select("__pid", "__prior_ok")
    )
    return d.withColumn("__run_ok", F.min(flag).over(wp)).join(
        F.broadcast(prior), "__pid"
    )


def take_while_global(
    df: DataFrame,
    pred: Column,
    order_by: Sequence[ColumnOrName],
    num_partitions: int | None = None,
) -> DataFrame:
    """Longest prefix satisfying ``pred`` in a pinned total order —
    ``(take-while pred)`` — as a parallel two-phase prefix scan
    (:func:`_prefix_ok`), never a single-task global window."""
    return (
        _prefix_ok(df, pred, order_by, num_partitions)
        .filter((F.col("__run_ok") == 1) & (F.col("__prior_ok") == 1))
        .drop("__pid", "__local_idx", "__run_ok", "__prior_ok")
    )


def drop_while_global(
    df: DataFrame,
    pred: Column,
    order_by: Sequence[ColumnOrName],
    num_partitions: int | None = None,
) -> DataFrame:
    """Complement suffix of :func:`take_while_global` — ``(drop-while
    pred)``: everything FROM the first row failing ``pred`` onward, in
    the same pinned total order. Same two-phase prefix scan; the filter
    keeps rows where the running-prefix flag has dropped to 0 (either
    within this range partition or in any earlier one). take-while ∪
    drop-while = df exactly, disjointly — the transducer-pair contract
    (reference api.clj:39 names the transducible context both ride)."""
    return (
        _prefix_ok(df, pred, order_by, num_partitions)
        .filter((F.col("__run_ok") == 0) | (F.col("__prior_ok") == 0))
        .drop("__pid", "__local_idx", "__run_ok", "__prior_ok")
    )
