"""Transducer-style combinator layer over DataFrames.

The reference makes a KStream a *transducible context*: any composable
transducer becomes a dataflow operator over ``[key value]`` records
(reference api.clj:36-51, README.md:58-64). Here the same contract is
expressed Spark-first: an **xform is any function DataFrame ->
DataFrame**, and :func:`compose` chains them left-to-right.

Because every combinator only builds lazy Catalyst plan nodes, a
composed pipeline is fused by whole-stage codegen into a single pass —
the exact analog of transducer fusion by ``comp`` (reference
api.clj:39), but vectorized and JVM-side instead of per-record Clojure.

Order-sensitive combinators (``dedupe``, ``take``, ``drop``,
``partition_by``, mirrors of the stateful Clojure transducers) require
an explicit ``order_by`` — DataFrames are unordered sets, so the
reference's implicit per-partition arrival order must be pinned to a
column. The reference's instances are per-Kafka-partition
(api.clj:41-45: a fresh transformer per task); we default to *global*
semantics (more useful analytically) and note per-key variants where
they exist.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

Xform = Callable[[DataFrame], DataFrame]
ColumnOrName = Union[Column, str]


def compose(*xforms: Xform) -> Xform:
    """Left-to-right composition: ``compose(f, g)(df) == g(f(df))``.

    Mirrors Clojure ``(comp f g)`` transducer order, where the first
    transducer in the ``comp`` is the first applied to each record
    (reference README.md:80-82 composes filter -> map -> filter).
    """

    def fused(df: DataFrame) -> DataFrame:
        for x in xforms:
            df = x(df)
        return df

    return fused


def transduce(df: DataFrame, *xforms: Xform) -> DataFrame:
    """``transduce-kstream`` analog (reference api.clj:49-51): install a
    composed pipeline on a source. Pure sugar for ``compose(...)(df)``."""
    return compose(*xforms)(df)


def filter_(pred: ColumnOrName) -> Xform:
    """Keep rows matching ``pred`` (reference README.md:80: ``(filter ...)``)."""
    return lambda df: df.filter(pred)


def remove(pred: Column) -> Xform:
    """Inverse filter — Clojure ``(remove pred)``."""
    return lambda df: df.filter(~pred)


def map_(*cols: ColumnOrName, **named: Column) -> Xform:
    """Project to a new row shape — Clojure ``(map f)`` over ``[k v]``
    (reference README.md:81 swaps key and value). ``named`` kwargs are
    aliased columns: ``map_(key=F.col("value"), value=F.col("key"))``."""
    aliased = [c.alias(n) for n, c in named.items()]
    return lambda df: df.select(*cols, *aliased)


def map_values(**named: Column) -> Xform:
    """KStream ``mapValues`` parity (reference README.md:68-70): rewrite
    some columns, keep the rest untouched (no re-key → no shuffle)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumns(dict(named))

    return apply


def select_key(key_expr: Column, key_col: str = "key") -> Xform:
    """``key-value-mapper`` re-key adapter (reference api.clj:96-100).
    In Spark the shuffle this implies happens lazily at the next
    key-dependent operator (join/groupBy), not eagerly."""
    return lambda df: df.withColumn(key_col, key_expr)


def keep(expr: Column, alias: str, *carry: ColumnOrName) -> Xform:
    """Clojure ``(keep f)``: map then drop nulls of the mapped value."""
    return lambda df: df.select(*carry, expr.alias(alias)).filter(F.col(alias).isNotNull())


def flat_map(array_expr: Column, alias: str, *carry: ColumnOrName) -> Xform:
    """``mapcat`` / KStream ``flatMap``: one row -> 0..N rows via an
    array-valued expression + ``explode`` (stays in codegen — no UDF)."""
    return lambda df: df.select(*carry, F.explode(array_expr).alias(alias))


def flat_map_values(array_expr: Column, alias: str, *keys: ColumnOrName) -> Xform:
    """KStream ``flatMapValues`` parity: explode the value, carry keys."""
    return flat_map(array_expr, alias, *keys)


def branch(df: DataFrame, *preds: Column, persist: bool = True) -> list[DataFrame]:
    """Multi-way first-match split (reference api.clj:62-68).

    Kafka Streams ``branch`` contract: each record goes to the FIRST
    predicate it matches; records matching none are dropped. Expressed
    as masked filters ``p_i & ~p_0 & ... & ~p_{i-1}`` over one parent.
    The parent is persisted so N branches read the source once —
    at scale this is the difference between 1 scan and N scans.
    """
    if persist:
        df = persist_if_uncached(df)
    out: list[DataFrame] = []
    seen: Column | None = None
    for p in preds:
        # Kafka Streams treats a non-TRUE predicate as no-match; a SQL
        # NULL predicate must therefore fall through to later branches,
        # not poison the mask (TRUE & ~NULL = NULL would drop the row
        # from every branch). Null-safe coercion to boolean TRUE/FALSE.
        pt = p.eqNullSafe(F.lit(True))
        mask = pt if seen is None else (pt & ~seen)
        out.append(df.filter(mask))
        seen = pt if seen is None else (seen | pt)
    return out


def branch_map(df: DataFrame, pred_map: dict[str, Column], persist: bool = True) -> dict[str, DataFrame]:
    """Named variant (reference api.clj:70-88): ``{name: pred}`` ->
    ``{name: DataFrame}``, same ordered first-match contract (Python
    dicts preserve insertion order, like the reference's ordered
    destructuring of its map literal)."""
    names = list(pred_map)
    branches = branch(df, *pred_map.values(), persist=persist)
    return dict(zip(names, branches))


def merge(*others: DataFrame) -> Xform:
    """KStream ``merge`` parity: union by column name."""

    def apply(df: DataFrame) -> DataFrame:
        for o in others:
            df = df.unionByName(o)
        return df

    return apply


def distinct(subset: Sequence[str] | None = None) -> Xform:
    """Global de-dup — Clojure ``(distinct)`` transducer. Shuffles on
    the dedup columns; at scale prefer a subset of low-cardinality
    columns or ``dropDuplicatesWithinWatermark`` on streams."""
    return lambda df: df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedupe(value_cols: Sequence[str], order_by: Sequence[ColumnOrName], partition_by_cols: Sequence[ColumnOrName] = ()) -> Xform:
    """Clojure ``(dedupe)``: drop *consecutive* duplicates in
    ``order_by`` order (optionally per partition key). Implemented with
    ``lag`` — one shuffle+sort, no Python."""

    def apply(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*partition_by_cols).orderBy(*order_by)
        prev = [F.lag(c).over(w).alias(f"__prev_{c}") for c in value_cols]
        changed = None
        out = df.select("*", F.row_number().over(w).alias("__rn"), *prev)
        for c in value_cols:
            # null-safe: a null value differing from its neighbor must
            # still count as a change (plain != yields SQL NULL there,
            # which filter() would drop — verified failure mode)
            diff = ~F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
            changed = diff if changed is None else (changed | diff)
        keep = (F.col("__rn") == 1) | changed
        return out.filter(keep).drop("__rn", *[f"__prev_{c}" for c in value_cols])

    return apply


def take(
    n: int,
    order_by: Sequence[ColumnOrName] = (),
    per_partition_key: Sequence[ColumnOrName] = (),
) -> Xform:
    """Clojure ``(take n)``. Two fidelity modes:

    - global (default): first n rows in a pinned order — orderBy+limit
      (TakeOrderedAndProject: per-partition heaps, never a full sort);
    - ``per_partition_key``: the REFERENCE's semantics — its stateful
      transducers run fresh per Kafka partition (api.clj:41-45), i.e.
      n records *per key-partition*. Implemented as a ranking window
      partitioned by the key: one shuffle on the key, and Spark's
      WindowGroupLimit prunes to n rows per group before the exchange.
    """

    def apply(df: DataFrame) -> DataFrame:
        if per_partition_key:
            if not order_by:
                raise ValueError(
                    "take(per_partition_key=...) requires order_by: 'first n "
                    "per key' is undefined without a deterministic row order "
                    "(row_number needs ORDER BY)"
                )
            w = Window.partitionBy(*per_partition_key).orderBy(*order_by)
            return (
                df.withColumn("__take_rn", F.row_number().over(w))
                .filter(F.col("__take_rn") <= n)
                .drop("__take_rn")
            )
        if order_by:
            df = df.orderBy(*order_by)
        return df.limit(n)

    return apply


def drop(n: int, order_by: Sequence[ColumnOrName]) -> Xform:
    """Clojure ``(drop n)`` — skip the first n in a pinned order."""

    def apply(df: DataFrame) -> DataFrame:
        return df.orderBy(*order_by).offset(n)

    return apply


def partition_all(n: int, order_by: Sequence[ColumnOrName], batch_col: str = "batch_id") -> Xform:
    """Clojure ``(partition-all n)``: fixed-size batches in a pinned
    global order — ``batch_id = floor(global_index/n)``. Uses the
    parallel zipWithIndex idiom (range partition + broadcast prefix
    counts), not a single-task global window sort. (On streams
    micro-batching is native; this is the batch analog.)"""

    def apply(df: DataFrame) -> DataFrame:
        from kafka_streams_clojure_spark.operators.order import global_index

        indexed = global_index(df, order_by, idx_col="__gidx")
        return indexed.withColumn(
            batch_col, F.floor(F.col("__gidx") / F.lit(n))
        ).drop("__gidx")

    return apply


def partition_by(change_expr: Column, order_by: Sequence[ColumnOrName], group_col: str = "run_id", partition_cols: Sequence[ColumnOrName] = ()) -> Xform:
    """Clojure ``(partition-by f)``: assign a run id that increments
    whenever ``change_expr`` changes in ``order_by`` order — the
    classic gaps-and-islands idiom (lag + running sum)."""

    def apply(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*partition_cols).orderBy(*order_by)
        prev = F.lag(change_expr).over(w)
        # null-safe change detection (plain != is NULL around null
        # values, mis-merging runs); the first row is always a new run
        # even when its change value is null.
        is_new = F.when(
            (F.row_number().over(w) == 1) | ~change_expr.eqNullSafe(prev), F.lit(1)
        ).otherwise(F.lit(0))
        return df.withColumn(group_col, F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))

    return apply
