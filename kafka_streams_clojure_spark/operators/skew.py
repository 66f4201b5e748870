"""Skew-handling operators (100 TB posture, BASELINE.md).

AQE's skew-join splitting handles join-side skew automatically; this
module covers the remaining hot spot — aggregation over keys whose
group sizes are pathological (one user = 10% of a 100 TB stream).

``salted_agg`` implements the classic two-phase salt: rows get a
random-but-deterministic salt in [0, n), phase 1 aggregates on
(key, salt) — splitting a hot key across n reducers — phase 2 merges
the partials per key. Works for any algebraic aggregate (sum/count/
min/max); the helper wires sum+count so averages compose too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    sum_cols: dict[str, Column],
    n_salts: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase salted aggregation: per-key count + sums, skew-proof.

    ``sum_cols``: {output_name: row_expression} — each is decimal-cast
    summed (order-independent, oracle-exact) in both phases.

    The salt derives from ``monotonically_increasing_id()`` — unique
    per physical row, so even a hot key consisting of IDENTICAL
    repeated records spreads across all n salts (a content-derived
    hash would collapse duplicates onto one reducer). The salt never
    reaches the results, so nondeterminism is confined to partial
    placement.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("__salt")
    phase1 = (
        df.select(*df.columns, salt)
        .groupBy(*key_cols, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[
                F.sum(expr.cast("decimal(18,4)")).alias(f"__s_{name}")
                for name, expr in sum_cols.items()
            ],
        )
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("__n").alias(count_alias),
        *[
            F.sum(f"__s_{name}").cast("double").alias(name)
            for name in sum_cols
        ],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Replicate-side salted join — the explicit, engine-portable form
    of skew-join handling (AQE's skew split is the automatic one; this
    is what you reach for when a single join key is so hot that even a
    split partition won't fit an executor, or when AQE is off).

    The LEFT (skewed, large) side gets a per-row salt in ``[0, n)``
    derived from ``monotonically_increasing_id()`` (row-unique, so a
    hot key of identical records still spreads); the RIGHT side is
    replicated n× with every salt value via a posexplode of a
    ``sequence`` literal. Joining on ``on + [salt]`` then splits every
    hot key across n reducers at the cost of an n× exchange of the
    right side — pick the side to replicate accordingly (at 100 TB:
    fact gets the salt, dimension gets replicated). Result is
    row-identical to the plain join for ``inner`` and ``left`` joins
    (each left row carries exactly one salt, and its key's right
    matches all exist at that salt).

    ``right``/``full`` joins would need the salt on the other side —
    rejected explicitly rather than silently mis-joined.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} — for a "
            "right/full join swap the sides (salt the big side, replicate "
            "the small one)"
        )
    on = list(on)
    salted_l = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(replicated_r, on + ["__salt"], how).drop("__salt")


def hot_key_guard(
    df: DataFrame,
    key_cols: Sequence[str],
    max_count: int,
    op_name: str = "wedge_join",
    broadcast: bool = True,
) -> DataFrame:
    """IN-PLAN hot-key guard for quadratic fan-out operators (wedge /
    within-group self-joins, cost ∝ Σ_key d²): attach each row's key
    cardinality and ``raise_error`` at EXECUTION time if any key
    exceeds ``max_count`` — one pathological hub (a customer touching
    10% of suppliers, a basket holding the whole catalog) must fail
    LOUDLY naming the key, never silently go quadratic.

    Unlike the driver-side ``max_block`` collect in
    :func:`operators.similarity.embedding_cosine_near_dups`, this
    guard is purely lazy — no extra driver round-trip. Cost shape: the
    degree aggregate is map-side combined (shuffles ~one row per key),
    and the join back is a BROADCAST hash join of that key-width table
    (~16 B/key), so ``df`` itself is never reshuffled for the guard —
    measured at sf0.1 the broadcast join-back plus one-sided wrapping
    brings the guarded q_graph_link_prediction back to its unguarded
    time (~2.9s probe-normalized vs 4.7s with the naive shuffled
    join-back on both sides). Callers guarding a SELF-join wrap only
    ONE side: the degree table scans every key either way, and the
    trip fires regardless of which side carries the hot row. Pass
    ``broadcast=False`` if the key cardinality itself is too large to
    broadcast (then the join-back shuffles on ``key_cols`` — the same
    partitioning the downstream self-join needs, so AQE reuses the
    exchange). Returns ``df``'s rows unchanged (guard column dropped)
    when every key is within bound — INCLUDING null-keyed rows: the
    join-back uses ``eqNullSafe`` per key (null is a groupBy group, so
    it has a degree too and is guarded like any other key; a plain
    equi-join would silently drop — and silently NOT guard — them,
    violating the null-safe-operator rule).
    """
    keys = list(key_cols)
    deg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__kn"))
    deg = deg.select(
        *[F.col(k).alias(f"__hk{i}") for i, k in enumerate(keys)], "__kn"
    )
    if broadcast:
        deg = F.broadcast(deg)
    cond = F.lit(True)
    for i, k in enumerate(keys):
        cond = cond & df[k].eqNullSafe(F.col(f"__hk{i}"))
    guarded = df.join(deg, cond).drop(*[f"__hk{i}" for i in range(len(keys))])
    trip = F.when(
        F.col("__kn") > F.lit(max_count),
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op_name}: hot key exceeds max_count={max_count} "
                    "(per-key self-join is quadratic) — key=("
                ),
                F.concat_ws(
                    ",", *[F.col(k).cast("string") for k in keys]
                ),
                F.lit(") count="),
                F.col("__kn").cast("string"),
                F.lit(
                    "; cap with cap_per_key(), raise max_count, or "
                    "pre-split the key"
                ),
            )
        ),
    ).otherwise(F.lit(1))
    return guarded.withColumn("__guard", trip).filter(
        F.col("__guard") == 1
    ).drop("__kn", "__guard")


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    max_count: int,
    order_cols: Sequence[str],
) -> DataFrame:
    """DOCUMENTED-truncation alternative to :func:`hot_key_guard`:
    keep only the first ``max_count`` rows per key in deterministic
    ``order_cols`` order (ties must be broken by a unique column —
    the CLAUDE.md tiebreak rule). The wedge then costs at most
    Σ min(d, cap)² — a hub's neighborhood is SAMPLED, not enumerated;
    callers own the semantic loss and must say so in their docstring.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_count)
        .drop("__rn")
    )
