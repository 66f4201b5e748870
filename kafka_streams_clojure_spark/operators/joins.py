"""Join operators beyond vanilla ``DataFrame.join``.

The reference declares join parity as its top roadmap item
(reference README.md:30-32 "Helper transducers for stateful
computations like joins"; api.clj:53-55 names leftJoin) and ships the
``value-joiner`` combine adapter (api.clj:90-94). Vanilla equi/theta
joins map 1:1 onto ``df.join`` and need no code here; this module adds
the two KS-specific temporal shapes:

- :func:`asof_join` — the batch shadow of the KStream⋈KTable
  enrichment join (each stream record sees the *latest* table state at
  its timestamp, README.md:30-34).
- :func:`interval_join` — the batch shadow of the KStream⋈KStream
  windowed join (KS ``JoinWindows``: match records within ±Δ).

Scale notes: ``asof_join`` is a union + one shuffle/sort per key — no
range explosion, no per-key cartesian; it scales like a sort-merge
join and works identically at 100 TB. ``interval_join`` relies on the
equi-key conjunct for the shuffle and applies the time band as a
post-filter (Spark stream-stream joins use exactly this plan shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _interval_micros(interval: Column) -> Column:
    """Length of a day-time interval in microseconds, timezone-INDEPENDENT.

    The previous idiom ``unix_micros(lit('1970-01-01 00:00:00')
    .cast('timestamp') + interval)`` parses the epoch string in the
    SESSION timezone, so the result was ``interval_us - tz_offset_us``:
    in a session east of UTC with an interval shorter than the offset
    (e.g. '6 hours' at UTC+8) the modulus went zero/negative,
    ``floor(ts/us)`` became non-monotonic, and the bucketed as-of's
    seed-carry window silently pulled FUTURE right-state into earlier
    buckets. ``timestamp_micros(0)`` is epoch UTC in every session.

    The guard branch is literal-foldable, so Catalyst raises at
    optimization time for a non-positive interval instead of emitting
    wrong buckets per row.
    """
    us = F.unix_micros(F.timestamp_micros(F.lit(0)) + interval)
    return F.when(us > 0, us).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval must be a positive day-time interval, got "),
                us.cast("string"),
                F.lit(" microseconds"),
            )
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "left",
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the newest right row of the same key
    with ``right_ts <= left_ts`` (inclusive — DuckDB/pandas ASOF
    semantics). ``direction='forward'`` flips the inequality (nearest
    right row with ``right_ts >= left_ts``, pandas merge_asof's
    forward mode; DuckDB expresses it as ``ASOF JOIN ... ON l.ts <=
    r.ts``) — same one-shuffle plan, sorted descending.

    Implementation: tag and union both sides, then a single
    ``last(..., ignorenulls)`` window over (key, ts) — one shuffle +
    sort, linear in input size. At equal timestamps the right row
    sorts first, making the match inclusive; callers must ensure the
    right side is unique per (key, ts) (dedupe first) or the picked
    row among ties is unspecified — the same contract DuckDB's
    ASOF JOIN has.

    ``tolerance``: optional max age (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    — matches older than ``left_ts - tolerance`` are nulled out.
    """
    lcols = left.columns
    # Null-key / null-ts right rows can never be an as-of match (ASOF
    # equi+inequality semantics); left unfiltered, they would sort
    # first in the window and masquerade as "oldest state".
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts"))
    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__probe"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__r"),
    )
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__probe"),
        F.lit(None).cast(lhs.schema["__l"].dataType.simpleString()).alias("__l"),
        payload.alias("__r"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward'|'forward', got {direction!r}")
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lhs.unionByName(rhs)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__probe") == 1)
    )
    if tolerance is not None:
        lt_type = dict(left.dtypes)[left_ts]
        if "timestamp" not in lt_type:
            raise ValueError(
                f"tolerance requires timestamp ts columns; {left_ts!r} is {lt_type}"
            )
        in_band = (
            F.col("__match.__rts") >= F.col("__ts") - tolerance
            if direction == "backward"
            else F.col("__match.__rts") <= F.col("__ts") + tolerance
        )
        matched = matched.withColumn(
            "__match", F.when(in_band, F.col("__match"))
        )
    out = matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    return out


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    bucket: str = "1 day",
    how: str = "left",
    tolerance: Column | None = None,
) -> DataFrame:
    """:func:`asof_join` with the documented hot-key mitigation
    (SCALE.md "Joins"): the plain form windows over the KEY alone, so
    one pathological key (a user holding 10% of a 100 TB stream) lands
    its entire history in ONE task's sort. This variant pre-splits by
    TIME BUCKET and windows over ``(key, bucket)`` — a hot key spreads
    across as many tasks as it spans buckets — and stays EXACT by
    carrying each bucket's inherited state as a seed row:

    1. per ``(key, bucket)`` the newest right payload (``max_by`` —
       map-side combined, shuffles one row per key-bucket);
    2. a running ``last(ignorenulls)`` over the per-bucket lasts in
       bucket order, frame ending at the PREVIOUS bucket — the state a
       bucket inherits from everything before it. This window is per
       key over #buckets-per-key rows (bounded: stream span ÷ bucket),
       not per event — the whole point;
    3. the within-bucket as-of: union seed rows (sort first in their
       bucket) + right rows + left probes, one ``last(ignorenulls)``
       window over ``(key, bucket)``.

    Result rows are identical to ``asof_join`` (same oracle text
    applies); cost is one extra small shuffle (per-bucket lasts + the
    distinct bucket spine). Backward direction only — the forward
    mirror would carry each bucket's FIRST state from the next bucket.
    Same contracts as :func:`asof_join`: right side unique per
    ``(key, ts)``; null-key/null-ts right rows can never match; a
    null-ts LEFT row matches nothing (it buckets to null, which
    inherits no seed — exactly the plain form's nulls-first sort).

    ``bucket``: a day-time interval string (e.g. ``"1 day"``,
    ``"6 hours"``). Pick it so rate × bucket rows fit one task
    comfortably; too fine costs seed-spine rows, too coarse stops
    splitting the hot key.
    """
    if how not in ("left", "inner"):
        raise ValueError(
            f"asof_join_bucketed supports how='left'|'inner', got {how!r}"
        )
    lcols = left.columns
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    payload = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
    )
    bucket_us = _interval_micros(F.expr(f"INTERVAL {bucket}"))
    rtype = right.select(payload.alias("p")).schema["p"].dataType.simpleString()

    lhs = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.floor(F.unix_micros(F.col(left_ts)) / bucket_us).alias("__b"),
        F.lit(1).alias("__probe"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    ltype = lhs.schema["__l"].dataType.simpleString()
    rhs = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.floor(F.unix_micros(F.col(right_ts)) / bucket_us).alias("__b"),
        F.lit(0).alias("__probe"),
        F.lit(None).cast(ltype).alias("__l"),
        payload.alias("__r"),
    )

    # (2) the seed spine: every (key, bucket) either side touches,
    # joined to the per-bucket newest right payload, then the running
    # inherited state — frame ends at the PREVIOUS bucket so a bucket
    # never sees its own rows through the seed.
    per_bucket = rhs.groupBy("__k", "__b").agg(
        F.max_by("__r", "__ts").alias("__last")
    )
    spine = (
        lhs.select("__k", "__b")
        .unionByName(per_bucket.select("__k", "__b"))
        .distinct()
    )
    wseed = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seeds = (
        spine.join(per_bucket, ["__k", "__b"], "left")
        .withColumn("__carry", F.last("__last", ignorenulls=True).over(wseed))
        .filter(F.col("__carry").isNotNull())
        .select(
            "__k",
            F.lit(None).cast("timestamp").alias("__ts"),  # sorts first
            "__b",
            F.lit(-1).alias("__probe"),
            F.lit(None).cast(ltype).alias("__l"),
            F.col("__carry").alias("__r"),
        )
    )

    # (3) the within-bucket as-of — identical to asof_join's window but
    # partitioned by (key, BUCKET): the hot-key split.
    w = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__ts").asc(), F.col("__probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lhs.unionByName(rhs)
        .unionByName(seeds)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__probe") == 1)
    )
    if tolerance is not None:
        lt_type = dict(left.dtypes)[left_ts]
        if "timestamp" not in lt_type:
            raise ValueError(
                f"tolerance requires timestamp ts columns; {left_ts!r} is {lt_type}"
            )
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__match.__rts") >= F.col("__ts") - tolerance,
                F.col("__match"),
            ),
        )
    out = matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """KS ``JoinWindows`` analog: join rows of the same key whose
    timestamps satisfy ``left_ts + lower <= right_ts <= left_ts +
    upper``. The equi conjunct drives the shuffle; the band is a
    post-join filter (AQE handles skewed keys)."""
    lt, rt = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + lower)
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + upper)
    )
    return lt.join(rt, cond, how)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band,
    how: str = "inner",
) -> DataFrame:
    """KEYLESS time-band join: match every (l, r) pair with
    ``|r.ts - l.ts| <= band`` — without an equi-key conjunct Catalyst
    can only plan the raw predicate as a broadcast-nested-loop /
    cartesian, which is quadratic and dies at scale. This operator
    manufactures the missing equi key by BINNING: each side gets a
    bucket id ``floor(epoch_us / band_us)``; any in-band pair's
    buckets differ by at most 1, so the left side explodes to its
    {b-1, b, b+1} neighborhood (3×, constant) and the join runs as a
    plain shuffled EQUI join on the bucket, with the exact band
    predicate as a post-filter. Shuffle ∝ 3·|L| + |R|, never |L|·|R|
    — the standard interval-bin rewrite.

    ``band``: a ``str``/``Column`` interval (e.g. ``"1 minute"``).
    Only ``inner`` is supported — outer keyless band joins need
    dedup-after-explode bookkeeping that belongs to the caller.

    The returned columns are ``left.* + right.*`` (both timestamp
    columns kept; rename before joining if the names collide).
    """
    if how != "inner":
        raise ValueError(f"range_join supports how='inner' only, got {how!r}")
    band_col = F.expr(f"INTERVAL {band}") if isinstance(band, str) else band
    # band length in microseconds, computed in-plan, TZ-independent
    # (works for any day-time interval literal)
    band_us = _interval_micros(band_col)
    lb = F.floor(F.unix_micros(F.col(left_ts)) / band_us)
    rb = F.floor(F.unix_micros(F.col(right_ts)) / band_us)
    lhs = left.withColumn(
        "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rhs = right.withColumn("__bucket", rb)
    out = lhs.join(rhs, "__bucket").filter(
        F.abs(
            F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))
        )
        <= band_us
    )
    return out.drop("__bucket")
