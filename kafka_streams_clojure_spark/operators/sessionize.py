"""Vectorized gap+cap session scan — the shared kernel behind
`q_agg_session_capped` (batch grouped-map) and
`streaming/stateful.capped_sessionizer` (per-key engine state).

Semantics (the GA4/Amplitude session model, oracle-pinned by the
recursive-CTE twin in queries/streaming_keys.py): scanning a user's
events in (ts, id) order, an event STARTS a new session when its gap
from the previous event exceeds ``gap_us`` OR its distance from the
current session's START exceeds ``cap_us``. The cap makes the scan
genuinely sequential (each break depends on the running session start),
but it does NOT need a per-row Python loop (the r9 verdict's last
row-at-a-time batch path):

- gap breaks depend only on CONSECUTIVE events, independent of session
  assignment, so ``np.diff(tu) > gap_us`` finds them all in one
  vectorized pass;
- within a gap-run the events are time-sorted, so the cap break for a
  session starting at ``tu[i]`` is ``searchsorted(tu, tu[i]+cap_us,
  'right')`` — one O(log n) probe.

The Python loop that remains advances ONE ITERATION PER SESSION (not
per event), each iteration two C-level probes — events/session is the
compression factor (≈14× on the sf0.1 fixture). Equivalence with the
per-row scan is pinned by tests/test_capped_sessionize.py (planted
boundary cases + random fuzz vs a reference rescan) and by the standing
recursive-CTE oracle at both SFs.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: open-session state tuple: (last_used_idx, start_us, prev_us, count);
#: count == 0 means "no open session" (idx then carries the last index
#: ever emitted, so the next session gets idx+1 — streaming resume).
State = tuple[int, int, int, int]

EMPTY_STATE: State = (0, -1, -1, 0)


def capped_scan(
    tu: np.ndarray,
    gap_us: int,
    cap_us: int,
    state: State = EMPTY_STATE,
) -> tuple[list[tuple[int, int, int, int]], State]:
    """Run the gap+cap scan over a SORTED int64 epoch-µs array.

    Returns ``(closed, open_state)``: ``closed`` is a list of
    ``(sess_idx, start_us, end_us, n_events)`` for every session the
    scan CLOSES (a later event broke it), and ``open_state`` is the
    still-open session after the last event — the streaming caller
    stores it across batches; the batch caller flushes it as the final
    session. Sessions are 1-indexed from ``state``'s last used index.
    """
    n = int(tu.shape[0])
    idx, start, prev, cnt = state
    closed: list[tuple[int, int, int, int]] = []
    if n == 0:
        return closed, state
    # indices whose gap from their predecessor exceeds gap_us — these
    # events start a new session no matter what the cap says
    gb = np.flatnonzero(np.diff(tu) > gap_us) + 1
    ngb = int(gb.shape[0])
    gp = 0  # monotone pointer into gb (sessions advance left to right)
    i = 0
    if cnt > 0:
        # a carried open session: does tu[0] continue it?
        t0 = int(tu[0])
        if t0 - prev <= gap_us and t0 - start <= cap_us:
            next_gap = int(gb[gp]) if gp < ngb else n
            cap_end = int(np.searchsorted(tu, start + cap_us, side="right"))
            end = min(next_gap, cap_end)
            cnt += end
            prev = int(tu[end - 1])
            if end == n:
                return closed, (idx, start, prev, cnt)
            closed.append((idx, start, prev, cnt))
            i = end
        else:
            closed.append((idx, start, prev, cnt))
    while i < n:
        while gp < ngb and gb[gp] <= i:
            gp += 1
        next_gap = int(gb[gp]) if gp < ngb else n
        si = int(tu[i])
        cap_end = int(np.searchsorted(tu, si + cap_us, side="right"))
        end = min(next_gap, cap_end)  # > i always: tu[i] <= si + cap_us
        idx += 1
        if end == n:
            return closed, (idx, si, int(tu[n - 1]), n - i)
        closed.append((idx, si, int(tu[end - 1]), end - i))
        i = end
    # unreachable: the loop always returns via end == n
    return closed, (idx, -1, -1, 0)


def _sess_schema(key_col: str) -> str:
    """Output schema keyed by the CALLER's key column name — hardcoding
    `user_id` silently mislabeled any other key (r10 advice)."""
    return (
        f"{key_col} bigint, sess_idx bigint, start_us bigint, "
        "end_us bigint, n_events bigint"
    )


def capped_sessions(
    events: DataFrame,
    gap_us: int,
    cap_us: int,
    key_col: str = "user_id",
    ts_col: str = "tu",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Batch gap+cap sessionization as a `mapInPandas` scan over
    key-repartitioned, within-partition-sorted events.

    Why not `groupBy(key).applyInPandas`: grouped-map pays one pandas
    DataFrame construction + sort PER KEY — at 1 500 fixture users that
    overhead (~3 ms/group) was the entire 5 s bench cost of the r9 key,
    and at 10^9 users it is 10^9 tiny allocations. Here the per-task
    unit is one ARROW BATCH spanning many users (rows arrive
    key-contiguous because the partition is sorted by (key, ts, id)),
    the kernel runs per user-SLICE as numpy views, and a user whose
    rows straddle consecutive batches of the same task is stitched via
    the same carried open-session state the streaming twin stores —
    mapInPandas batches within one task arrive in partition order, so
    the stitch is exact (pinned by the sf0.1 recursive-CTE oracle and
    tests/test_capped_sessionize.py's split fuzz).

    The repartition is PINNED (CLAUDE.md: AQE would coalesce this
    fixture-small exchange into one task and serialize the scan —
    measured exactly that on the r9 key)."""
    n_parts = num_partitions or events.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    # filter-first null policy, enforced here (not just documented):
    # a null key has no session identity and would crash the int64 cast
    part = (
        events.filter(F.col(key_col).isNotNull())
        .repartition(int(n_parts), key_col)
        .sortWithinPartitions(key_col, ts_col, id_col)
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_uid: int | None = None
        carry_st: State = EMPTY_STATE
        for pdf in batches:
            if pdf.empty:
                continue
            uids = pdf[key_col].to_numpy(dtype="int64")
            tu = pdf[ts_col].to_numpy(dtype="int64")
            # user-slice boundaries: rows are key-contiguous by the sort
            cuts = np.flatnonzero(np.diff(uids) != 0) + 1
            bounds = np.concatenate(([0], cuts, [uids.shape[0]]))
            out_uid: list[int] = []
            out_rows: list[tuple[int, int, int, int]] = []
            for k in range(bounds.shape[0] - 1):
                lo, hi = int(bounds[k]), int(bounds[k + 1])
                uid = int(uids[lo])
                st = carry_st if uid == carry_uid else EMPTY_STATE
                if carry_uid is not None and uid != carry_uid:
                    # previous user ended mid-stream: flush their open session
                    out_uid.append(carry_uid)
                    out_rows.append(
                        (carry_st[0], carry_st[1], carry_st[2], carry_st[3])
                    )
                closed, st = capped_scan(tu[lo:hi], gap_us, cap_us, st)
                out_uid.extend([uid] * len(closed))
                out_rows.extend(closed)
                carry_uid, carry_st = uid, st
            if out_rows:
                arr = np.asarray(out_rows, dtype="int64")
                yield pd.DataFrame(
                    {
                        key_col: np.asarray(out_uid, dtype="int64"),
                        "sess_idx": arr[:, 0],
                        "start_us": arr[:, 1],
                        "end_us": arr[:, 2],
                        "n_events": arr[:, 3],
                    }
                )
        if carry_uid is not None and carry_st[3] > 0:
            yield pd.DataFrame(
                {
                    key_col: [carry_uid],
                    "sess_idx": [carry_st[0]],
                    "start_us": [carry_st[1]],
                    "end_us": [carry_st[2]],
                    "n_events": [carry_st[3]],
                }
            )

    return part.mapInPandas(scan, schema=_sess_schema(key_col))
