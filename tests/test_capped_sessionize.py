"""Kernel tests for operators/sessionize.capped_scan — the vectorized
per-session scan behind q_agg_session_capped and capped_sessionizer.

The oracle-level guarantee (recursive CTE at sf0.01/sf0.1) pins the
grouped-map end to end; these tests pin the KERNEL against a direct
per-row reference scan (the exact loop the r9 implementation ran) on
planted boundary cases and random fuzz, plus the streaming contract:
any time-ordered batch split yields the same sessions as one batch.
No SparkSession needed — pure numpy.
"""
from __future__ import annotations

import random

import numpy as np
import pytest

from kafka_streams_clojure_spark.operators.sessionize import (
    EMPTY_STATE,
    capped_scan,
)

GAP = 100
CAP = 350


def reference_scan(tu, gap_us, cap_us, state=EMPTY_STATE):
    """The r9 per-row loop, verbatim semantics (tests the kernel against
    the code the recursive-CTE oracle was originally validated on)."""
    idx, start, prev, n = state
    closed = []
    for t in tu:
        t = int(t)
        if n == 0:
            idx, start, prev, n = idx + 1, t, t, 1
            continue
        if t - prev > gap_us or t - start > cap_us:
            closed.append((idx, start, prev, n))
            idx += 1
            start, n = t, 1
        else:
            n += 1
        prev = t
    return closed, (idx, start, prev, n)


def run_both(tu, gap_us=GAP, cap_us=CAP, state=EMPTY_STATE):
    arr = np.asarray(tu, dtype="int64")
    got = capped_scan(arr, gap_us, cap_us, state)
    want = reference_scan(tu, gap_us, cap_us, state)
    assert got == want, f"tu={list(tu)} state={state}\n got={got}\nwant={want}"
    return got


def test_empty():
    closed, st = capped_scan(np.array([], dtype="int64"), GAP, CAP)
    assert closed == [] and st == EMPTY_STATE


def test_single_event():
    closed, st = run_both([5])
    assert closed == [] and st == (1, 5, 5, 1)


def test_gap_boundary_is_strict():
    # gap exactly == gap_us does NOT break; gap_us+1 does
    run_both([0, GAP])          # one session
    run_both([0, GAP + 1])      # two sessions
    closed, st = run_both([0, GAP, 2 * GAP + 1])
    assert len(closed) == 1 and st[3] == 1


def test_cap_boundary_is_strict():
    # steady activity: distance exactly == cap_us stays, cap_us+1 breaks
    run_both([0, CAP])
    closed, st = run_both([0, CAP + 1])
    assert len(closed) == 1  # even though the gap rule alone would break too
    # continuous sub-gap activity that outruns the cap: 0,90,...
    ts = list(range(0, 1000, 90))
    closed, st = run_both(ts)
    # cap restarts at the breaking event, so starts advance by >CAP each time
    starts = [s for (_, s, _, _) in closed] + [st[1]]
    assert all(b - a > CAP for a, b in zip(starts, starts[1:]))


def test_cap_break_resets_start_not_gap_reference():
    # the gap rule always compares CONSECUTIVE events even across a cap
    # break: 0,90,...,450 caps at 360; 450's next event 500 (gap 50) stays
    run_both([0, 90, 180, 270, 360, 450, 500])


def test_duplicate_timestamps():
    run_both([7, 7, 7, 7])
    run_both([0, 0, CAP, CAP, CAP + 1])


def test_carried_state_continue_and_break():
    # continue: batch starts within gap and cap of the carried session
    run_both([120, 130], state=(3, 50, 60, 4))
    # gap break on the very first event
    run_both([300, 310], state=(3, 50, 60, 4))
    # cap break on the very first event (gap fine)
    run_both([460, 470], state=(3, 100, 420, 4))
    # carried session continues then caps inside the batch
    run_both([140, 200, 460, 470], state=(2, 100, 90, 3))


def test_batch_split_invariance_fuzz():
    rng = random.Random(20260816)
    for trial in range(200):
        n = rng.randrange(0, 60)
        gaps = [rng.choice([1, 30, GAP, GAP + 1, 200, CAP, CAP + 1]) for _ in range(n)]
        tu = list(np.cumsum([rng.randrange(0, 50)] + gaps, dtype=np.int64))
        # whole-array kernel == per-row reference
        want_closed, want_open = run_both(tu)
        # any split into time-ordered batches gives identical sessions
        cuts = sorted(rng.sample(range(len(tu) + 1), k=min(3, len(tu) + 1)))
        st = EMPTY_STATE
        closed = []
        lo = 0
        for hi in cuts + [len(tu)]:
            c, st = capped_scan(
                np.asarray(tu[lo:hi], dtype="int64"), GAP, CAP, st
            )
            closed.extend(c)
            lo = hi
        assert closed == want_closed and st == want_open, f"trial={trial}"


def test_counts_partition_the_events_fuzz():
    rng = random.Random(42)
    for _ in range(50):
        n = rng.randrange(1, 200)
        tu = np.cumsum(
            [rng.randrange(0, 2 * CAP) for _ in range(n)], dtype=np.int64
        )
        closed, st = capped_scan(tu, GAP, CAP)
        total = sum(c for (_, _, _, c) in closed) + st[3]
        assert total == n
        idxs = [i for (i, _, _, _) in closed] + [st[0]]
        assert idxs == list(range(1, len(idxs) + 1))


def test_capped_sessions_arrow_batch_straddle(spark):
    """End-to-end pin of the mapInPandas CARRY-STITCH: with
    arrow.maxRecordsPerBatch forced tiny, a user's rows straddle
    consecutive Arrow batches inside one task, exercising the
    carried-open-session path the fixture's default batch size never
    splits. The output must equal the single-batch reference scan."""
    from kafka_streams_clojure_spark.operators.sessionize import (
        capped_sessions,
    )

    gap, cap = 100, 350
    rows = []
    eid = 0
    for uid in range(6):
        t = uid * 10
        for k in range(50):
            t += [1, 30, 101, 200][k % 4] + uid
            rows.append((uid, t, eid))
            eid += 1
    ev = spark.createDataFrame(rows, "user_id bigint, tu bigint, event_id bigint")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = {
            (r["user_id"], r["sess_idx"]): (r["start_us"], r["end_us"], r["n_events"])
            for r in capped_sessions(ev, gap, cap, num_partitions=2).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    want = {}
    for uid in range(6):
        tus = sorted(t for (u, t, _) in rows if u == uid)
        closed, final = reference_scan(tus, gap, cap)
        for (i, s, e, c) in closed + [final]:
            want[(uid, i)] = (s, e, c)
    assert got == want


def test_capped_sessions_custom_key_col_and_null_keys(spark):
    """r10 advice regression: (a) a caller passing key_col != 'user_id'
    gets the key back UNDER THAT NAME (the schema used to hardcode
    user_id); (b) null keys are filtered inside the operator (the
    documented filter-first policy, now self-enforcing — they used to
    crash the int64 numpy cast)."""
    from kafka_streams_clojure_spark.operators.sessionize import (
        capped_sessions,
    )

    rows = [(7, 10, 0), (7, 20, 1), (7, 500, 2), (None, 30, 3)]
    ev = spark.createDataFrame(
        rows, "device_id bigint, tu bigint, event_id bigint"
    )
    out = capped_sessions(
        ev, gap_us=100, cap_us=1000, key_col="device_id", num_partitions=2
    )
    assert out.columns[0] == "device_id"
    got = {
        (r["device_id"], r["sess_idx"]): (r["start_us"], r["end_us"], r["n_events"])
        for r in out.collect()
    }
    # null-key row dropped; device 7 sessions: [10,20] then [500]
    assert got == {(7, 1): (10, 20, 2), (7, 2): (500, 500, 1)}
