"""Two-level assignment kernel microbench (r11 verdict #2's rehearsal
row): per-row scoring cost of the single-table kernel vs the two-level
coarse-sharded kernel as the centroid count k grows toward and past the
10⁶ switch point. Pure numpy on synthetic data — the kernels' inner
loops verbatim (GEMM blocks, stable merges), no Spark, so the numbers
isolate the compute shape the switch exists for: O(k·dim) vs
O(√k·(1+cp)·dim) per row.

Usage: python tools/two_level_bench.py [k ...]   (default 10k 100k 1M)
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kafka_streams_clojure_spark.operators.similarity import (  # noqa: E402
    _coarse_assign,
    _coarse_quantize,
)

DIM = 64
BATCH = 1024  # rows scored per measurement (one Arrow batch)
BLOCK = 1024


def single_level(x: np.ndarray, cmat: np.ndarray, c2: np.ndarray) -> np.ndarray:
    x2 = np.einsum("ij,ij->i", x, x)
    b, k = x.shape[0], cmat.shape[0]
    best_d = np.full(b, np.inf)
    best_c = np.zeros(b, dtype=np.int64)
    for s in range(0, k, BLOCK):
        cb = cmat[s : s + BLOCK]
        dblk = x2[:, None] + c2[s : s + BLOCK][None, :] - 2.0 * (x @ cb.T)
        j = np.argmin(dblk, axis=1)
        d = dblk[np.arange(b), j]
        upd = d < best_d
        best_d[upd] = d[upd]
        best_c[upd] = j[upd] + s
    return best_c


def two_level(
    x: np.ndarray,
    cmat: np.ndarray,
    c2: np.ndarray,
    cc: np.ndarray,
    cc2: np.ndarray,
    offsets: np.ndarray,
    cp: int,
) -> np.ndarray:
    x2 = np.einsum("ij,ij->i", x, x)
    b = x.shape[0]
    dc = x2[:, None] + cc2[None, :] - 2.0 * (x @ cc.T)
    cidx = np.argsort(dc, axis=1, kind="stable")[:, :cp]
    best_d = np.full(b, np.inf)
    best_c = np.zeros(b, dtype=np.int64)
    for g in np.unique(cidx):
        lo, hi = int(offsets[g]), int(offsets[g + 1])
        if hi <= lo:
            continue
        rows = np.nonzero((cidx == g).any(axis=1))[0]
        xs, xs2 = x[rows], x2[rows]
        for s in range(lo, hi, BLOCK):
            e = min(s + BLOCK, hi)
            dblk = xs2[:, None] + c2[s:e][None, :] - 2.0 * (xs @ cmat[s:e].T)
            j = np.argmin(dblk, axis=1)
            d = dblk[np.arange(rows.size), j]
            upd = d < best_d[rows]
            ridx = rows[upd]
            best_d[ridx] = d[upd]
            best_c[ridx] = j[upd] + s
    return best_c


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
    rng = np.random.default_rng(42)
    report = {}
    for k in ks:
        cmat = rng.standard_normal((k, DIM))
        c2 = np.einsum("ij,ij->i", cmat, cmat)
        x = rng.standard_normal((BATCH, DIM))
        t0 = time.perf_counter()
        a1 = single_level(x, cmat, c2)
        t_single = time.perf_counter() - t0

        t0 = time.perf_counter()
        cc = _coarse_quantize(cmat)
        ga = _coarse_assign(cmat, cc)
        order = np.argsort(ga, kind="stable")
        cmat_s, c2_s, ga = cmat[order], c2[order], ga[order]
        K1 = cc.shape[0]
        offsets = np.searchsorted(ga, np.arange(K1 + 1))
        cc2 = np.einsum("ij,ij->i", cc, cc)
        t_build = time.perf_counter() - t0

        cp = min(K1, max(8, (K1 + 7) // 8))  # the kernel's default formula
        t0 = time.perf_counter()
        a2 = two_level(x, cmat_s, c2_s, cc, cc2, offsets, cp)
        t_two = time.perf_counter() - t0
        # agreement: map two-level's shard-order index back to original
        agree = float(np.mean(order[a2] == a1))
        report[k] = {
            "K1": int(K1),
            "single_ms_per_1k_rows": round(t_single * 1000, 1),
            "two_level_ms_per_1k_rows": round(t_two * 1000, 1),
            "speedup": round(t_single / t_two, 1),
            "coarse_build_s_once": round(t_build, 2),
            "agreement_vs_exact": round(agree, 4),
        }
        print(k, json.dumps(report[k]), flush=True)
    print("TWO_LEVEL_BENCH", json.dumps(report))


if __name__ == "__main__":
    main()
