"""Similarity search over embedding columns (`[ext]`, north-star
mandate): brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketed variant as the scale path.

Scale design: the brute-force path is a broadcast of the (small) probe
set against a full scan — linear, no shuffle, exact; right for one-off
probes. The LSH path buckets both sides by sign-pattern so the join
touches only colliding buckets — the 100 TB shape where the corpus is
huge and probes are many.

Execution split: ORACLE-gated paths keep embedding math in Catalyst
higher-order functions (zip_with/aggregate — deterministic
left-to-right fold, bit-identical to the DuckDB oracle), while
ROWS-ONLY hot loops (candidate scoring in the ANN families, sign-LSH
bucket computation) use Arrow-batched pandas UDFs (`cosine_arrow`,
`_lsh_buckets_arrow`) — one vectorized matrix op per batch instead of
per-row interpreted folds. Never row-at-a-time Python.
"""

from __future__ import annotations

import math
import random
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

#: declared Spark integral type → the numpy dtype Arrow would hand back
#: for a null-free column (pq_encode passthrough normalization)
_NP_INT_DTYPES = {
    ByteType: np.int8,
    ShortType: np.int16,
    IntegerType: np.int32,
    LongType: np.int64,
}


_BLAS_LIMITED = False


def _limit_blas_threads() -> None:
    """Pin OpenBLAS to ONE thread in this process — called at GEMM-
    kernel entry, so it runs once per Python WORKER. numpy's bundled
    OpenBLAS spawns its compile-cap threads per GEMM; 32 concurrent
    workers × extra BLAS threads oversubscribes the box (measured r12,
    q_llm_ann_probe_curve: 9.9-10.8 s multi-threaded vs 7.3-7.7 s
    pinned — the entire GEMM-rewrite regression). Spark owns the
    parallelism; per-worker BLAS must not. ctypes against the already-
    loaded library: env vars are too late once the worker has imported
    numpy, and threadpoolctl is not in the container. Best-effort — an
    exotic BLAS build just keeps its own threading."""
    global _BLAS_LIMITED
    if _BLAS_LIMITED:
        return
    _BLAS_LIMITED = True
    try:
        import ctypes
        import glob
        import os

        libs = glob.glob(
            os.path.join(os.path.dirname(np.__file__) + ".libs", "libopenblas*")
        )
        for so in libs:
            lib = ctypes.CDLL(so)
            for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
                if hasattr(lib, sym):
                    getattr(lib, sym)(1)
                    return
    except Exception:
        pass


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, accumulated in doubles, left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


# returnType as a DataType INSTANCE, not a DDL string: string parsing
# happens at decoration time and needs an active SparkContext, which
# would make this module un-importable before a session exists
@pandas_udf(DoubleType())
def cosine_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) cosine — the HOT-LOOP twin of
    :func:`cosine` for per-candidate scoring at scale.

    BENCH_NOTES.md "Cosine hot loop" (sf0.1, 200k candidate pairs):
    interpreted HOF 2.62s · unrolled element_at "codegen" sum 3.96s
    (LOSES — 192 repeated array gets beat one traversal) · prenorm+HOF
    dot 1.16s · this pandas_udf 0.84s (3.1× vs HOF, adopted). Whole
    Arrow batches hit one einsum, so the per-row Python cost is gone.

    NOT bit-identical to :func:`cosine` (einsum uses pairwise/SIMD
    accumulation, the fold is strictly left-to-right) — use ONLY on
    rows-only paths (LSH verify, IVF scoring); oracle-gated keys keep
    the fold, whose accumulation order DuckDB's list_sum reproduces.
    Inputs must be non-null, equal-length vectors (the candidate
    generators guarantee both)."""
    if not len(a):
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(np.einsum("ij,ij->i", B, B))
    return pd.Series(num / den, index=a.index)


def cosine_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one probe vector: full scan +
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Ties broken by id for determinism."""
    sim = cosine(F.col(vec_col), _vec_lit(probe))
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_probe(
    df: DataFrame,
    probe_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k against a 1-row probe DataFrame, fully in-plan (no
    driver-side .head(): the probe is broadcast as a tiny side of a
    cross join — at 100 TB the corpus never moves, and the probe fetch
    is part of the same lazy plan)."""
    p = F.broadcast(probe_df.select(F.col(vec_col).alias("_probe_vec")).limit(1))
    sim = cosine(F.col(vec_col), F.col("_probe_vec"))
    return (
        df.crossJoin(p)
        .select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_multi(
    df: DataFrame,
    probes_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k per probe for a *set* of probes — the "many probes"
    batch-inference shape: broadcast the probe set (small) against the
    corpus scan (huge), rank within each probe. One corpus pass total
    regardless of probe count; shuffle carries only (probe, corpus-row)
    scored pairs, pruned to k per probe by the ranking window."""
    probes = F.broadcast(
        probes_df.select(
            F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("_probe_vec")
        )
    )
    scored = df.crossJoin(probes).select(
        F.col(probe_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("_probe_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane, packed into
    a long — the random-projection LSH bucket id (cosine-similar
    vectors collide with high probability)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(dot(vec_col, _vec_lit(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(F.shiftleft(bit.cast("long"), i))
    return bucket


def _lsh_buckets_arrow(dim: int, n_planes: int, n_tables: int, seed0: int = 42):
    """One Arrow-batched UDF computing ALL tables' sign-LSH buckets per
    row: a single (n, dim)×(dim, T·P) matrix multiply + bit packing,
    replacing T·P interpreted higher-order plane-folds per row (the
    CLAUDE.md interpreted-lambda tax — measured on q_llm_cosine_ann).
    Same planes (seed-deterministic), same ``>= 0`` sign rule; einsum
    vs fold accumulation can only differ on exact-zero dots
    (measure-zero for Gaussian planes), and both join sides of the
    pair join read the SAME bucketed projection, so bucketing stays
    internally consistent. Rows-only path (recall-gated), mirroring
    the :func:`cosine_arrow` verify-stage precedent."""
    from pyspark.sql.types import ArrayType, LongType

    M = np.array(
        [
            p
            for t in range(n_tables)
            for p in random_hyperplanes(dim, n_planes, seed=seed0 + t)
        ],
        dtype=np.float64,
    )
    W = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        A = np.stack(v.to_numpy()).astype(np.float64)
        bits = (A @ M.T) >= 0.0
        vals = (bits.reshape(len(A), n_tables, n_planes) * W).sum(axis=2)
        return pd.Series(list(vals))

    return buckets


def lsh_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    threshold: float = 0.8,
    dim: int = 64,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate near-neighbor pairs: `n_tables` independent sign-LSH
    bucketings; docs colliding in any table become candidates; exact
    cosine verifies. Join cost ∝ colliding buckets, not n².

    ``multiprobe=1`` additionally probes every bucket at Hamming
    distance 1 (each single plane-bit flipped) — the standard
    multi-probe LSH recall lever (Lv et al., VLDB'07): a near pair that
    straddles ONE hyperplane still collides, lifting per-table
    collision from p^m to p^m + m·p^(m-1)(1-p) at the cost of a
    (m+1)× wider probe side. Only ONE side of the pair join explodes
    (XOR distance is symmetric, so probing A's neighborhood against
    B's home bucket covers both orderings); the bucketed base table is
    built once. The join stays a bucket equi-join — never all-pairs.

    Geometry must GROW with the corpus (measured, r9 rehearsal,
    SCALE.md "r8-family rehearsal"): at fixed ``n_planes`` the random-
    collision candidate floor is N²·T·2^-m, so bucket width has to
    scale ∝ log2(N) at web scale (≈30 planes at 10^9 vectors), with
    tables/probes re-tuned to hold recall — the SemDeDup cells-∝-√N
    rule's LSH analog. The registered key pins the 6×8 geometry the
    sf-scaled recall gates were measured against; note the rehearsal's
    super-linear shuffle at a LOW (0.4) threshold is output-dominated —
    the above-threshold pair population of the gaussian fixture itself
    grows ∝ N² (measured: output 8.1× at 3× data vs shuffle 8.4×), not
    an operator defect."""
    if multiprobe not in (0, 1):
        raise ValueError(f"multiprobe must be 0 or 1, got {multiprobe!r}")
    bks = _lsh_buckets_arrow(dim, n_planes, n_tables)(F.col(vec_col))
    bucketed = persist_if_uncached(
        df.select(F.col(id_col), F.col(vec_col), bks.alias("__bks")).select(
            F.col(id_col),
            F.col(vec_col),
            *[F.col("__bks")[t].alias(f"b_{t}") for t in range(n_tables)],
        )
    )
    # Candidate generation carries ONLY (id_a, id_b): the dedup across
    # tables is an id-width exchange (2 longs/row), not a vector-width
    # one (2×64 doubles/row, ~100× wider — at 100 TB the distinct()
    # shuffle would dominate). Vectors re-join AFTER dedup, keyed by id,
    # against the already-persisted bucketed projection.
    # r12 (guide §2.4: share one exchange): the former per-table loop
    # union'd n_tables separate bucket joins — 2 exchanges of the
    # bucketed projection EACH. Fused, both sides explode to (table,
    # bucket) rows once and ONE equi-join on ["t", "bkt"] carries every
    # table (same total row mass, the table id rides as a join key), so
    # the candidate set is unchanged while the exchange count drops
    # n_tables-fold (q_llm_cosine_ann plan: 16 Exchange → 2 below the
    # distinct).
    home = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"), F.col(f"b_{t}").alias("bkt")
                )
                for t in range(n_tables)
            ]
        )
    )
    if multiprobe:
        probe_structs = []
        for t in range(n_tables):
            probe_structs.append(
                F.struct(F.lit(t).alias("t"), F.col(f"b_{t}").alias("bkt"))
            )
            probe_structs += [
                F.struct(
                    F.lit(t).alias("t"),
                    F.col(f"b_{t}")
                    .bitwiseXOR(F.lit(1 << i).cast("long"))
                    .alias("bkt"),
                )
                for i in range(n_planes)
            ]
        probes = F.explode(F.array(*probe_structs))
    else:
        probes = home
    a = bucketed.select(F.col(id_col).alias("id_a"), probes.alias("tb")).select(
        "id_a", "tb.t", "tb.bkt"
    )
    b = bucketed.select(F.col(id_col).alias("id_b"), home.alias("tb")).select(
        "id_b", "tb.t", "tb.bkt"
    )
    pairs = (
        a.join(b, ["t", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    vecs = bucketed.select(F.col(id_col), F.col(vec_col))
    # verify stage is the per-candidate hot loop → Arrow-batched cosine
    # (3.1× vs the interpreted HOF, BENCH_NOTES.md "Cosine hot loop")
    verified = (
        pairs.distinct()
        .join(vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")), "id_a")
        .join(vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")), "id_b")
        .select("id_a", "id_b", cosine_arrow(F.col("v_a"), F.col("v_b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    return verified


def sq_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² — squared L2 distance, doubles, left-to-right.
    Squares written as x*x (pow() is libm-divergent across engines)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


#: quantizer-training sample geometry (FAISS practice: train the coarse
#: quantizer on a small deterministic sample, then assign the full
#: corpus) — expected training points per centroid, and the floor under
#: which sampling never engages (small corpora train on everything,
#: keeping every small-fixture result bit-identical).
TRAIN_PER_CELL = 32
MIN_TRAIN = 4096


def _train_sample(
    df: DataFrame, id_col: str, k: int | None, salt: int = 0x5EED
) -> DataFrame:
    """Deterministic hash-fraction TRAINING sample for Lloyd's
    iterations (r10 verdict #2 — the FAISS train-on-a-sample practice):
    keep rows whose ``xxhash64(id, salt) % 1e6`` falls under the keep
    fraction for an expected ``max(MIN_TRAIN, TRAIN_PER_CELL·k_cells)``
    rows, ALL derived in-plan from a broadcast 1-row count (no driver
    round-trip, no baked literal — the kmeans seed-stride recipe).

    Why this kills the measured N^1.5 training wall: with the adaptive
    ``k = √N`` cell count, per-iteration assignment over the FULL corpus
    is N·√N (SCALE.md r10: wall 13 s → 99.6 s at 10×); over the sample
    it is (TRAIN_PER_CELL·√N)·√N = TRAIN_PER_CELL·N — linear. The one
    remaining N·√N pass is the consumer's single full-corpus assignment,
    paid once, not per iteration. When the corpus is smaller than the
    target sample the keep fraction saturates at 100% and the filter is
    the identity — small fixtures (and every oracle-adjacent invariant
    test) train on the full corpus, bit-identical to the pre-sampling
    build. Deterministic for a fixed corpus, so the serve≡retrain
    bit-equality contract is unaffected.
    """
    k_cells = (
        F.ceil(F.sqrt(F.col("__tn"))) if k is None else F.lit(k)
    ).cast("double")
    stats = F.broadcast(
        df.agg(F.count(F.lit(1)).alias("__tn")).select(
            F.least(
                F.lit(1_000_000),
                F.ceil(
                    F.lit(1_000_000.0)
                    * F.greatest(
                        F.lit(MIN_TRAIN).cast("double"),
                        F.lit(TRAIN_PER_CELL) * k_cells,
                    )
                    / F.col("__tn")
                ).cast("bigint"),
            ).alias("__keep_ppm")
        )
    )
    return (
        df.crossJoin(stats)
        .filter(F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), 1_000_000) < F.col("__keep_ppm"))
        .drop("__keep_ppm")
    )


def kmeans_centroids(
    df: DataFrame,
    k: int | None = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column, pure
    DataFrame ops — the IVF coarse quantizer build.

    Init: with an explicit ``k``, the k smallest ``id_col`` vectors
    (deterministic, no RNG). With ``k=None`` the cell count is derived
    IN-PLAN ∝ √corpus (r7 verdict #1 / the ``q_llm_triplets_scaled``
    B∝N precedent): seeds are the rows whose ``xxhash64(id) % stride
    == 0`` for ``stride = ceil(√N)`` computed as a broadcast 1-row
    aggregate — expected seed count √N, no driver round-trip, no baked
    literal, no global sort/limit. √N is the cost-balancing choice for
    the SemDeDup consumer: assignment work is N·k and within-cell pair
    work is Σ|cell|² ≈ N²/k, so k = √N puts both at N^1.5 — the
    standard IVF ``nlist ≈ √N`` rule. The min-id row is always a seed
    (guards the tiny-N case where the hash filter could select zero
    rows).

    Each iteration: broadcast the k centroids, assign every TRAINING
    vector to its nearest (min_by over the broadcast cross join — one
    shuffle on the row id), then groupBy-average per cell. Training
    runs on the deterministic hash-fraction sample of
    :func:`_train_sample` (FAISS practice — expected ``max(MIN_TRAIN,
    TRAIN_PER_CELL·k)`` rows, saturating to the full corpus on small
    inputs), which makes the per-iteration cost linear in N under the
    adaptive ``k=√N`` instead of N^1.5. r12: when that bounded sample
    fits ``DRIVER_TRAIN_BOUND`` the whole loop runs driver-locally in
    numpy (:func:`_lloyd_driver` — assignment through the shared
    :func:`_score_assign_block` kernel, means as fixed-order float64
    sums, zero per-iteration Spark jobs); past the bound the
    distributed loop below runs, with per-element sums through
    DECIMAL(38,18) so the centroid means are partial-agg-order
    independent. Both paths are RNG-free and deterministic for a fixed
    corpus — the contract every rows-only consumer (serve≡retrain,
    planted-copy, recall floors) pins. Distributed cost per iteration
    is one sample scan + two aggregates; the centroid table itself
    (k×dim doubles) always fits in a broadcast — at N=10⁹, √N ≈ 31.6k
    centroids ≈ 16 MB.

    Returns ``(cell, centroid array<double>)``. Iterative refinement is
    genuinely non-SQL-expressible → consumers are rows-only keys with
    invariant tests.
    """
    # deterministic seeds; the seed's own id is the cell label (labels
    # only need to be stable, not dense — and this avoids a global
    # row_number window entirely)
    vec_as_double = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if k is None:
        stats = F.broadcast(
            df.agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(F.col(id_col)).alias("__mid"),
            ).select(
                "__mid",
                F.greatest(
                    F.ceil(F.sqrt(F.col("__n"))).cast("bigint"), F.lit(1)
                ).alias("__stride"),
            )
        )
        cents = (
            df.select(id_col, vec_col)
            .crossJoin(stats)
            .filter(
                (F.pmod(F.xxhash64(F.col(id_col)), F.col("__stride")) == 0)
                | (F.col(id_col) == F.col("__mid"))
            )
            .select(
                F.col(id_col).cast("bigint").alias("cell"),
                vec_as_double.alias("centroid"),
            )
        )
    else:
        cents = (
            df.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(k)
            .select(
                F.col(id_col).cast("int").alias("cell"),
                vec_as_double.alias("centroid"),
            )
        )
    # Lloyd's iterations run on the deterministic TRAINING SAMPLE, not
    # the corpus (r10 verdict #2): per-iteration cost TRAIN_PER_CELL·N
    # instead of N·√N, identity below MIN_TRAIN-scale corpora. The
    # CONSUMER's full-corpus assignment against the returned centroids
    # is unchanged.
    # The sample is scanned once PER ITERATION by the assignment kernel
    # in the distributed loops — materialized once there (r12, guide §5
    # caching rule: reused AND recomputation = a full corpus scan +
    # hash filter each round; the checkpointed footprint is the bounded
    # TRAIN_PER_CELL·k sample, not the corpus). The driver-local path
    # below collects it instead (one scan, no checkpoint job).
    train_plan = _train_sample(df.select(id_col, vec_col), id_col, k)
    train: DataFrame | None = None

    def _iterate(cents: DataFrame) -> DataFrame:
        assigned = _assign_cells(train, cents, vec_col=vec_col)
        # NARROW mean aggregate: posexplode to (cell, d, x) rows and
        # sum one decimal column grouped by (cell, d), then rebuild the
        # centroid array ordered by dimension. Mathematically identical
        # to a dim-wide projection of per-element decimal sums (same
        # sums, same division), but the codegen is one 3-column agg
        # instead of a 64-wide one — the former dominated the build
        # (r8: measured on the semdedup/ivfpq coarse quantizers). The
        # exploded exchange carries k×dim mean rows — metadata-scale.
        ex = assigned.select("cell", F.posexplode(F.col(vec_col)).alias("d", "x"))
        cellmeans = ex.groupBy("cell", "d").agg(
            (
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
        return cellmeans.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "mu"))),
                lambda s: s["mu"],
            ).alias("centroid")
        )

    # r12 (§1.2 per-task work after shape is right — here the "shape"
    # waste was PER-ITERATION JOB BARRIERS): the loop state is a k-row
    # metadata-scale table that the next iteration's _assign_cells
    # COLLECTS anyway. Carrying it between iterations as a driver-local
    # relation (collect → createDataFrame) makes each iteration ONE
    # Spark job — the old per-iteration trio was the centroid collect,
    # the checkpoint materialization, and the agg chain (r11's
    # localCheckpoint-per-round, now subsumed: a LocalRelation has no
    # lineage to truncate, and _assign_cells' collect on it is
    # driver-local, no job). Arithmetic is untouched — same assignment
    # kernel, same decimal means, same d-ordered rebuild — so centroids
    # stay bit-identical (guard: test_kmeans_centroids_deterministic_
    # and_shaped + serve≡retrain). Rows collected per iteration = the
    # same (cell, centroid) table every consumer already collects,
    # under the same TWO_LEVEL_CELL_BOUND exposure; past the bound the
    # distributed loop below keeps the two-level routing.
    seed_schema = StructType(
        [
            StructField("cell", cents.schema["cell"].dataType),
            cents.schema["centroid"],
        ]
    )
    seed_rows = cents.select("cell", "centroid").collect()
    if len(seed_rows) > TWO_LEVEL_CELL_BOUND:
        del seed_rows
        train = train_plan.localCheckpoint(eager=True)
        for _ in range(iters):
            cents = _iterate(cents).localCheckpoint(eager=True)
        return cents
    spark = df.sparkSession
    # r12 driver-local fast path: the training SAMPLE itself is bounded
    # (≈ max(MIN_TRAIN, TRAIN_PER_CELL·k) rows by _train_sample's keep
    # fraction — the same metadata scale as the seed collect above), so
    # when that bound is small enough to collect, the whole Lloyd's
    # loop runs as pure numpy on the driver (`_lloyd_driver`, the
    # `_coarse_quantize` precedent): ZERO per-iteration Spark jobs
    # instead of one assign+aggregate+collect job each (measured at
    # sf0.1: ~1.3-2.0 s of pure job overhead per iteration on a
    # 2000-row sample). Assignment arithmetic is the shared
    # `_score_assign_block` kernel; means are fixed-order float64 sums
    # — deterministic for a fixed corpus, which is the contract every
    # rows-only consumer (serve≡retrain, planted-copy, recall floors)
    # actually pins, exactly as with the r11 GEMM kernel swap.
    target = max(MIN_TRAIN, TRAIN_PER_CELL * max(1, len(seed_rows)))
    if seed_rows and iters > 0 and target <= DRIVER_TRAIN_BOUND:
        samp = train_plan.select(vec_col).collect()
        if samp:
            cells_np = np.array([r["cell"] for r in seed_rows], dtype=np.int64)
            order = np.argsort(cells_np)
            cells_np = cells_np[order]
            cmat = np.array(
                [list(seed_rows[int(i)]["centroid"]) for i in order],
                dtype=np.float64,
            )
            x = np.stack(
                [np.asarray(r[0], dtype=np.float64) for r in samp]
            )
            cells_out, cmat_out = _lloyd_driver(x, cells_np, cmat, iters)
            out_rows = [
                (int(c), [float(v) for v in row])
                for c, row in zip(cells_out, cmat_out)
            ]
            return spark.createDataFrame(out_rows, seed_schema)
    cents = spark.createDataFrame(seed_rows, seed_schema)
    if iters > 0:
        train = train_plan.localCheckpoint(eager=True)
    for _ in range(iters):
        cents = spark.createDataFrame(_iterate(cents).collect(), seed_schema)
    return cents


# Above this many centroids the single-table assignment kernel switches
# to the two-level coarse-quantizer path (verdict r11 #2). √N cells only
# reach 10⁶ at N = 10¹² vectors; tests lower the bound to exercise the
# switch. HARD_CELL_BOUND keeps the loud-fail posture for tables too big
# to even collect/broadcast (~8 GB at 16M×64 doubles): shard the corpus.
TWO_LEVEL_CELL_BOUND = 1_000_000
HARD_CELL_BOUND = 16_000_000
_COARSE_TRAIN_SAMPLE = 65_536
_COARSE_ITERS = 3

#: Largest TRAINING SAMPLE (rows) the quantizer trainers run
#: driver-locally (r12, guide §1.2): the Lloyd's loop state AND input
#: are both bounded metadata-scale tables (sample ≈ max(MIN_TRAIN,
#: TRAIN_PER_CELL·k) ≤ this bound ⇒ ≤ ~34 MB at dim 64), and a
#: driver-side numpy loop replaces `iters` distributed
#: assign+aggregate jobs with zero Spark jobs — the `_coarse_quantize`
#: precedent one level down. Past the bound the distributed loop is
#: unchanged.
DRIVER_TRAIN_BOUND = 65_536


def _score_assign_block(
    x: np.ndarray,
    cells_np: np.ndarray,
    cmat: np.ndarray,
    c2: np.ndarray,
    p: int,
    block: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-``p``-cells scoring for a row block — the EXACT
    arithmetic of the `_assign_cells` mapInPandas kernel (blocked
    ‖x‖²+‖c‖²−2xCᵀ GEMM; stable-argsort merge so exact distance ties
    resolve to the smaller cell id; NaN rows degrade to the smallest
    real cell via the padding init). ``cells_np`` must be ascending.
    Shared by the distributed kernel and the driver-local trainer so
    the two paths cannot drift."""
    b = x.shape[0]
    x2 = np.einsum("ij,ij->i", x, x)
    best_d = np.full((b, p), np.inf)
    best_c = np.full((b, p), cells_np[0], dtype=np.int64)
    k = int(cells_np.shape[0])
    for s in range(0, k, block):
        cb = cmat[s : s + block]
        dblk = x2[:, None] + c2[s : s + block][None, :] - 2.0 * (x @ cb.T)
        cat_d = np.concatenate([best_d, dblk], axis=1)
        cat_c = np.concatenate(
            [best_c, np.broadcast_to(cells_np[s : s + block], (b, cb.shape[0]))],
            axis=1,
        )
        # stable sort on distance = lexicographic (d2, cell): carried
        # best is already (d2, cell)-ordered and all its cells precede
        # this block's (ascending cell blocks)
        idx = np.argsort(cat_d, axis=1, kind="stable")[:, :p]
        best_d = np.take_along_axis(cat_d, idx, axis=1)
        best_c = np.take_along_axis(cat_c, idx, axis=1)
    return best_d, best_c


def _lloyd_driver(
    x: np.ndarray, cells_np: np.ndarray, cmat: np.ndarray, iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-local Lloyd's over an already-collected bounded sample:
    assignment through `_score_assign_block` (the distributed kernel's
    own arithmetic), means as float64 sums in FIXED row order (the
    driver loop has one deterministic accumulation order, which is the
    whole property the distributed path needed DECIMAL casts to get),
    empty cells dropped exactly like the distributed groupBy. No RNG —
    bit-reproducible for a fixed sample; the same run-to-run
    determinism contract as the r11 GEMM kernel swap (consumers are
    rows-only ANN/semdedup keys gated by recall/planted invariants,
    not value oracles). ``cells_np`` must be ascending (preserved
    across iterations: dropping rows keeps order)."""
    _limit_blas_threads()  # single-threaded GEMM = reproducible sums
    for _ in range(iters):
        c2 = np.einsum("ij,ij->i", cmat, cmat)
        _, best = _score_assign_block(x, cells_np, cmat, c2, 1)
        idx = np.searchsorted(cells_np, best[:, 0])
        sums = np.zeros_like(cmat)
        counts = np.zeros(cells_np.shape[0], dtype=np.int64)
        np.add.at(sums, idx, x)
        np.add.at(counts, idx, 1)
        present = counts > 0
        cells_np = cells_np[present]
        cmat = sums[present] / counts[present][:, None]
    return cells_np, cmat


def _coarse_quantize(cmat: np.ndarray) -> np.ndarray:
    """Deterministic driver-side Lloyd's over the (already-collected)
    centroid matrix: K1 = ⌈√k⌉ coarse centroids, seeded by evenly-spaced
    centroid rows, trained on an evenly-spaced ≤65536-row sample (the
    sampled-training rule from the level-2 quantizer applies one level
    up too). Pure numpy, no RNG — bit-reproducible for a fixed table."""
    k = cmat.shape[0]
    K1 = max(1, int(math.ceil(math.sqrt(k))))
    cc = cmat[np.linspace(0, k - 1, K1).astype(np.int64)].copy()
    samp = cmat[
        np.linspace(0, k - 1, min(k, _COARSE_TRAIN_SAMPLE)).astype(np.int64)
    ]
    s2 = np.einsum("ij,ij->i", samp, samp)
    for _ in range(_COARSE_ITERS):
        d = (
            s2[:, None]
            + np.einsum("ij,ij->i", cc, cc)[None, :]
            - 2.0 * (samp @ cc.T)
        )
        a = np.argmin(d, axis=1)
        for g in range(K1):
            members = samp[a == g]
            if members.shape[0]:
                cc[g] = members.mean(axis=0)
    return cc


def _coarse_assign(cmat: np.ndarray, cc: np.ndarray) -> np.ndarray:
    """Nearest coarse cell for every level-2 centroid (blocked GEMM;
    argmin first-minimum = smallest coarse id on exact ties)."""
    cc2 = np.einsum("ij,ij->i", cc, cc)
    out = np.empty(cmat.shape[0], dtype=np.int64)
    for s in range(0, cmat.shape[0], 65536):
        xb = cmat[s : s + 65536]
        d = (
            np.einsum("ij,ij->i", xb, xb)[:, None]
            + cc2[None, :]
            - 2.0 * (xb @ cc.T)
        )
        out[s : s + 65536] = np.argmin(d, axis=1)
    return out


def _assign_cells_two_level(
    df: DataFrame,
    cent_rows: list,
    centroids: DataFrame,
    vec_col: str,
    n_probe: int,
    keys: Sequence[str],
    coarse_probe: int | None = None,
    residual_col: str | None = None,
) -> DataFrame:
    """Two-level cell assignment for centroid tables past the
    single-table design point (k > TWO_LEVEL_CELL_BOUND): a driver-side
    coarse quantizer (⌈√k⌉ cells) shards the level-2 centroid table;
    each row scores the ⌈√k⌉ coarse centroids plus only the level-2
    centroids in its ``coarse_probe`` nearest shards — O(√k·(1+cp)·dim)
    per row instead of O(k·dim). APPROXIMATE like the IVF probe itself
    (a row's true nearest level-2 centroid can sit in an unprobed
    shard); deterministic for a fixed table (pure numpy, sorted shard
    traversal, carried-first stable merge), so identical duplicate
    vectors land in identical cells and serve≡retrain bit-equality
    holds. Tie-break is carried-first over (ascending coarse shard,
    ascending cell within shard) — deterministic, though not globally
    (distance, cell)-lexicographic like the single-level kernel.
    Rows whose probed shards are all empty keep the padding cell
    (smallest real cell id), never a fabricated one."""
    if len(cent_rows) > HARD_CELL_BOUND:
        raise RuntimeError(
            f"_assign_cells: {len(cent_rows)} centroids exceed the "
            f"{HARD_CELL_BOUND} two-level broadcast bound; shard the corpus"
        )
    cells_np = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([list(r["centroid"]) for r in cent_rows], dtype=np.float64)
    order = np.argsort(cells_np)
    cells_np, cmat = cells_np[order], cmat[order]
    cc = _coarse_quantize(cmat)
    ga = _coarse_assign(cmat, cc)
    # stable sort by coarse id keeps cells ascending WITHIN each shard
    shard_order = np.argsort(ga, kind="stable")
    cells_np, cmat, ga = cells_np[shard_order], cmat[shard_order], ga[shard_order]
    K1 = cc.shape[0]
    offsets = np.searchsorted(ga, np.arange(K1 + 1))
    c2 = np.einsum("ij,ij->i", cmat, cmat)
    cc2 = np.einsum("ij,ij->i", cc, cc)
    k = int(cells_np.shape[0])
    p = min(int(n_probe), k)
    # default coarse probe SCALES with the shard count (K1/8, floor 8,
    # at least 4·n_probe): a fixed small cp over ~√k shards probes a
    # vanishing fraction of centroids as k grows — on structure-free
    # Gaussian data (the worst case) cp=8 of 1000 shards agreed with
    # exact assignment on only 19% of rows (tools/two_level_bench.py),
    # while cp=K1/8 bounds the cut at 8× compute for a fixed ~87% of
    # shards skipped. Callers tune per corpus; the recall floors of the
    # consuming families are the gate.
    if coarse_probe is None:
        cp = min(K1, max(8, 4 * p, (K1 + 7) // 8))
    else:
        cp = min(K1, max(1, int(coarse_probe)))
    if residual_col is not None and p != 1:
        raise ValueError("residual_col requires n_probe=1 (one winning cell)")
    in_fields = {f.name: f for f in df.schema.fields}
    cell_type = centroids.schema["cell"].dataType
    tail_field = (
        StructField(residual_col, ArrayType(DoubleType()))
        if residual_col is not None
        else in_fields[vec_col]
    )
    out_schema = StructType(
        [in_fields[c] for c in keys] + [StructField("cell", cell_type), tail_field]
    )
    cell_np_type = np.int32 if isinstance(cell_type, IntegerType) else np.int64
    block = 1024
    # shard ordering leaves cells_np unsorted globally — precompute the
    # cell-id → matrix-row lookup for the residual path
    cell_order = np.argsort(cells_np, kind="stable")
    bc = df.sparkSession.sparkContext.broadcast(
        (cells_np, cmat, c2, cc, cc2, offsets, cell_order)
    )
    emit_resid = residual_col is not None

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        _limit_blas_threads()  # Spark owns the parallelism (see helper)
        cells_np, cmat, c2, cc, cc2, offsets, cell_order = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            b = x.shape[0]
            x2 = np.einsum("ij,ij->i", x, x)
            dc = x2[:, None] + cc2[None, :] - 2.0 * (x @ cc.T)
            cidx = np.argsort(dc, axis=1, kind="stable")[:, :cp]
            best_d = np.full((b, p), np.inf)
            best_c = np.full((b, p), cells_np[0], dtype=np.int64)
            for g in np.unique(cidx):
                lo, hi = int(offsets[g]), int(offsets[g + 1])
                if hi <= lo:
                    continue
                rows = np.nonzero((cidx == g).any(axis=1))[0]
                if rows.size == 0:
                    continue
                xs, xs2 = x[rows], x2[rows]
                for s in range(lo, hi, block):
                    e = min(s + block, hi)
                    cb = cmat[s:e]
                    dblk = xs2[:, None] + c2[s:e][None, :] - 2.0 * (xs @ cb.T)
                    cat_d = np.concatenate([best_d[rows], dblk], axis=1)
                    cat_c = np.concatenate(
                        [
                            best_c[rows],
                            np.broadcast_to(cells_np[s:e], (rows.size, e - s)),
                        ],
                        axis=1,
                    )
                    idx = np.argsort(cat_d, axis=1, kind="stable")[:, :p]
                    best_d[rows] = np.take_along_axis(cat_d, idx, axis=1)
                    best_c[rows] = np.take_along_axis(cat_c, idx, axis=1)
            out = {c: np.repeat(pdf[c].to_numpy(), p) for c in keys}
            out["cell"] = best_c.reshape(-1).astype(cell_np_type)
            if emit_resid:
                srt = cells_np[cell_order]
                rv = x - cmat[cell_order[np.searchsorted(srt, best_c[:, 0])]]
                out[residual_col] = list(rv)
            else:
                out[vec_col] = np.repeat(pdf[vec_col].to_numpy(), p)
            yield pd.DataFrame(out)

    return df.select(*keys, vec_col).mapInPandas(assign, schema=out_schema)


def _assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    n_probe: int = 1,
    id_cols: Sequence[str] | None = None,
    residual_col: str | None = None,
) -> DataFrame:
    """Attach the ``n_probe`` nearest cell ids to every row.

    r11 shape: the centroid table — k ≈ √N rows, the same metadata
    scale every loud-fail guard already collects — is COLLECTED once
    and shipped to executors as a Spark BROADCAST variable (r12,
    verdict #1: a task closure re-pickles the up-to-0.5 GB matrix per
    task batch; the broadcast transfers once per executor) consumed by
    an Arrow-batched numpy kernel that scores all cells per row: ONE
    corpus pass, zero shuffle, zero row blowup. Distances are ONE GEMM
    per block (‖x‖² + ‖c‖² − 2·x@Cᵀ) instead of the r11 per-centroid
    einsum loop — same O(b·k·dim) flops but BLAS-tiled (r12 A/B rows
    in SCALE.md). Ties break (distance, cell id) exactly as the old
    min_by struct: cells are processed in ascending-cell blocks and
    merged with a STABLE argsort on distance, so equal distances
    resolve to the earlier = smaller cell (identical duplicate vectors
    still land in identical cells — the planted-copy contract). numpy's
    GEMM replaces the left-to-right JVM fold — consumers (ivf / ivfpq /
    semdedup families) are all rows-only by design; deterministic for
    a fixed corpus, so serve≡retrain bit-equality holds. NaN guard
    (r12 ADVICE): best_c pads with the smallest REAL cell id, so a
    NaN-bearing vector (all-NaN distances sort after the inf padding)
    degrades to a real cell instead of a fabricated id 0."""
    keys = list(id_cols) if id_cols else [c for c in df.columns if c != vec_col]
    if residual_col is not None and int(n_probe) != 1:
        raise ValueError("residual_col requires n_probe=1 (one winning cell)")
    cent_rows = centroids.select("cell", "centroid").collect()
    if not cent_rows:
        raise ValueError("_assign_cells: empty centroid table")
    if len(cent_rows) > TWO_LEVEL_CELL_BOUND:
        # past the single-table design point (√N cells reach 10⁶ at
        # N = 10¹² vectors) the kernel routes through the two-level
        # coarse quantizer: level-1 coarse cells restrict which level-2
        # centroids a row scores — ~√k coarse scores + probed shards
        # instead of all k (r12, verdict #2; formerly a loud RuntimeError
        # naming this cure)
        return _assign_cells_two_level(
            df, cent_rows, centroids, vec_col, n_probe, keys,
            residual_col=residual_col,
        )
    cells_np = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([list(r["centroid"]) for r in cent_rows], dtype=np.float64)
    order = np.argsort(cells_np)
    cells_np, cmat = cells_np[order], cmat[order]
    c2 = np.einsum("ij,ij->i", cmat, cmat)
    k = int(cells_np.shape[0])
    p = min(int(n_probe), k)
    in_fields = {f.name: f for f in df.schema.fields}
    cell_type = centroids.schema["cell"].dataType
    # with residual_col the kernel emits the row's residual (vec − its
    # winning centroid, elementwise IEEE double subtraction — the exact
    # arithmetic of the former broadcast-join + zip_with consumer form,
    # r12) INSTEAD of the raw vector
    tail_field = (
        StructField(residual_col, ArrayType(DoubleType()))
        if residual_col is not None
        else in_fields[vec_col]
    )
    out_schema = StructType(
        [in_fields[c] for c in keys] + [StructField("cell", cell_type), tail_field]
    )
    cell_np_type = np.int32 if isinstance(cell_type, IntegerType) else np.int64
    block = 1024  # bounds the per-batch distance matrix at b×block doubles
    bc = df.sparkSession.sparkContext.broadcast((cells_np, cmat, c2))
    emit_resid = residual_col is not None

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        _limit_blas_threads()  # Spark owns the parallelism (see helper)
        cells_np, cmat, c2 = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            # scoring arithmetic shared with the driver-local trainer
            # (r12): blocked GEMM + stable (d2, cell) merge
            _, best_c = _score_assign_block(x, cells_np, cmat, c2, p, block)
            out = {
                c: np.repeat(pdf[c].to_numpy(), p) for c in keys
            }
            out["cell"] = best_c.reshape(-1).astype(cell_np_type)
            if emit_resid:
                # p == 1 (asserted above): one winning centroid per row
                rv = x - cmat[np.searchsorted(cells_np, best_c[:, 0])]
                out[residual_col] = list(rv)
            else:
                out[vec_col] = np.repeat(pdf[vec_col].to_numpy(), p)
            yield pd.DataFrame(out)

    return df.select(*keys, vec_col).mapInPandas(assign, schema=out_schema)


def ivf_topk(
    df: DataFrame,
    probes_df: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest
    centroid cell; each probe searches only its ``n_probe`` nearest
    cells — the inverted-file ANN shape (cf. FAISS IVF-Flat). Search
    cost ∝ n_probe/k_cells of the corpus instead of all of it; the
    cell equi-join replaces the brute-force cross join, and exact
    cosine ranks the candidates."""
    corpus = _assign_cells(df, centroids, vec_col=vec_col, id_cols=[id_col])
    probes = _assign_cells(
        probes_df.select(
            F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("_pv")
        ),
        centroids,
        vec_col="_pv",
        n_probe=n_probe,
        id_cols=[probe_id_col],
    )
    # no dedup needed: each corpus row sits in exactly one cell and a
    # probe's n_probe cells are distinct, so the cell equi-join emits
    # each (probe, vec) pair at most once — a dropDuplicates here would
    # be a pure extra shuffle of the whole candidate set
    # candidate scoring is the per-row hot loop → Arrow-batched cosine
    # (rows-only path; BENCH_NOTES.md "Cosine hot loop")
    cand = corpus.join(F.broadcast(probes), "cell").select(
        probe_id_col,
        id_col,
        cosine_arrow(F.col(vec_col), F.col("_pv")).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


#: Safety margin for the vectorized cosine PREFILTER below: the max
#: discrepancy between numpy's einsum accumulation and the strict
#: left-to-right fold is bounded by ~n·eps·Σ|aᵢbᵢ| ≈ 64·1.1e-16 ≈ 7e-15
#: for 64-dim unit-scale vectors (norms and the division add a few eps
#: more) — 1e-9 is ~10⁴× that bound, so no pair whose EXACT fold value
#: reaches the threshold can be dropped by the prefilter.
_COSINE_PREFILTER_MARGIN = 1e-9


def _cosine_prefilter(threshold: float):
    """Vectorized (Arrow-batched) cosine >= threshold−margin predicate —
    a Bloom-filter-style candidate cut (guide §3.2: false positives only
    cost the exact fold they would have paid anyway; the margin makes
    false negatives impossible) for the oracle-gated blocked all-pairs
    chain. Marked non-deterministic ON PURPOSE (guide §4.4): it keeps
    Catalyst from pushing the expensive interpreted-fold filter below
    this one, so the fold only ever runs on prefilter survivors. NaN /
    zero-norm rows read False here and their exact fold reads NaN —
    dropped by both, so the output set is unchanged."""
    cut = threshold - _COSINE_PREFILTER_MARGIN

    @pandas_udf(BooleanType())
    def pre(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype=bool)
        ok = (a.notna() & b.notna()).to_numpy()
        out = np.zeros(len(a), dtype=bool)
        if ok.any():
            A = np.stack(a[ok].to_numpy()).astype(np.float64)
            B = np.stack(b[ok].to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", A, B)
            with np.errstate(divide="ignore", invalid="ignore"):
                den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
                    np.einsum("ij,ij->i", B, B)
                )
                sim = num / den
            with np.errstate(invalid="ignore"):
                out[ok] = sim >= cut
        return pd.Series(out, index=a.index)

    return pre.asNondeterministic()


def _blocked_all_pairs_cosine(
    df: DataFrame, id_col: str, vec_col: str, blk: Column, threshold: float
) -> DataFrame:
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), blk.alias("blk"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), blk.alias("blk"))
    # r12: the interpreted left-to-right fold (`cosine`) is the emitted,
    # oracle-bit-matched value but also the chain's hot loop (BENCH_NOTES
    # "Cosine hot loop": HOF 2.62 s vs einsum pandas_udf 0.84 s per 200k
    # pairs) — so candidates first pass the margin prefilter above and
    # the fold only scores survivors. Output rows and cos_sim values are
    # IDENTICAL (tests/test_llm_ops.py::test_cosine_prefilter_equivalence).
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_cosine_prefilter(threshold)(F.col("v_a"), F.col("v_b")))
        .select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def _grouped_all_pairs_cosine(
    df: DataFrame, id_col: str, vec_col: str, blk: Column, threshold: float
) -> DataFrame:
    """Rows-only numpy twin of :func:`_blocked_all_pairs_cosine` (r11):
    per-block all-pairs cosine as ONE `applyInPandas` kernel — group
    count is the number of BLOCKS (√N cells for the semdedup caller,
    so the per-group pandas overhead trap does not apply), and the
    qualifying pairs are the only rows that ever leave Python. The join
    form materializes Σ|block|² candidate rows EACH CARRYING BOTH
    64-dim vectors (~1 KB/row) through a shuffle before scoring; here
    the block's vectors cross once and the N²/k work runs as chunked
    einsum (256-row strips, so memory is strip×|block| doubles, never
    |block|²). NOT bit-identical to the fold (einsum accumulation) —
    oracle-gated callers keep the join+fold form; rows-only callers
    (semdedup's cell blocking) take this one. Zero vectors produce NaN
    cosine and are dropped by the >= threshold mask, matching the
    fold's null-comparison behavior."""
    work = df.select(blk.alias("__blk"), F.col(id_col), F.col(vec_col))
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="object"),
             "id_b": pd.Series([], dtype="object"),
             "cos_sim": pd.Series([], dtype="float64")}
        )
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
        )[order]
        with np.errstate(divide="ignore", invalid="ignore"):
            xn = x / np.sqrt(np.einsum("ij,ij->i", x, x))[:, None]
        cols = np.arange(n)
        out_a, out_b, out_s = [], [], []
        for s in range(0, n, 256):
            e = min(s + 256, n)
            sim = np.einsum("ik,jk->ij", xn[s:e], xn)
            with np.errstate(invalid="ignore"):
                mask = sim >= threshold
            mask &= cols[None, :] > np.arange(s, e)[:, None]  # j > i only
            ii, jj = np.nonzero(mask)
            if ii.size:
                out_a.append(ids[ii + s])
                out_b.append(ids[jj])
                out_s.append(sim[ii, jj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_s),
            }
        )

    return work.groupBy("__blk").applyInPandas(pairs, schema=schema)


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Product-quantization codebooks (cf. FAISS PQ / Jégou et al.
    2011): split the ``dim`` dimensions into ``m`` subspaces of dim/m
    and run the deterministic Lloyd's quantizer (:func:`kmeans_centroids`)
    independently in each. Returns ``(sub, cell, centroid)`` — m·k rows
    total, always broadcastable (the codebook for a billion-vector
    corpus is still m·k·(dim/m) doubles).

    PQ is the MEMORY-side ANN scale path, complementing sign-LSH and
    IVF (the compute-side paths already in this module): each vector
    compresses to m small codes (m bytes at k<=256 vs dim·4 bytes raw,
    32× at the defaults), and query scoring never touches raw vectors.

    All m subspace quantizers train on the same bounded sample. r12:
    with the sample under ``DRIVER_TRAIN_BOUND`` (always true at the
    fixed default k) the m Lloyd's runs execute driver-locally in
    numpy (:func:`_lloyd_driver` per subspace — two bounded collects
    replace the per-iteration broadcast-join + min_by + decimal-agg
    chain). Past the bound, the distributed fallback trains all m
    subspaces in ONE vectorized chain over the exploded
    ``(id, sub, v)`` table — every step groups by ``(…, sub)``, so the
    math is identical to m independent runs (r8: the former
    per-subspace loop unioned m separate kmeans chains, whose m×
    distinct plans/codegen dominated the build — pq/ivfpq keys ~2×
    faster vectorized), with per-element means through DECIMAL so
    partial-agg order can't drift a centroid. Seeds are the k
    lowest-id vectors' slices (same ids for every sub, labels = seed
    id as before); both paths deterministic for a fixed corpus.
    """
    if dim % m != 0:
        raise ValueError(f"m ({m}) must divide dim ({dim})")
    d = dim // m
    # codebooks too train on the deterministic sample (r10 verdict #2):
    # expected max(MIN_TRAIN, TRAIN_PER_CELL·k) vectors — CONSTANT in N
    # (k is fixed here), so PQ training cost stops growing with the
    # corpus; identity below MIN_TRAIN-scale inputs (bit-identical small
    # fixtures). Encoding (pq_encode) still covers the full corpus.
    # r12 driver-local fast path (the kmeans_centroids recipe): the
    # sample is CONSTANT-bounded here, so the whole m-subspace Lloyd's
    # loop runs as numpy on the driver — TWO bounded collects (seeds +
    # sample) replace the per-iteration broadcast-join + min_by +
    # decimal-agg chain (measured 5.2-7.4 s of distributed overhead at
    # sf0.1). Assignment via the shared `_score_assign_block` kernel
    # (GEMM; exact ties → smaller cell, the min_by struct order);
    # means are fixed-order float64 sums — deterministic for a fixed
    # corpus, the contract the rows-only pq/ivfpq consumers pin.
    target = max(MIN_TRAIN, TRAIN_PER_CELL * k)
    if iters > 0 and target <= DRIVER_TRAIN_BOUND:
        seed_vec_rows = (
            df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
        )
        samp_rows = (
            _train_sample(df.select(id_col, vec_col), id_col, k, salt=0xB00C)
            .select(vec_col)
            .collect()
        )
        if seed_vec_rows and samp_rows:
            cells_np = np.array(
                [int(r[0]) for r in seed_vec_rows], dtype=np.int64
            )
            smat = np.array(
                [list(r[1]) for r in seed_vec_rows], dtype=np.float64
            )
            order = np.argsort(cells_np)
            cells_np, smat = cells_np[order], smat[order]
            x = np.stack(
                [np.asarray(r[0], dtype=np.float64) for r in samp_rows]
            )
            out_rows = []
            for s in range(m):
                cells_s, cmat_s = _lloyd_driver(
                    x[:, s * d : (s + 1) * d],
                    cells_np,
                    smat[:, s * d : (s + 1) * d].copy(),
                    iters,
                )
                out_rows.extend(
                    (s, int(c), [float(v) for v in row])
                    for c, row in zip(cells_s, cmat_s)
                )
            schema = StructType(
                [
                    StructField("sub", IntegerType()),
                    StructField("cell", IntegerType()),
                    StructField("centroid", ArrayType(DoubleType())),
                ]
            )
            return df.sparkSession.createDataFrame(out_rows, schema)
    parts = _pq_subvectors(
        _train_sample(df.select(id_col, vec_col), id_col, k, salt=0xB00C),
        m, d, [id_col], vec_col,
    ).localCheckpoint(
        eager=True
    )  # scanned once per iteration
    # seeds come from the FULL df (the k lowest ids), independent of the
    # sample — a sampled-out seed id must still initialize its cell
    seed_ids = df.select(id_col).orderBy(id_col).limit(k)
    cents = _pq_subvectors(
        df.join(F.broadcast(seed_ids), id_col, "left_semi"), m, d, [id_col], vec_col
    ).select(
        "sub",
        F.col(id_col).cast("int").alias("cell"),
        F.transform(F.col("v"), lambda x: x.cast("double")).alias("centroid"),
    )
    sums = [
        F.sum(F.col("v")[i].cast("decimal(38,18)")).alias(f"s{i}") for i in range(d)
    ]
    for _ in range(iters):
        scored = parts.join(F.broadcast(cents), "sub").select(
            id_col,
            "sub",
            "v",
            "cell",
            sq_l2(F.col("v"), F.col("centroid")).alias("__d2"),
        )
        assigned = scored.groupBy(id_col, "sub").agg(
            F.min_by(
                F.struct(F.col("cell"), F.col("v")),
                F.struct(F.col("__d2"), F.col("cell")),
            ).alias("__best")
        ).select(
            "sub", F.col("__best.cell").alias("cell"), F.col("__best.v").alias("v")
        )
        # NO per-iteration checkpoint here (re-measured r11 after the
        # kmeans_centroids one won 2.1×): this loop's nesting is
        # shallow (seeds are a plain limit, no stats crossJoin) and the
        # eager jobs came out ~0.3 s WORSE at sf0.1
        cents = (
            assigned.groupBy("sub", "cell")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .select(
                "sub",
                "cell",
                F.array(
                    *[
                        (F.col(f"s{i}").cast("double") / F.col("n"))
                        for i in range(d)
                    ]
                ).alias("centroid"),
            )
        )
    return cents


def _pq_subvectors(
    df: DataFrame, m: int, d: int, id_cols: Sequence[str], vec_col: str
) -> DataFrame:
    """(ids…, sub, v): each row exploded into its m subvectors."""
    return df.select(
        *id_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(F.col(vec_col), s * d + 1, d).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("p"),
    ).select(*id_cols, "p.sub", "p.v")


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    passthrough_cols: Sequence[str] = (),
) -> DataFrame:
    """Encode every vector as its nearest codebook cell per subspace:
    ``(id, sub, code)`` — the compressed representation PQ search runs
    on.

    r12 shape (the `_assign_cells` recipe): the codebook — m·k rows,
    always broadcast-sized — is collected once, shipped as a Spark
    BROADCAST variable (not a per-task closure), and consumed by an
    Arrow-batched numpy kernel that encodes all m subspaces per row in
    one pass with ONE GEMM per subspace (‖x‖²+‖c‖²−2x@Cᵀ): the former
    broadcast join + min_by materialized N·m rows and ran N·m·k
    interpreted d-dim folds. Ties still break (distance, cell): per-sub
    cells are column-ordered ascending and argmin returns the first
    minimum. Rows-only consumers (pq / ivfpq); codes are deterministic
    for a fixed corpus.

    ``passthrough_cols`` ride through the kernel unchanged, repeated
    once per subspace and appended after ``code`` (r12: lets the IVF-PQ
    build attach the coarse cell the assignment kernel already knows,
    instead of joining the N·m-row code table back to the N-row
    residual table — at scale that join is a full shuffle of the
    biggest index table)."""
    d = dim // m
    book_rows = codebooks.select("sub", "cell", "centroid").collect()
    by_sub: dict[int, list] = {}
    for r in book_rows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["cell"]), list(r["centroid"]))
        )
    if sorted(by_sub) != list(range(m)):
        raise ValueError(
            f"pq_encode: codebooks must cover subs 0..{m-1}, got {sorted(by_sub)}"
        )
    cells_by_sub = []
    cmats = []
    c2s = []
    for s in range(m):
        entries = sorted(by_sub[s])  # ascending cell → argmin ties = min cell
        cells_by_sub.append(np.array([c for c, _ in entries], dtype=np.int64))
        cm = np.array([v for _, v in entries], dtype=np.float64)
        cmats.append(cm)
        c2s.append(np.einsum("ij,ij->i", cm, cm))
    in_id = df.schema[id_col]
    pcols = list(passthrough_cols)
    out_schema = StructType(
        [in_id, StructField("sub", IntegerType()), StructField("code", IntegerType())]
        + [df.schema[c] for c in pcols]
    )
    bc = df.sparkSession.sparkContext.broadcast((cells_by_sub, cmats, c2s))
    # resolved OUTSIDE the kernel closure: the closure must not capture
    # the DataFrame (SPARK-5063 — it drags SparkContext into the pickle)
    pcol_np_dtypes = {
        c: _NP_INT_DTYPES.get(type(df.schema[c].dataType)) for c in pcols
    }

    def encode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        _limit_blas_threads()  # Spark owns the parallelism (see helper)
        cells_by_sub, cmats, c2s = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
            )
            b = x.shape[0]
            ids = pdf[id_col].to_numpy()
            out_id, out_sub, out_code = [], [], []
            for s in range(m):
                xs = x[:, s * d : (s + 1) * d]
                cm = cmats[s]
                dist = (
                    np.einsum("ij,ij->i", xs, xs)[:, None]
                    + c2s[s][None, :]
                    - 2.0 * (xs @ cm.T)
                )
                out_id.append(ids)
                out_sub.append(np.full(b, s, dtype=np.int32))
                out_code.append(
                    cells_by_sub[s][np.argmin(dist, axis=1)].astype(np.int32)
                )
            out = {
                id_col: np.concatenate(out_id),
                "sub": np.concatenate(out_sub),
                "code": np.concatenate(out_code),
            }
            for c in pcols:
                # each sub block repeats the batch's rows in order, so
                # tiling the column m times aligns with the id tiling.
                # Integral passthroughs are pinned to their declared
                # numpy dtype (r12 advice): a null would arrive from
                # Arrow as float64/NaN and silently alter values under
                # the IntegerType out_schema — fail loudly instead.
                col = pdf[c]
                np_t = pcol_np_dtypes[c]
                if np_t is not None:
                    if col.isna().any():
                        raise ValueError(
                            f"pq_encode: passthrough column {c!r} has "
                            "nulls — passthrough_cols must be null-free"
                        )
                    out[c] = np.tile(col.to_numpy(np_t), m)
                else:
                    out[c] = np.tile(col.to_numpy(), m)
            yield pd.DataFrame(out)

    return df.select(id_col, *pcols, vec_col).mapInPandas(encode, schema=out_schema)


def pq_topk(
    df: DataFrame,
    probes_df: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    dim: int = 64,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance (ADC): each probe
    precomputes a distance table d²(probe_sub, centroid) for every
    (sub, cell) — m·k doubles per probe, broadcast — and a corpus
    vector's approximate distance is the SUM of m table lookups keyed
    by its codes. The corpus side touches only the (id, sub, code)
    table: raw vectors never move, never even load, at query time —
    the 100 TB memory shape.

    The per-(probe, vec) sum goes through decimal so the total is
    independent of partial-aggregation order (the repo's double-sum
    rule); ranking ties break on ``id_col``. Returns
    ``(probe_id, id, adc_d2)``, ascending distance per probe."""
    d = dim // m
    codes = pq_encode(df, codebooks, m=m, id_col=id_col, vec_col=vec_col, dim=dim)
    pparts = _pq_subvectors(
        probes_df.select(F.col(id_col).alias(probe_id_col), F.col(vec_col)),
        m,
        d,
        [probe_id_col],
        vec_col,
    )
    ptab = pparts.join(F.broadcast(codebooks), "sub").select(
        probe_id_col,
        "sub",
        F.col("cell").alias("code"),
        sq_l2(F.col("v"), F.col("centroid")).alias("d2"),
    )
    cand = (
        codes.join(F.broadcast(ptab), ["sub", "code"])
        .groupBy(probe_id_col, id_col)
        .agg(
            F.sum(F.col("d2").cast("decimal(38,18)")).cast("double").alias("adc_d2")
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("adc_d2"), F.col(id_col))
    return (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def embedding_cosine_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
    max_block: int | None = 100_000,
    on_oversize: str = "raise",
    dim: int = 64,
    impl: str = "join",
) -> DataFrame:
    """Exact near-dup pairs by cosine with optional blocking on a
    cheap attribute (label/cluster/source): all-pairs within a block
    only — the classic blocked-dedup shape.

    Quadratic within a block (cost Σ |block|²), so the block bound is
    ENFORCED, not just documented: per-block counts are computed
    in-plan (one small aggregate — one row per block label) and
    inspected driver-side, the same deliberate metadata-scale action as
    :func:`operators.graph.connected_components`' convergence check. If
    any block exceeds ``max_block``:

    - ``on_oversize="raise"`` (default): ``RuntimeError`` naming the
      offending blocks — a skewed block (one label holding 10% of a
      100 TB corpus) must fail loudly, never silently go quadratic.
    - ``on_oversize="lsh"``: bounded blocks keep the exact all-pairs
      path; each oversized block is routed through
      :func:`lsh_cosine_pairs` (bucketed, never all-pairs) per block,
      preserving the within-block pairing semantics at LSH recall.

    ``max_block=None`` disables the guard (caller asserts boundedness).

    ``impl="grouped"`` (rows-only callers ONLY — semdedup's cell
    blocking) scores each block in the chunked-numpy
    :func:`_grouped_all_pairs_cosine` kernel instead of the candidate
    join: the Σ|block|² rows carrying two 64-dim vectors each never
    materialize, only qualifying pairs leave Python. Oracle-gated
    callers keep the default join+fold form (bit-matched to DuckDB).
    """
    if impl not in ("join", "grouped"):
        raise ValueError(f"impl must be 'join' or 'grouped', got {impl!r}")
    allpairs = (
        _grouped_all_pairs_cosine if impl == "grouped" else _blocked_all_pairs_cosine
    )
    blk = F.col(block_col) if block_col else F.lit(0)
    if max_block is None:
        return allpairs(df, id_col, vec_col, blk, threshold)
    if on_oversize not in ("raise", "lsh"):
        raise ValueError(f"on_oversize must be 'raise' or 'lsh', got {on_oversize!r}")
    counts = df.groupBy(blk.alias("blk")).agg(F.count("*").alias("__n"))
    oversized = [
        (r["blk"], r["__n"]) for r in counts.filter(F.col("__n") > max_block).collect()
    ]
    if not oversized:
        return allpairs(df, id_col, vec_col, blk, threshold)
    if on_oversize == "raise":
        raise RuntimeError(
            f"embedding_cosine_near_dups: block(s) exceed max_block={max_block} "
            f"(all-pairs within a block is quadratic): "
            f"{[(b, int(n)) for b, n in oversized]}; use on_oversize='lsh' to "
            "route oversized blocks through lsh_cosine_pairs, raise max_block, "
            "or pre-split the blocks"
        )
    big_keys = [b for b, _ in oversized]
    # null-safe block routing: eqNullSafe never yields NULL, so a null
    # block label routes correctly instead of vanishing under ~isin()
    is_big = None
    for key in big_keys:
        c = blk.eqNullSafe(F.lit(key))
        is_big = c if is_big is None else (is_big | c)
    bounded = df.filter(~is_big)
    exact = allpairs(bounded, id_col, vec_col, blk, threshold)
    out = exact.select("id_a", "id_b", "cos_sim")
    for key in big_keys:
        block_rows = df.filter(blk.eqNullSafe(F.lit(key)))
        approx = lsh_cosine_pairs(
            block_rows, id_col=id_col, vec_col=vec_col, threshold=threshold, dim=dim
        )
        out = out.unionByName(approx.select("id_a", "id_b", "cos_sim"))
    return out


def mmr_topk(
    df: DataFrame,
    probe_df: DataFrame,
    k_pool: int = 20,
    k_out: int = 5,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): greedily pick ``k_out`` results from the
    exact cosine top-``k_pool`` candidate pool, each step maximizing
    ``lam·rel − (1−lam)·max_sim_to_already_selected`` — the
    de-redundancy re-rank that keeps a retrieval (or training-data
    sampling) slice from returning near-copies of one document.

    Scale/determinism shape: the FULL corpus is touched only by the
    exact top-``k_pool`` scan (TakeOrderedAndProject, probe broadcast
    in-plan); everything after — the pool×pool similarity matrix
    (``k_pool``² rows) and the ``k_out`` unrolled greedy steps — runs
    on persisted ≤``k_pool``-row intermediates, entirely in-plan (no
    driver collect). Every score is the deterministic left-to-right
    cosine fold (DuckDB list_sum parity), `max` over doubles is
    order-independent, and every argmax breaks exact ties by id, so
    the whole greedy trajectory is oracle-exact."""
    rel_pool = persist_if_uncached(
        probe_df.select(F.col(vec_col).alias("_pv"))
        .limit(1)
        .crossJoin(df)  # broadcast probe side is 1 row
        .select(
            F.col(id_col),
            F.col(vec_col),
            cosine(F.col(vec_col), F.col("_pv")).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(k_pool)
    )
    sims = persist_if_uncached(
        rel_pool.select(F.col(id_col).alias("ia"), F.col(vec_col).alias("va"))
        .crossJoin(
            rel_pool.select(F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"))
        )
        .select("ia", "ib", cosine(F.col("va"), F.col("vb")).alias("s"))
    )
    pool = rel_pool.select(id_col, "rel")
    selected = (
        pool.orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(1)
        .select(F.lit(1).alias("rank"), F.col(id_col), F.col("rel"))
    )
    # per-step lineage cut: each pick references `selected` TWICE (the
    # anti-join and the union), so the uncut plan doubles per step —
    # 2^k analysis/codegen cost on <= 5 rows of data (measured 5.8 s at
    # sf0.1, 2.1 s with the cut; the pq_codebooks counter-lesson does
    # not apply because the state here is rows, not a growing plan over
    # corpus-sized inputs)
    selected = selected.localCheckpoint(eager=True)
    for step in range(2, k_out + 1):
        sel_ids = selected.select(F.col(id_col).alias("_sel_id"))
        ms = (
            sims.join(sel_ids, sims.ib == F.col("_sel_id"))
            .groupBy("ia")
            .agg(F.max("s").alias("ms"))
        )
        # mu is an EXPLICIT parameter, not 1-lam: Python's 1.0-0.7 is
        # 0.30000000000000004, which would silently diverge from the
        # oracle's 0.3e0 literal
        score = F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("ms")
        pick = (
            pool.join(sel_ids, pool[id_col] == F.col("_sel_id"), "left_anti")
            .join(ms, pool[id_col] == ms.ia)
            .orderBy(score.desc(), F.col(id_col))
            .limit(1)
            .select(F.lit(step).alias("rank"), F.col(id_col), F.col("rel"))
        )
        selected = selected.union(pick).localCheckpoint(eager=True)
    return selected


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Johnson–Lindenstrauss RANDOM PROJECTION: multiply every vector
    by a deterministic ``out_dim × dim`` Gaussian matrix (the
    :func:`random_hyperplanes` generator, so the matrix is a pure
    function of the seed — reproducible across runs AND engines).
    JL is the standard pre-ANN dimensionality cut at corpus scale:
    pairwise distances are preserved within (1±ε) for
    out_dim = O(log n / ε²), and every downstream op (top-k, LSH,
    IVF) gets a dim/out_dim-fold cheaper vector column.

    Returns the EXPLODED row form ``(id, dim, value)`` (the
    q_llm_quantize_int8 surface convention). Pure map — zero shuffles
    at any corpus size; each output value is one left-to-right
    64-term double fold (:func:`dot`), bit-reproducible in DuckDB.
    """
    planes = random_hyperplanes(dim, out_dim, seed=seed)
    vals = F.array(
        *[dot(F.col(vec_col), _vec_lit(p)) for p in planes]
    )
    return df.select(
        F.col(id_col), F.posexplode(vals).alias("dim", "value")
    )


def semdedup(
    df: DataFrame,
    k_cells: int | None = None,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    max_block: int | None = 100_000,
    n_probe: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): SEMANTIC deduplication in
    embedding space — cluster the corpus with the deterministic
    k-means quantizer, then inside each cell drop every vector that
    has a LOWER-id neighbor with cosine >= ``threshold`` (the keep-min
    rule of :func:`operators.dedup.exact_dedup`, applied to semantic
    neighborhoods). This is the embedding-side production recipe
    (LAION / DataComp style) that catches paraphrases and re-encodes
    the text-shingle family cannot see.

    Returns the SURVIVORS as ``(id, cell)``.

    Scale shape: the quantizer build is iters × (one corpus scan + two
    aggregates); assignment is one broadcast-centroid scan; the
    within-cell pair search is the cell-BLOCKED
    :func:`embedding_cosine_near_dups` plan — cost Σ|cell|², with the
    same enforced ``max_block`` guard (a skewed cell fails loudly or
    routes through LSH, never silently quadratic). With the default
    ``k_cells=None`` the cell count is derived IN-PLAN ∝ √corpus
    (:func:`kmeans_centroids` adaptive seeds — the r7 verdict's B∝N
    treatment): expected cell size √N, so assignment (N·k) and pair
    search (N²/k) both sit at N^1.5 and the ``max_block`` backstop
    only trips on genuine density skew, not on corpus growth. An
    explicit ``k_cells`` pins the cell count (the rehearsal control).
    Deterministic end to end (seed ids are a pure hash/sort of the id
    column, no RNG) but floats iterate → rows-only, invariant-gated.

    ``n_probe > 1`` closes the paper's boundary blind spot: the pair
    search runs over each vector's ``n_probe`` nearest cells instead of
    only the primary one, so a near-dup pair straddling a Voronoi
    boundary still collides — at ~``n_probe²`` × the within-cell pair
    cost (see inline note). Survivor labels stay the primary cell.
    """
    cents = kmeans_centroids(
        df, k=k_cells, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    # The assignment is consumed FOUR times downstream (the oversize
    # guard's count collect, both sides of the within-cell self-join,
    # and the final anti-join) — without materialization each consumer
    # re-executes the full iters×(scan+aggs) k-means chain (measured
    # 4× at sf0.1: 18.8 s → 6 s). localCheckpoint truncates lineage
    # exactly as in operators/graph's iterative siblings; the
    # checkpointed footprint is N×(id+vec) rows, the op's working set.
    assigned = _assign_cells(
        df.select(id_col, vec_col), cents, vec_col=vec_col, id_cols=[id_col]
    ).localCheckpoint(eager=True)
    if n_probe == 1:
        probe_rows = assigned
    else:
        # Multi-probe recall lever (beyond the paper's single
        # assignment): a TRUE near-dup pair that straddles a Voronoi
        # boundary lands in different primary cells and is invisible to
        # single-probe blocking. Re-assigning every vector to its
        # n_probe nearest cells makes such a pair collide in at least
        # one probed cell (near-identical vectors have near-identical
        # centroid distances, so their top-n_probe cell SETS overlap).
        # Cost: the pair search runs over n_probe×N block rows —
        # Σ|cell|² grows ~n_probe², the documented trade. Reported
        # (id, cell) labels stay the PRIMARY assignment.
        probe_rows = _assign_cells(
            df.select(id_col, vec_col), cents, vec_col=vec_col,
            id_cols=[id_col], n_probe=n_probe,
        ).localCheckpoint(eager=True)
    # rows-only key → the chunked-numpy grouped kernel: the join form
    # shuffled Σ|cell|² ≈ N^1.5 candidate rows each carrying BOTH
    # 64-dim vectors (~1 KB/row); grouped, the block's vectors cross
    # once and only qualifying pairs leave Python (r11)
    pairs = embedding_cosine_near_dups(
        probe_rows,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cell",
        threshold=threshold,
        max_block=max_block,
        dim=dim,
        impl="grouped",
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return assigned.join(drops, id_col, "left_anti").select(id_col, "cell")


def semdedup_ingest_delta(
    new_df: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int | None = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """ONLINE SemDeDup: dedup an ingest DELTA of embeddings against a
    STANDING cell-assigned index — the embedding-space twin of
    :func:`operators.dedup.near_dup_ingest_delta` and the op a
    continuously-crawling multimodal/embedding pipeline runs per batch
    (LAION-style online semantic dedup). The quantizer (``centroids``,
    a :func:`kmeans_centroids` table built ONCE from the historical
    corpus) stays FIXED across batches — that is what makes cell
    membership stable, so a delta vector only ever probes the one cell
    its nearest centroid names (the IVF probe shape). Delta vectors
    with any index neighbor at cosine >= ``threshold`` in their cell
    are dropped; survivors are returned together with their
    ``(id, cell, vec)`` rows for the caller to APPEND to the index —
    the cross-batch contract (a near-copy arriving in a later batch is
    caught against an earlier batch's acceptance).

    Scale shape: per batch one broadcast-centroid assignment scan of
    the DELTA only (the corpus is never rescanned), then a cell
    equi-join delta×(cell members) — with the index built on adaptive
    ~√N cells (kmeans_centroids ``k=None``), expected probe cost per
    delta row is √N vectors, never the corpus. The index carries
    fixed-width rows (id + cell + the vector), keyed exactly how the
    probe reads it — partition the store by ``cell`` at scale.
    Fixed-quantizer drift (cells going stale as the distribution
    moves) is handled operationally: rebuild centroids + re-assign
    offline, swap the store — same recipe as any IVF index rebuild.

    Blind spot (same as :func:`operators.dedup.near_dup_ingest_delta`):
    the delta is compared against the INDEX only, not against itself —
    two near-dup vectors arriving in the SAME batch are both accepted
    and both appended. Remedy where intra-batch dups matter: run
    :func:`semdedup` on the delta first, then ingest the survivors.
    """
    if max_cell is not None:
        # the family's loud-fail contract (embedding_cosine_near_dups):
        # a skewed index cell makes the probe join quadratic in that
        # cell — fail naming the cells rather than silently blow up.
        # One metadata-scale aggregate over the index per call.
        oversized = [
            (r["cell"], int(r["__n"]))
            for r in index.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_cell)
            .collect()
        ]
        if oversized:
            raise RuntimeError(
                f"semdedup_ingest_delta: index cell(s) exceed max_cell="
                f"{max_cell}: {oversized[:10]}; rebuild the quantizer with "
                "more cells (kmeans_centroids k=None scales ∝ √corpus) or "
                "re-shard the oversized cells"
            )
    assigned = _assign_cells(
        new_df.select(id_col, vec_col), centroids, vec_col=vec_col,
        id_cols=[id_col],
    )
    probe = assigned.select(
        F.col(id_col).alias("__nid"),
        F.col(vec_col).alias("__nv"),
        "cell",
    ).join(
        index.select(F.col(vec_col).alias("__iv"), "cell"),
        "cell",
    )
    dup_ids = (
        probe.filter(cosine(F.col("__nv"), F.col("__iv")) >= threshold)
        .select(F.col("__nid").alias(id_col))
        .distinct()
    )
    accepted = new_df.join(dup_ids, id_col, "left_anti")
    accepted_rows = assigned.join(accepted.select(id_col), id_col, "left_semi")
    return accepted, accepted_rows.select(id_col, "cell", vec_col)


def ivfpq_topk(
    df: DataFrame,
    probes_df: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    m: int = 8,
    ks: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    dim: int = 64,
    coarse: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the composition FAISS ships as its
    production index (Jégou et al. 2011 §IV): an inverted-file coarse
    quantizer restricts the search to each probe's ``n_probe`` nearest
    cells (the :func:`ivf_topk` pruning), and within those cells
    vectors are scored by asymmetric distance over RESIDUAL product
    codes (the :func:`pq_topk` memory shape, trained on ``vec −
    centroid[cell]`` — residuals are tighter-clustered than raw
    vectors, so the same codebook budget quantizes finer).

    Scale shape, piecewise: the coarse quantizer defaults to the
    adaptive √N cells (:func:`kmeans_centroids` ``k=None``); corpus
    assignment + residual is one broadcast-centroid scan; codebooks
    are m·ks rows (always broadcast); the encoded corpus is m fixed-
    width code rows per vector (raw vectors never move at query time);
    the probe side carries n_probe·m·ks ADC table rows per probe
    (broadcast); and the candidate join keys on (coarse cell, sub,
    code) — only probed cells' codes are ever touched, never the
    corpus. Per-(probe, vec) ADC sums go through decimal (the repo's
    double-sum rule); ties break on ``id_col``.

    Returns ``(probe_id, id, adc_d2)`` ascending per probe. Rows-only
    (two nested iterative quantizers); self-retrieval / planted-dup /
    cell-pruning invariants in tests/test_llm_ops.py.

    This convenience composition retrains per call — the 100 TB serving
    reality is :func:`ivfpq_build` ONCE (persist the three index
    tables), then :func:`ivfpq_search` per probe batch against the
    standing index (`q_llm_ivfpq_serve`).
    """
    cents, books, codes = ivfpq_build(
        df, m=m, ks=ks, iters=iters, id_col=id_col, vec_col=vec_col,
        dim=dim, coarse=coarse,
    )
    return ivfpq_search(
        cents, books, codes, probes_df, k=k, n_probe=n_probe, m=m,
        id_col=id_col, vec_col=vec_col, probe_id_col=probe_id_col, dim=dim,
    )


def ivfpq_build(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    coarse: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the IVF-PQ index ONCE: returns the three standing index
    tables ``(cents, books, codes)`` —

    - ``cents``: coarse quantizer, (cell, centroid) — √N rows,
    - ``books``: per-subspace PQ codebooks, (sub, cell=code, centroid)
      — m·ks rows, always broadcast-sized,
    - ``codes``: the encoded corpus, (id, sub, code, __ivf_cell) — m
      byte-width rows per vector, the ONLY ∝N table, and the one a
      production deployment partitions by ``__ivf_cell`` on shared
      storage (raw vectors never needed again at query time).

    Training is deterministic on a fixed corpus (hash-stride k-means
    seeding, fixed iterations), so an index persisted to parquet and
    read back serves bit-identical results to a fresh train — the
    `q_llm_ivfpq_serve` invariant. Rebuilds (distribution drift) follow
    the standard IVF recipe: retrain offline, swap the store.
    """
    cents = persist_if_uncached(
        coarse
        if coarse is not None
        else kmeans_centroids(
            df, k=None, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
        )
    )
    # consumed by the m-subspace codebook build AND the encode pass —
    # materialize once (the semdedup assignment lesson). r12: the
    # residual comes straight out of the assignment kernel (numpy
    # x − centroid, bit-identical elementwise IEEE subtraction) —
    # drops the broadcast-cents join AND the interpreted zip_with over
    # every corpus vector the former consumer form paid (§4.2).
    resid = (
        _assign_cells(
            df.select(id_col, vec_col), cents, vec_col=vec_col,
            id_cols=[id_col], residual_col="__rv",
        )
        .select(id_col, "cell", "__rv")
        .localCheckpoint(eager=True)
    )
    books = persist_if_uncached(
        pq_codebooks(resid, m=m, k=ks, iters=iters, id_col=id_col,
                     vec_col="__rv", dim=dim)
    )
    # r12 (§2.4): the coarse cell rides THROUGH the encode kernel as a
    # passthrough column — the former `codes ⋈ resid` on id re-attached
    # a value the assignment kernel had already computed, and at scale
    # that join shuffles the N·m-row code table (the biggest index
    # table). Same rows, same schema, zero joins.
    codes = pq_encode(
        resid.select(id_col, F.col("cell").alias("__ivf_cell"), "__rv"),
        books, m=m, id_col=id_col, vec_col="__rv", dim=dim,
        passthrough_cols=["__ivf_cell"],
    )
    return cents, books, codes


def ivfpq_append(
    new_df: DataFrame,
    cents: DataFrame,
    books: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """INCREMENTAL index maintenance (r11 verdict #3): encode a DELTA
    of new vectors against the FROZEN coarse quantizer + codebooks and
    return their ``(id, sub, code, __ivf_cell)`` rows for the caller to
    APPEND to the standing codes table — no retraining, the corpus is
    never rescanned. This is the serving-side twin of the dedup
    family's ingest-delta ops: the standing index grows per batch at
    delta cost (one broadcast-centroid assignment scan of the delta +
    one broadcast-codebook encode pass).

    Because assignment and encoding are EXACTLY the build's own kernels
    run against the same frozen tables, search-after-append is
    bit-identical to search after a full re-encode of (corpus ∪ delta)
    with the same frozen quantizer/codebooks — the
    `q_llm_ivfpq_append` invariant (tests/test_llm_ops.py). When to
    retrain instead of append is a DRIFT question: :func:`ivfpq_drift`
    (the q_llm_dim_stats monitor against the train-time snapshot)."""
    # r12 (§2.4): the cell rides through the encode kernel (see
    # ivfpq_build) — single consumer now, so the delta's checkpoint
    # goes too: one assignment scan + one encode pass, zero joins.
    resid = _assign_cells(
        new_df.select(id_col, vec_col), cents, vec_col=vec_col,
        id_cols=[id_col], residual_col="__rv",
    ).select(id_col, F.col("cell").alias("__ivf_cell"), "__rv")
    return pq_encode(
        resid, books, m=m, id_col=id_col, vec_col="__rv", dim=dim,
        passthrough_cols=["__ivf_cell"],
    )


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``(dim, n, mean_x, min_x, max_x)`` of an embedding
    column — the drift-monitor summary :func:`ivfpq_drift` compares
    (the q_llm_dim_stats shape). The mean rides the tie-guarded
    DECIMAL(28,8) f32-mean discipline (queries/llm._f32_mean — ONE
    double→decimal cast at a scale with no dyadic tie in f32 data,
    divide after casting back to double), min/max are exact order
    statistics — every column oracle-reproducible, unlike a variance
    (whose x² decimal cast sits at the f64 tie floor)."""
    ex = df.select(F.posexplode(F.col(vec_col)).alias("dim", "x"))
    return ex.groupBy("dim").agg(
        F.count("x").cast("bigint").alias("n"),
        (
            F.sum(F.col("x").cast("double").cast("decimal(28,8)")).cast("double")
            / F.count("x")
        )
        .cast("double")
        .alias("mean_x"),
        F.min("x").cast("double").alias("min_x"),
        F.max("x").cast("double").alias("max_x"),
    )


def ivfpq_drift(
    delta_stats: DataFrame,
    train_stats: DataFrame,
    shift_threshold: float = 0.05,
    drifted_dims_frac: float = 0.25,
) -> DataFrame:
    """RETRAIN TRIGGER for a standing IVF-PQ index: compare the ingest
    delta's per-dimension stats (:func:`dim_stats`) against the
    snapshot captured at train time. A dimension has drifted when its
    delta mean moved more than ``shift_threshold`` of the train-time
    VALUE RANGE (max−min — the range-normalized mean shift: exact
    order statistics keep the whole monitor oracle-reproducible where
    a σ-normalized shift would not be); the index wants a retrain when
    more than ``drifted_dims_frac`` of dimensions drifted. Returns ONE
    row ``(n_dims, n_drifted, max_shift, retrain)`` — a metadata-scale
    verdict (both inputs are dim-count rows), evaluated per append
    batch for free. Degenerate zero-range train dims count as drifted
    only if the delta mean actually moved (guarded /0 on both engines
    — the ratio-denominator rule), and the guard keeps max_shift
    finite/NULL-free."""
    t = train_stats.select(
        "dim",
        F.col("mean_x").alias("__tmean"),
        (F.col("max_x") - F.col("min_x")).alias("__trange"),
    )
    j = delta_stats.select("dim", "mean_x").join(t, "dim")
    dmean = F.abs(F.col("mean_x") - F.col("__tmean"))
    shift = F.when(F.col("__trange") > 0, dmean / F.col("__trange")).otherwise(
        F.when(dmean > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    scored = j.select("dim", shift.alias("__shift"))
    return scored.agg(
        F.count("dim").cast("bigint").alias("n_dims"),
        F.count(F.when(F.col("__shift") > shift_threshold, 1))
        .cast("bigint")
        .alias("n_drifted"),
        F.max("__shift").alias("max_shift"),
    ).select(
        "n_dims",
        "n_drifted",
        "max_shift",
        (
            F.col("n_drifted").cast("double")
            > F.lit(drifted_dims_frac) * F.col("n_dims").cast("double")
        ).alias("retrain"),
    )


def ivfpq_search(
    cents: DataFrame,
    books: DataFrame,
    codes: DataFrame,
    probes_df: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    dim: int = 64,
) -> DataFrame:
    """Serve one probe batch against a STANDING IVF-PQ index (the
    tables :func:`ivfpq_build` returns, typically read back from
    parquet) — train-once / probe-many, the only shape that runs at
    100 TB. Per batch: one broadcast-centroid assignment of the PROBES
    (n_probe cells each), broadcast ADC tables of n_probe·m·ks rows per
    probe, and a (cell, sub, code) equi-join touching only probed
    cells' code rows — the corpus is never rescanned and raw vectors
    never move. Returns ``(probe_id, id, adc_d2)`` ascending per probe,
    ties broken on ``id_col``.
    """
    residual = F.zip_with(
        F.col(vec_col), F.col("centroid"), lambda x, y: x.cast("double") - y
    )
    presid = (
        _assign_cells(
            probes_df.select(id_col, vec_col), cents, vec_col=vec_col,
            id_cols=[id_col], n_probe=n_probe,
        )
        .join(F.broadcast(cents), "cell")
        .select(
            F.col(id_col).alias(probe_id_col),
            F.col("cell").alias("__ivf_cell"),
            residual.alias("__rv"),
        )
    )
    d = dim // m
    ptab = (
        _pq_subvectors(presid, m, d, [probe_id_col, "__ivf_cell"], "__rv")
        .join(F.broadcast(books), "sub")
        .select(
            probe_id_col,
            "__ivf_cell",
            "sub",
            F.col("cell").alias("code"),
            sq_l2(F.col("v"), F.col("centroid")).alias("d2"),
        )
    )
    cand = (
        codes.join(F.broadcast(ptab), ["__ivf_cell", "sub", "code"])
        .groupBy(probe_id_col, id_col)
        .agg(
            F.sum(F.col("d2").cast("decimal(38,18)")).cast("double").alias("adc_d2")
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("adc_d2"), F.col(id_col))
    return (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def ivfpq_probe_curve(
    cents: DataFrame,
    books: DataFrame,
    codes: DataFrame,
    probes_df: DataFrame,
    k: int = 5,
    n_probes: Sequence[int] = (1, 2, 4, 8),
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The n_probe/recall KNOB-SETTING sweep for a standing IVF-PQ index
    (r9 verdict #4 — the threshold-curve discipline applied to serving):
    score the probe batch against the index ONCE at ``max(n_probes)``
    and derive every smaller n_probe's result by filtering on the
    probed cell's RANK — exactly equivalent to re-running the search at
    that n_probe, because each corpus vector lives in exactly ONE coarse
    cell, so a candidate's ADC distance is n_probe-independent and only
    its reachability (cell rank <= n_probe) changes. One candidate
    equi-join total instead of len(n_probes); the shared candidate
    table is localCheckpoint'ed (consumed once per curve point — the
    semdedup multi-consumer rule).

    Returns ``(topk, cand_mass, cand)``: ``topk`` = (n_probe, probe_id,
    id, adc_d2) ascending per (n_probe, probe), ties on id;
    ``cand_mass`` = (n_probe, n_cand) — how many candidates the index
    scored at that setting, the cost axis of the tradeoff; ``cand`` =
    the shared checkpointed candidate table (probe_id, id, cell_rank,
    adc_d2) — callers derive REACHABILITY recall from it (the
    n_probe-monotone quantity; end-to-end recall@k is NOT monotone
    because a new cell's optimistically-quantized candidate can
    displace a true hit from the approximate top-k — measured on the
    fixture: 0.333 at n_probe=1 vs 0.32 at 2)."""
    max_np = int(max(n_probes))
    residual = F.zip_with(
        F.col(vec_col), F.col("centroid"), lambda x, y: x.cast("double") - y
    )
    scored = probes_df.select(id_col, vec_col).crossJoin(
        F.broadcast(cents)
    ).select(
        id_col,
        vec_col,
        "cell",
        sq_l2(F.col(vec_col), F.col("centroid")).alias("__d2"),
    )
    wr = Window.partitionBy(id_col).orderBy(F.col("__d2"), F.col("cell"))
    pcells = (
        scored.withColumn("cell_rank", F.row_number().over(wr))
        .filter(F.col("cell_rank") <= max_np)
        .drop("__d2")
    )
    presid = pcells.join(F.broadcast(cents), "cell").select(
        F.col(id_col).alias(probe_id_col),
        F.col("cell").alias("__ivf_cell"),
        "cell_rank",
        residual.alias("__rv"),
    )
    d = dim // m
    ptab = (
        _pq_subvectors(
            presid, m, d, [probe_id_col, "__ivf_cell", "cell_rank"], "__rv"
        )
        .join(F.broadcast(books), "sub")
        .select(
            probe_id_col,
            "__ivf_cell",
            "cell_rank",
            "sub",
            F.col("cell").alias("code"),
            sq_l2(F.col("v"), F.col("centroid")).alias("d2"),
        )
    )
    # cell_rank is constant per (probe, candidate): the candidate's one
    # home cell has one rank for that probe — safe in the groupBy key
    cand = (
        codes.join(F.broadcast(ptab), ["__ivf_cell", "sub", "code"])
        .groupBy(probe_id_col, id_col, "cell_rank")
        .agg(
            F.sum(F.col("d2").cast("decimal(38,18)"))
            .cast("double")
            .alias("adc_d2")
        )
        .localCheckpoint(eager=True)
    )
    topks = []
    masses = []
    for np_ in sorted(int(x) for x in n_probes):
        sub = cand.filter(F.col("cell_rank") <= np_)
        w = Window.partitionBy(probe_id_col).orderBy(
            F.col("adc_d2"), F.col(id_col)
        )
        topks.append(
            sub.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .select(
                F.lit(np_).cast("int").alias("n_probe"),
                probe_id_col,
                id_col,
                "adc_d2",
            )
        )
        masses.append(
            sub.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand")).select(
                F.lit(np_).cast("int").alias("n_probe"), "n_cand"
            )
        )
    topk = topks[0]
    for t in topks[1:]:
        topk = topk.unionByName(t)
    mass = masses[0]
    for t in masses[1:]:
        mass = mass.unionByName(t)
    return topk, mass, cand
