"""Round-12 ANN index-maintenance invariants (r11 verdict #2/#3):

- incremental IVF-PQ append ≡ full re-encode with the frozen
  quantizer/codebooks (bit-equality, both the code tables and the
  served search results);
- the drift trigger fires on a planted distribution shift and stays
  quiet on an identical delta;
- the two-level coarse-quantizer assignment path (engaged past
  TWO_LEVEL_CELL_BOUND) agrees with the single-level kernel and keeps
  the planted-duplicate / determinism contracts;
- the NaN-vector guard degrades to a REAL cell id, never a fabricated
  padding id (r12 ADVICE).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators import similarity
from kafka_streams_clojure_spark.operators.similarity import (
    _assign_cells,
    _assign_cells_two_level,
    dim_stats,
    ivfpq_append,
    ivfpq_build,
    ivfpq_drift,
    ivfpq_search,
    kmeans_centroids,
)
from kafka_streams_clojure_spark.queries._util import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").persist()


def test_ivfpq_append_matches_frozen_rebuild(spark, emb):
    """search-after-append ≡ search-after-full-re-encode-with-frozen-
    quantizer, bit-exact: ivfpq_append runs EXACTLY the build's own
    assignment/encode kernels against the same frozen tables, so the
    merged codes table and a from-scratch re-encode of corpus ∪ delta
    must agree row-for-row, and the served top-k must be identical
    (the ADC sum is decimal-cast → order-independent)."""
    hist = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cents, books, codes = ivfpq_build(hist, m=8, ks=16)
    merged = codes.unionByName(ivfpq_append(delta, cents, books, m=8))
    rebuilt = ivfpq_append(emb, cents, books, m=8)  # frozen full re-encode

    key = lambda r: (int(r.vec_id), int(r.sub))  # noqa: E731
    got = {key(r): (int(r.code), int(r["__ivf_cell"])) for r in merged.collect()}
    want = {key(r): (int(r.code), int(r["__ivf_cell"])) for r in rebuilt.collect()}
    assert got == want

    probes = emb.filter(F.col("vec_id") < 5)
    s_append = ivfpq_search(cents, books, merged, probes, k=5, n_probe=4, m=8)
    s_rebuild = ivfpq_search(cents, books, rebuilt, probes, k=5, n_probe=4, m=8)
    a = {(int(r.probe_id), int(r.vec_id)): float(r.adc_d2) for r in s_append.collect()}
    b = {(int(r.probe_id), int(r.vec_id)): float(r.adc_d2) for r in s_rebuild.collect()}
    assert a == b  # bit-equality, not tolerance


def test_stream_ann_ingest_matches_frozen_rebuild(spark, sf_dir, emb):
    """The streaming ingest key's contract: after the stream drains,
    searching the grown store returns EXACTLY what a frozen full
    re-encode of the whole corpus returns — batching never matters
    (codes are a keyed set, the ADC sum is decimal-cast), and the
    history + appended deltas together cover every vector once."""
    import __spark_entry__ as entrymod
    from kafka_streams_clojure_spark.operators.similarity import (
        ivfpq_append,
        ivfpq_build,
        ivfpq_search,
    )

    streamed = entrymod.queries()["q_stream_ann_ingest"](spark, sf_dir)
    got = {
        (int(r.probe_id), int(r.vec_id)): float(r.adc_d2)
        for r in streamed.collect()
    }
    hist = emb.filter(F.col("vec_id") % 3 == 0)
    cents, books, _ = ivfpq_build(hist, m=8, ks=16)
    rebuilt = ivfpq_append(emb, cents, books, m=8)
    probes = emb.filter(F.col("vec_id") < 5)
    want = {
        (int(r.probe_id), int(r.vec_id)): float(r.adc_d2)
        for r in ivfpq_search(cents, books, rebuilt, probes, k=5, n_probe=4, m=8).collect()
    }
    assert got == want


def test_ivfpq_drift_quiet_on_identical_delta(emb):
    """A delta drawn from the train distribution itself (the train
    slice verbatim) must not trip the trigger: every shift is exactly
    0 and retrain is False."""
    tr = dim_stats(emb)
    verdict = ivfpq_drift(dim_stats(emb), tr).collect()[0]
    assert verdict.n_drifted == 0
    assert float(verdict.max_shift) == 0.0
    assert verdict.retrain is False


def test_ivfpq_drift_fires_on_planted_shift(emb):
    """Shifting every component by +0.5 moves each dimension's mean by
    0.5 — far past 5% of any fixture dimension's value range — so all
    dims drift and retrain is True."""
    shifted = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x + F.lit(0.5)).alias(
            "embedding"
        ),
    )
    tr = dim_stats(emb)
    verdict = ivfpq_drift(dim_stats(shifted), tr).collect()[0]
    assert verdict.n_drifted == verdict.n_dims
    assert verdict.retrain is True


def test_two_level_assignment_contracts(spark, emb, monkeypatch):
    """Past TWO_LEVEL_CELL_BOUND the kernel must ROUTE (not raise)
    through the coarse-sharded path, and the path must keep the family
    contracts: (a) probing ALL coarse shards reproduces the
    single-level assignment exactly; (b) the default partial probe
    agrees with single-level on >=90% of rows (it is an IVF-style
    approximation); (c) identical duplicate vectors land in identical
    cells; (d) the path is deterministic across runs."""
    base = emb.select("vec_id", "embedding")
    cents = kmeans_centroids(base, k=100, iters=2).persist()
    k = cents.count()
    assert k > 64  # K1 = ceil(sqrt(k)) > 8 → default probe is PARTIAL
    single = {
        int(r.vec_id): int(r.cell)
        for r in _assign_cells(base, cents, id_cols=["vec_id"]).collect()
    }

    monkeypatch.setattr(similarity, "TWO_LEVEL_CELL_BOUND", 4)
    routed = _assign_cells(base, cents, id_cols=["vec_id"])  # no raise
    two_default = {int(r.vec_id): int(r.cell) for r in routed.collect()}
    agree = sum(1 for v, c in two_default.items() if single[v] == c)
    assert agree >= 0.9 * len(single), f"{agree}/{len(single)}"

    cent_rows = cents.select("cell", "centroid").collect()
    full = {
        int(r.vec_id): int(r.cell)
        for r in _assign_cells_two_level(
            base, cent_rows, cents, "embedding", 1, ["vec_id"],
            coarse_probe=10**6,
        ).collect()
    }
    assert full == single  # all shards probed = exact single-level

    dup = base.filter(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    dup_cells = {
        int(r.vec_id): int(r.cell)
        for r in _assign_cells(
            base.unionByName(dup), cents, id_cols=["vec_id"]
        ).collect()
    }
    for v in range(20):
        if v in dup_cells and v + 1_000_000 in dup_cells:
            assert dup_cells[v] == dup_cells[v + 1_000_000], v

    rerun = {int(r.vec_id): int(r.cell) for r in routed.collect()}
    assert rerun == two_default


def test_assign_cells_nan_guard(spark):
    """A NaN-bearing vector yields all-NaN distances; the kernel must
    degrade it to the smallest REAL cell id (the inf padding sorts
    before NaN), never the old fabricated padding id 0."""
    nan = float("nan")
    df = spark.createDataFrame(
        [(1, [nan, nan]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(3, [0.0, 0.0]), (7, [1.0, 1.0])], "cell int, centroid array<double>"
    )
    got = {
        int(r.vec_id): int(r.cell)
        for r in _assign_cells(df, cents, id_cols=["vec_id"]).collect()
    }
    assert got[1] == 3  # smallest real cell, NOT 0
    assert got[2] == 7


def test_pq_encode_passthrough_matches_join_form(spark, emb):
    """r12 optimization guard: the ivfpq codes table built with the
    coarse cell riding THROUGH the encode kernel (passthrough_cols)
    must be bit-identical — rows and schema — to the former
    pq_encode ⋈ resid-on-id join form (the N·m-row shuffle the
    passthrough removes)."""
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    cents = kmeans_centroids(emb)
    resid = (
        _assign_cells(
            emb.select("vec_id", "embedding"), cents,
            vec_col="embedding", id_cols=["vec_id"], residual_col="__rv",
        )
        .select("vec_id", "cell", "__rv")
        .localCheckpoint(eager=True)
    )
    books = pq_codebooks(resid, m=8, k=4, iters=2, id_col="vec_id",
                         vec_col="__rv")
    old = pq_encode(
        resid, books, m=8, id_col="vec_id", vec_col="__rv"
    ).join(resid.select("vec_id", F.col("cell").alias("__ivf_cell")), "vec_id")
    new = pq_encode(
        resid.select("vec_id", F.col("cell").alias("__ivf_cell"), "__rv"),
        books, m=8, id_col="vec_id", vec_col="__rv",
        passthrough_cols=["__ivf_cell"],
    )
    assert old.schema.simpleString() == new.schema.simpleString()
    assert {tuple(r) for r in old.collect()} == {tuple(r) for r in new.collect()}


def test_assign_cells_residual_matches_join_form(spark, emb):
    """r12 optimization guard: the kernel-emitted residual
    (residual_col=) must be bit-identical to the former
    broadcast-join + zip_with consumer form — elementwise IEEE double
    subtraction either way."""
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb)
    residual = F.zip_with(
        F.col("embedding"), F.col("centroid"), lambda x, y: x.cast("double") - y
    )
    old = {
        (int(r["vec_id"]), int(r["cell"])): tuple(r["__rv"])
        for r in (
            _assign_cells(
                emb.select("vec_id", "embedding"), cents,
                vec_col="embedding", id_cols=["vec_id"],
            )
            .join(F.broadcast(cents), "cell")
            .select("vec_id", "cell", residual.alias("__rv"))
        ).collect()
    }
    new = {
        (int(r["vec_id"]), int(r["cell"])): tuple(r["__rv"])
        for r in _assign_cells(
            emb.select("vec_id", "embedding"), cents,
            vec_col="embedding", id_cols=["vec_id"], residual_col="__rv",
        ).collect()
    }
    assert old == new


def test_driver_local_training_agrees_with_distributed(monkeypatch, emb):
    """r12 driver-local Lloyd's fast path: the distributed fallback
    (forced via DRIVER_TRAIN_BOUND=0) must stay green, deterministic,
    and agree with the driver path — same surviving cells and
    centroids equal to ~1e-8 (the only arithmetic difference is
    fixed-order float64 means vs decimal-cast distributed sums; an
    exact-tie Voronoi flip would show as a cell-set mismatch)."""
    from kafka_streams_clojure_spark.operators.similarity import pq_codebooks

    drv_k = {
        int(r["cell"]): list(r["centroid"])
        for r in kmeans_centroids(emb, k=8, iters=2).collect()
    }
    drv_pq = {
        (int(r["sub"]), int(r["cell"])): list(r["centroid"])
        for r in pq_codebooks(emb, m=8, k=4, iters=2).collect()
    }
    monkeypatch.setattr(similarity, "DRIVER_TRAIN_BOUND", 0)
    dist_k = {
        int(r["cell"]): list(r["centroid"])
        for r in kmeans_centroids(emb, k=8, iters=2).collect()
    }
    dist_k2 = {
        int(r["cell"]): list(r["centroid"])
        for r in kmeans_centroids(emb, k=8, iters=2).collect()
    }
    dist_pq = {
        (int(r["sub"]), int(r["cell"])): list(r["centroid"])
        for r in pq_codebooks(emb, m=8, k=4, iters=2).collect()
    }
    assert dist_k == dist_k2  # distributed fallback stays deterministic
    assert set(drv_k) == set(dist_k)
    for c, v in drv_k.items():
        assert all(abs(a - b) < 1e-8 for a, b in zip(v, dist_k[c]))
    assert set(drv_pq) == set(dist_pq)
    for key, v in drv_pq.items():
        assert all(abs(a - b) < 1e-8 for a, b in zip(v, dist_pq[key]))
