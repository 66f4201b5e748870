"""Integer-exact PageRank invariants on synthetic graphs (the oracle
key q_graph_pagerank checks engine parity; these check the MATH)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators.graph import pagerank

UNIT = 10**12


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {r.id: r.rank for r in pagerank(df, unit=UNIT, **kw).collect()}


def test_star_hub_dominates_and_leaves_tie(spark):
    """Star K1,4: the hub must outrank every leaf; all leaves equal
    (exact integer equality — determinism is the whole point)."""
    r = _ranks(spark, [(0, i) for i in range(1, 5)])
    leaves = [r[i] for i in range(1, 5)]
    assert len(set(leaves)) == 1
    assert r[0] > leaves[0]


def test_path_symmetry_and_center(spark):
    """Path 1-2-3: ends are symmetric (bit-identical ranks), center
    strictly higher."""
    r = _ranks(spark, [(1, 2), (2, 3)])
    assert r[1] == r[3]
    assert r[2] > r[1]


def test_mass_conservation_bound(spark):
    """Total rank mass stays within the integer-DIV rounding-loss
    bound: each vertex loses < (iters+1) units of truncation per
    round, so unit - total <= (iters+1) * n * 2 — at unit=1e12 the
    relative leak is ~1e-10."""
    edges = [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)]
    iters = 5
    r = _ranks(spark, edges, iters=iters)
    total = sum(r.values())
    n = len(r)
    assert total <= UNIT
    assert UNIT - total <= (iters + 1) * n * 2, (UNIT - total, n)


def test_matches_float_power_iteration(spark):
    """The integer-exact ranks agree with a plain float power iteration
    (same damping, same iteration count) to ~1e-9 relative — i.e. the
    integer trick changes the arithmetic, not the algorithm."""
    import numpy as np

    rng = [(i, (i * 7 + 3) % 23) for i in range(23)] + [(i, (i + 1) % 23) for i in range(23)]
    edges = [(a, b) for a, b in rng if a != b]
    iters = 5
    got = _ranks(spark, edges, iters=iters)

    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    verts = sorted({a for a, _ in und})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    for a, _ in und:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, 0.15 / n)
        for a, b in und:
            nxt[idx[b]] += 0.85 * r[idx[a]] / deg[idx[a]]
        r = nxt
    for v in verts:
        assert abs(got[v] / UNIT - r[idx[v]]) < 1e-8, (v, got[v] / UNIT, r[idx[v]])


def test_regular_graph_uniform(spark):
    """On a vertex-transitive graph (cycle), every vertex has the same
    rank exactly."""
    r = _ranks(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert len(set(r.values())) == 1


def test_bfs_layers_path_graph(spark):
    """BFS on path 1-2-3-4-5 from 1 with max_hops=2 reaches exactly
    {1:0, 2:1, 3:2}."""
    from kafka_streams_clojure_spark.operators.graph import bfs_layers

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a bigint, id_b bigint"
    )
    got = {r.id: r.dist for r in bfs_layers(df, source=1, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_min_over_multiple_paths(spark):
    """Diamond 1-2-4, 1-3-4 plus long tail 2-5-6-4: dist(4) must be 2
    (shortest), not a longer path's length."""
    from kafka_streams_clojure_spark.operators.graph import bfs_layers

    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (2, 5), (5, 6), (6, 4)],
        "id_a bigint, id_b bigint",
    )
    got = {r.id: r.dist for r in bfs_layers(df, source=1, max_hops=4).collect()}
    assert got[4] == 2 and got[6] == 3


def test_null_edge_endpoints_dropped(spark):
    """Edges with a null endpoint are dropped up front (they can't
    equi-join, so they'd otherwise get round-0 mass then vanish):
    results equal the null-free graph's, and no null vertex appears."""
    from kafka_streams_clojure_spark.operators.graph import bfs_layers

    clean = [(1, 2), (2, 3)]
    dirty = clean + [(None, 2), (3, None)]
    c = spark.createDataFrame(clean, "id_a bigint, id_b bigint")
    d = spark.createDataFrame(dirty, "id_a bigint, id_b bigint")
    assert _ranks(spark, clean) == {
        r.id: r.rank
        for r in __import__(
            "kafka_streams_clojure_spark.operators.graph", fromlist=["pagerank"]
        ).pagerank(d, unit=UNIT).collect()
    }
    got_c = {r.id: r.dist for r in bfs_layers(c, source=1, max_hops=3).collect()}
    got_d = {r.id: r.dist for r in bfs_layers(d, source=1, max_hops=3).collect()}
    assert got_c == got_d and None not in got_d


def _ppr(spark, edges, seed, **kw):
    from kafka_streams_clojure_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    return {
        r.id: r.rank
        for r in personalized_pagerank(df, seed=seed, unit=UNIT, **kw).collect()
    }


def test_ppr_seed_dominates_and_mass_bounded(spark):
    """Path graph 1-2-3-4-5, seed at an end: the seed holds the max
    rank, every vertex is reached with positive mass after enough
    rounds, and total mass never exceeds the unit (DIV only leaks
    mass). NOTE: per-hop ordering is deliberately NOT asserted — a
    path is bipartite, so finite power iterations oscillate by
    distance parity (observed: dist-3 < dist-4)."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    r = _ppr(spark, edges, seed=1, iters=6)
    assert r[1] == max(r.values())
    assert set(r) == {1, 2, 3, 4, 5} and all(v > 0 for v in r.values())
    assert sum(r.values()) <= UNIT


def test_ppr_sparse_locality(spark):
    """Two disconnected components: the seed's component gets all the
    mass; the other component is ABSENT from the output (sparse zero,
    not an explicit 0 row) — the locality property that keeps PPR
    cheap on huge graphs."""
    edges = [(1, 2), (2, 3), (10, 11)]
    r = _ppr(spark, edges, seed=1, iters=4)
    assert set(r) == {1, 2, 3}
    assert all(v > 0 for v in r.values())


def test_ppr_symmetry(spark):
    """Symmetric path 1-2-3 seeded at the center: the two ends tie
    exactly (integer equality — determinism check)."""
    r = _ppr(spark, [(1, 2), (2, 3)], seed=2, iters=5)
    assert r[1] == r[3]
    assert r[2] > r[1]


def test_kcore_peels_pendants_keeps_clique(spark):
    """Textbook k-core shape: a 5-clique with pendant chains hanging
    off it. At k=3 the pendants peel away ROUND BY ROUND (the cascade
    — a chain node only drops once its outer neighbor is gone) and the
    clique survives with within-core degree 4; at k=5 everything
    peels. Also pins the fixed-round contract: every survivor of a
    CONVERGED run has degree >= k."""
    from kafka_streams_clojure_spark.operators.graph import kcore

    clique = [(i, j) for i in range(5) for j in range(5) if i < j]
    # two pendant chains: 5-10-11-12 and 2-20
    chains = [(0, 10), (10, 11), (11, 12), (2, 20)]
    edges = spark.createDataFrame(clique + chains, "id_a bigint, id_b bigint")

    out = {r.node: r.degree for r in kcore(edges, k=3, rounds=4).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(d == 4 for d in out.values()), out
    assert all(d >= 3 for d in out.values())

    # the cascade, visible at k=2: chain interiors have degree 2, so
    # only the ENDPOINTS peel in round 1 (12, 20); each further round
    # peels one more chain node as its outer neighbor disappears
    partial = {r.node for r in kcore(edges, k=2, rounds=1).collect()}
    assert {10, 11} <= partial and 12 not in partial and 20 not in partial
    full2 = {r.node for r in kcore(edges, k=2, rounds=4).collect()}
    assert full2 == {0, 1, 2, 3, 4}

    assert kcore(edges, k=5, rounds=4).count() == 0
