"""Connected components over near-duplicate pair graphs.

Pairwise near-dup detection (Jaccard / MinHash / SimHash / cosine)
yields EDGES; an actual dedup decision needs the transitive closure —
if A≈B and B≈C, all three are one cluster with one canonical survivor.
This is the step that turns "pairs" into "keep/drop lists" in a
training-data pipeline.

Spark-first shape: iterative min-label propagation (the GraphX/Pregel
connected-components algorithm expressed in DataFrame ops). Each
iteration is one equi-join (labels⋈edges) + one groupBy-min + one
pointer-jumping self-join — shuffle ∝ |E| + |V|, label state ∝ |V|;
rounds ∝ LOG of the graph diameter (near-dup clusters are
near-cliques, so 2-4 rounds in practice, bounded by ``max_iter``).
The per-round convergence check is a deliberate driver-side action —
iterative fixpoints are the one place a driver loop is the right tool
(same as any Pregel superstep loop); everything inside a round is a
lazy Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators._cache import persist_if_uncached, persist_scoped


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Label every vertex of the undirected pair graph with the MIN
    vertex id of its connected component (deterministic fixpoint).

    Returns ``(id, component)``. Converges in O(log diameter) rounds
    (neighbor-min propagation + pointer jumping); stops
    early when a round changes nothing. Raises ``RuntimeError`` if the
    fixpoint is not reached within ``max_iter`` rounds — unconverged
    labels would silently split one real cluster into several, so a
    too-small budget must fail loudly, never return wrong keep/drop
    lists.

    r13 (guide §2.4, settled by the x10/x30 graph rehearsal —
    SCALE.md): the ``distinct`` leaves the edge state hash(a, b)-
    partitioned, so every propagation round re-exchanged the |E|-row
    side to hash(b). An EXPLICIT hash(b) repartition before the persist
    (explicit count — an un-numbered repartition is what the r12 local
    A/B tried, and AQE coalesced it to 1 partition) lets all
    ``max_iter`` round joins reuse one exchange; only the |V|-row label
    side moves per round. Measured at x10 (18M-line co-purchase graph):
    total shuffle 1.79 → 0.76 GB. ``num_partitions`` defaults to
    ``defaultParallelism``; pass the cluster-appropriate count at real
    scale. Labels are partitioning-independent (min-fixpoint), so this
    cannot change results.
    """
    if num_partitions is None:
        num_partitions = edges.sparkSession.sparkContext.defaultParallelism
    und, we_cached = persist_scoped(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition(num_partitions, "b")
    )
    # Each round ends in localCheckpoint(eager): (1) TRUNCATES LINEAGE —
    # without it the analyzed plan nests one join+union+agg deeper per
    # round and the driver dies building plan strings long before the
    # data is big (observed at sf0.1: OOM in explainString on the
    # convergence count) — the same reason GraphX checkpoints Pregel
    # state; (2) materializes the ~|V|-row label state so the next
    # round reads blocks, not a replay. Local (block-manager) rather
    # than reliable checkpointing is the right local-mode tool; a
    # multi-node deployment losing executors would set a checkpoint
    # dir and swap .localCheckpoint() for .checkpoint().
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        converged = False
        for _ in range(max_iter):
            nbr = und.join(
                labels.withColumnRenamed("id", "b"), "b"
            ).select(F.col("a").alias("id"), "component")
            # neighbor-min propagation …
            m = (
                labels.select("id", "component")
                .union(nbr)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
            # … then pointer-jumping (path compression): component ←
            # m[component]. Labels are always vertex ids present in m
            # (each is the min id seen so far, and m[w] ≤ w), so the
            # self-join is total and the reach of a label DOUBLES per
            # round — convergence in O(log diameter) rounds instead of
            # O(diameter), which is what makes max_iter=20 safe for
            # web-scale near-dup chains (2^20-hop paths).
            new_labels = (
                m.join(
                    m.select(
                        F.col("id").alias("component"), F.col("component").alias("c2")
                    ),
                    "component",
                )
                .select("id", F.col("c2").alias("component"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds; "
                "raise max_iter (rounds needed ~ log2(component diameter))"
            )
    finally:
        if we_cached:
            und.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup pairs → ``(doc_id, canonical_id, is_canonical)``: one
    row per clustered document; the cluster's min id survives. Docs in
    no pair are untouched (join this result back with a left-anti /
    left join to build the final keep-list)."""
    comp = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    unit: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """INTEGER-EXACT damped PageRank over the symmetrized pair graph
    (fixed ``iters`` power iterations, no convergence test).

    Ranks are kept as BIGINT micro-units (``unit`` total mass ≈ 1.0)
    and every update uses only integer multiply + integer division
    (``DIV``), so the result is bit-identical on any engine — the same
    determinism trick as the repo's decimal-cast sums, which makes a
    fixed-iteration PageRank fully DuckDB-oracle-able (float PageRank
    would diverge: per-vertex contribution sums are partial-agg-order
    dependent). Update rule per vertex v::

        r'[v] = (dd-dn)*unit DIV (dd*N)  +  Σ_{u→v} (dn*r[u]) DIV (dd*deg[u])

    with dn/dd the damping fraction (85/100). Rounding loss from DIV
    leaks a few units of mass per vertex per round — irrelevant for
    ranking at unit=1e12 (relative error ~1e-10) and identical across
    engines, which is the property that matters here.

    Input edges are normalized exactly like :func:`connected_components`:
    both orientations united + distinct, so the walk is undirected and
    every vertex has degree ≥ 1 (no dangling-mass term needed — the
    classic dangling-node redistribution is a directed-graph concern).

    Scale shape: per round, one equi-join (ranks ⋈ out-edges) + one
    groupBy-sum — shuffle ∝ |E|, state ∝ |V|; ``localCheckpoint`` per
    round truncates lineage exactly as in :func:`connected_components`.
    The vertex count is one scalar driver-side count (metadata-scale,
    same as the Pregel convergence check). Returns ``(id, rank)`` with
    rank in micro-units of ``unit``.
    """
    # null endpoints: a null-keyed edge can't join (null ≠ null in
    # equi-joins), so it would receive initial mass in round 0 and then
    # silently vanish — drop such edges up front (the CLAUDE.md
    # null-key rule; same contract as the as-of right side)
    und, we_cached = persist_scoped(
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(
            edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull()).select(
                F.col(dst).alias("a"), F.col(src).alias("b")
            )
        )
        .distinct()
    )
    try:
        deg = und.groupBy("a").agg(F.count("*").alias("d"))
        # degree-annotated edge list is read once PER ROUND — checkpoint
        # it eagerly or every iteration re-runs the degree aggregate and
        # the und⋈deg join (measured 10.1s → ~3s for 5 rounds at sf0.1)
        ed = und.join(deg, "a").localCheckpoint(eager=True)
        verts = und.select(F.col("a").alias("id")).distinct()
        n = verts.count()
        if n == 0:
            return verts.withColumn("rank", F.lit(0).cast("long"))
        base = ((damp_den - damp_num) * unit) // (damp_den * n)
        ranks = verts.withColumn(
            "r", F.lit(unit // n).cast("long")
        ).localCheckpoint(eager=True)
        for _ in range(iters):
            contrib = ed.join(ranks.withColumnRenamed("id", "a"), "a").select(
                F.col("b").alias("id"),
                F.expr(f"({damp_num} * r) DIV ({damp_den} * d)").alias("share"),
            )
            ranks = (
                contrib.groupBy("id")
                .agg((F.lit(base) + F.sum("share")).cast("long").alias("r"))
                .localCheckpoint(eager=True)
            )
        return ranks.select("id", F.col("r").alias("rank"))
    finally:
        if we_cached:
            und.unpersist()


def bfs_layers(
    edges: DataFrame,
    source,
    src: str = "id_a",
    dst: str = "id_b",
    max_hops: int = 4,
) -> DataFrame:
    """Breadth-first hop distances from ``source`` over the symmetrized
    pair graph, bounded at ``max_hops`` — the k-hop neighborhood /
    blast-radius query (which documents are within k near-dup hops of
    a flagged one; which entities within k relations of a risk node).

    Same exactness trick as :func:`pagerank`: distances are INTEGERS
    and each round is ``dist ∪ (neighbors+1) → groupBy-min``, so a
    fixed-round expansion is bit-identical on any engine and the
    oracle unrolls rounds as CTE levels. Unreached vertices are simply
    absent (no sentinel ∞ row to disagree about). Shuffle per round ∝
    edges incident to the reached set; ``localCheckpoint`` truncates
    lineage per round as in :func:`connected_components`.

    Returns ``(id, dist)`` for every vertex within ``max_hops``.
    """
    clean = edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
    und, we_cached = persist_scoped(
        clean.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(clean.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    try:
        dist = (
            und.select(F.col("a").alias("id"))
            .distinct()
            .filter(F.col("id") == source)
            .withColumn("dist", F.lit(0))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_hops):
            nbr = und.join(dist.withColumnRenamed("id", "a"), "a").select(
                F.col("b").alias("id"), (F.col("dist") + 1).alias("dist")
            )
            dist = (
                dist.unionByName(nbr)
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
        return dist.select("id", F.col("dist").cast("int").alias("dist"))
    finally:
        if we_cached:
            und.unpersist()


def triangle_stats(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Per-vertex triangle counts + local clustering coefficient over
    an undirected pair graph (edges in any orientation/multiplicity).

    Triangles close the dedup feedback loop: a near-dup pair inside a
    triangle is corroborated by a third document, while a bridge edge
    (clustering 0) is the classic false-positive shape — so the
    coefficient is a per-vertex confidence feature for keep/drop
    decisions on top of :func:`dedup_clusters`.

    Scale shape: the standard distributed ordered-triple algorithm —
    every triangle a<b<c is found exactly once by joining edge (a,b)
    to (b,c) and closing with (a,c); two equi-joins on vertex ids,
    shuffle ∝ |E| + path counts, never vertices². Degrees are one
    union+groupBy. Returns (doc_id, degree, n_triangles, clustering)
    with clustering NULL for degree-1 vertices.

    Input is normalized like :func:`connected_components`' is: edges
    are least/greatest-ordered, dedup'd, and self-loops dropped, so a
    raw pair list containing (1,2) AND (2,1) (or duplicates) counts
    as ONE edge instead of doubling degrees and triangle counts.
    """
    e = persist_if_uncached(
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("id_a"),
            F.greatest(F.col(src), F.col(dst)).alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.id_b") == F.col("e2.id_a"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .select(
            F.col("e1.id_a").alias("a"),
            F.col("e1.id_b").alias("b"),
            F.col("e2.id_b").alias("c"),
        )
    )
    per_vertex = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("id_a").alias("doc_id"))
        .unionAll(e.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
    )
    n_tri = F.coalesce("n_triangles", F.lit(0)).cast("bigint")
    return deg.join(per_vertex, "doc_id", "left").select(
        "doc_id",
        "degree",
        n_tri.alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            (2.0 * n_tri.cast("double"))
            / (F.col("degree").cast("double") * (F.col("degree") - 1).cast("double")),
        ).alias("clustering"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seed,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 4,
    unit: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """INTEGER-EXACT PERSONALIZED PageRank: restart mass concentrates
    at ``seed`` instead of spreading uniformly, so the stationary-ish
    vector after ``iters`` rounds ranks vertices by proximity to the
    seed — the 'related items' / local-relevance query (recommenders,
    fraud blast radius, near-dup neighborhoods) as opposed to
    :func:`pagerank`'s global importance.

    Same determinism contract as :func:`pagerank` (BIGINT micro-units,
    DIV-only updates, fixed rounds → unrolled-CTE oracle-able), plus
    the PPR-specific scale property: the rank vector is SPARSE —
    absent vertex = 0 mass — so round k's join touches only edges
    incident to vertices within k hops of the seed. A 100 TB graph
    with a local seed never materializes a global vector; shuffle per
    round ∝ the reached frontier's edges.

    Update per vertex v::

        r'[v] = (v == seed ? (dd-dn)*unit DIV dd : 0)
                + Σ_{u→v} (dn*r[u]) DIV (dd*deg[u])
    """
    spark = edges.sparkSession
    und, we_cached = persist_scoped(
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(
            edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull()).select(
                F.col(dst).alias("a"), F.col(src).alias("b")
            )
        )
        .distinct()
    )
    try:
        deg = und.groupBy("a").agg(F.count("*").alias("d"))
        ed = und.join(deg, "a").localCheckpoint(eager=True)
        restart = ((damp_den - damp_num) * unit) // damp_den
        seed_restart = spark.createDataFrame(
            [(seed, restart)], "id long, share long"
        )
        ranks = spark.createDataFrame([(seed, unit)], "id long, r long")
        for _ in range(iters):
            contrib = ed.join(ranks.withColumnRenamed("id", "a"), "a").select(
                F.col("b").alias("id"),
                F.expr(f"({damp_num} * r) DIV ({damp_den} * d)").alias("share"),
            )
            ranks = (
                contrib.union(seed_restart)
                .groupBy("id")
                .agg(F.sum("share").cast("long").alias("r"))
                .localCheckpoint(eager=True)
            )
        return ranks.select("id", F.col("r").alias("rank"))
    finally:
        if we_cached:
            und.unpersist()


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """``rounds`` iterations of k-core PEELING over the undirected
    pair graph: each round drops every vertex whose CURRENT degree is
    below ``k`` (removals cascade — a vertex can fall below k only
    because its neighbors were peeled). With enough rounds this is the
    exact k-core decomposition (Seidman 1983); with a FIXED budget it
    is "rounds levels of peeling", deterministic either way — which is
    what makes it DuckDB-oracle-able by unrolling the rounds as CTE
    levels (the integer-PageRank trick: operators/graph.pagerank).

    Returns ``(node, degree)`` — survivors with their within-core
    degree after the last round.

    Scale shape: per round one degree aggregate (map-side combined,
    shuffle ∝ surviving vertices) and two semi-joins keyed like the
    edge list; edge state shrinks monotonically, and
    ``localCheckpoint`` truncates the per-round lineage exactly as in
    :func:`connected_components`.
    """
    # No persist here (unlike the iterative siblings): the undirected
    # projection is scanned exactly once before the first
    # localCheckpoint truncates lineage, so a cache would only leak.
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    for _ in range(rounds):
        keep = (
            cur.groupBy("a")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") >= k)
            .select("a")
        )
        cur = (
            cur.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    out = cur.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return out.select(F.col("a").alias("node"), "degree")
