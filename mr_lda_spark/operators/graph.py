"""Iterative graph algorithms as join-chained DataFrame plans — the
Pregel-shaped family (sibling of the hash-min connected components in
``operators/dedup.py``; no counterpart in the reference, which has no
graph surface).

PageRank here is INTEGER-EXACT: ranks live in micro-units (scale
10^6) and every step is integer arithmetic (floor division for the
per-edge contribution, integer damping), so two engines that agree on
BIGINT division agree on every bit of every iteration — the property
that makes a cross-engine oracle possible for an iterative float-ish
algorithm (the same trick as the kmeans/ADC integer-exact oracles;
see the project's r6/r8 notes).  With damping d = num/den:

    pr0(v)  = scale
    pr_k(v) = (scale·(den-num)) // den
            + (num · Σ_{u→v} (pr_{k-1}(u) // outdeg(u))) // den

Scale shape (100 TB): each iteration is one edges⋈ranks⋈degree join
(all shuffles on the node key, AQE-splittable on hot nodes) plus a
map-side-combined groupBy — the rank relation is node-sized, never
driver-sized; the iteration count is the only driver state.  Lineage
is cut per iteration with ``localCheckpoint`` like the connected-
components rounds, so deep iteration counts don't stack a
quadratically-replanned DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_lda_spark.operators.lifecycle import (
    cut_lineage,
    cut_lineage_round,
    release,
)

__all__ = ["pagerank", "oriented_edges", "triangles",
           "triangle_participation", "kcore", "link_prediction",
           "bfs_levels"]


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Degree-orient an undirected edge list (canonical distinct pairs
    ``a < b``) → (u, v, ku, kv): each edge directed from its lower
    (degree, id) endpoint, with the total-order key
    ``k = deg·2^32 + id`` carried on both ends (ids must fit 32 bits).

    This is THE scale move for triangle counting: out-degree under
    degree orientation is O(√|E|) for any graph, so the wedge join
    below generates Σ C(outdeg, 2) candidates instead of
    Σ C(deg, 2) — a hot node of degree d contributes ~d·√E wedges,
    not d², and the skew a social/product graph always has cannot
    produce a quadratic hot partition."""
    a_key = F.col("da") * F.lit(1 << 32) + F.col("a")
    b_key = F.col("db") * F.lit(1 << 32) + F.col("b")
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        edges.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    )
    fwd = a_key < b_key
    return keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, a_key).otherwise(b_key).alias("ku"),
        F.when(fwd, b_key).otherwise(a_key).alias("kv"),
    )


def _triangles_from_oriented(o: DataFrame) -> DataFrame:
    """The lazy triangle relation over an (already materialized or
    plain) oriented-edge relation — shared by :func:`triangles` and
    :func:`triangle_participation` so each can own the cache
    lifecycle that fits its consumption shape."""
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.kv") < F.col("y.kv"))).select(
        F.col("x.u").alias("u"),
        F.col("x.v").alias("p"),
        F.col("y.v").alias("q"),
    )
    closing = o.select(F.col("u").alias("p"), F.col("v").alias("q"))
    return wedges.join(closing, ["p", "q"]).select("u", "p", "q")


def triangles(edges: DataFrame, materialize: bool | str = True) -> DataFrame:
    """All triangles of an undirected graph, one row (u, v, w) each.
    NOTE: materialize=True (the default) runs Spark jobs EAGERLY at
    call time and returns a localCheckpoint scan — pass
    materialize=False for lazy composition / plan inspection
    (ADVICE r10).

    The compact-forward / degree-ordered algorithm as two equi-joins:
    wedges from the oriented list's shared tail (ordered by the
    orientation key so each triangle forms exactly once), closed by an
    equi-join back to the oriented edges.  No CartesianProduct, no
    per-node adjacency materialization; both joins shuffle on node
    keys and AQE can split residual skew.

    Cache lifecycle: materialize=True (default) persists the oriented
    list for the duration of the two joins, localCheckpoints the
    TRIANGLE LIST, and releases the |E|-sized cache — right when the
    caller will iterate the triangles themselves (storage = output
    size, which the caller was going to hold anyway).  An
    aggregate-only consumer should NOT pay that buffering — use
    :func:`triangle_participation`, which streams the join output
    into partial aggregates and checkpoints only the per-node counts.
    materialize=False returns the fully lazy plan with NO persist at
    all (plan inspection / guards; a plan that is never executed must
    not register CacheManager entries nothing can release);
    materialize="reliable" cuts the triangle list with persist+count
    instead (executor-churn tier, ``operators/lifecycle.py``)."""
    if not materialize:
        return _triangles_from_oriented(oriented_edges(edges))
    o = oriented_edges(edges).persist()
    # Deterministic single materialization before the three-consumer
    # triangle job — see triangle_participation for the rationale.
    o.count()
    tri = cut_lineage(_triangles_from_oriented(o), materialize)
    o.unpersist()
    return tri


def triangle_participation(edges: DataFrame) -> DataFrame:
    """(node, n_triangles) for every node in ≥ 1 triangle — each
    triangle credits its three corners (the local clustering /
    cohesion signal).  Owns its cache lifecycle: the oriented list is
    persisted across the two joins, the triangle rows stream straight
    into the partial aggregation (never buffered — |triangles| can
    exceed |E| on dense communities), and only the per-node counts
    are checkpointed before the cache is released."""
    o = oriented_edges(edges).persist()
    # Eager materialization (r15): the triangle job reads `o` from
    # THREE independent stage pipelines (both wedge sides + the
    # closing join's probe).  Concurrent stages racing to fill an
    # unpopulated cache each re-run the full oriented-edge lineage —
    # including the caller's edge construction (for the registered
    # row: a lineitem self-join + distinct) — with scheduling-
    # dependent multiplicity (the near_duplicates_minhash rule,
    # measured bimodal there).  One scalar count buys a deterministic
    # single materialization.
    o.count()
    tri = _triangles_from_oriented(o)
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("p").alias("node")))
        .unionByName(tri.select(F.col("q").alias("node")))
    )
    out = corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    ).localCheckpoint()
    o.unpersist()
    return out


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    checkpoint: bool = True,
    materialize: bool | str = True,
) -> DataFrame:
    """Integer-exact PageRank over directed ``edges`` (columns
    ``src``, ``dst``) → (node, pr) with micro-unit BIGINT ranks.
    materialize=True (the default) runs Spark jobs eagerly at call
    time and returns a checkpointed result.

    Dangling nodes (out-degree 0) keep only the teleport term — their
    mass is dropped, not redistributed, matching the unrolled SQL
    oracle; feed a symmetrized edge list if every node should emit
    (the registered query does).

    Cache lifecycle (VERDICT r10 "What's wrong" #1, same pattern as
    funnel_steps_windowed / triangles): materialize=True persists the
    two hoisted loop invariants for the duration of the loop, eagerly
    localCheckpoints the final per-node ranks (small — one row per
    node), then unpersists both invariants so nothing is left in the
    CacheManager after return.  materialize=False returns the fully
    lazy unrolled plan with NO persist or checkpoint at all (plan
    inspection / guards; a never-executed plan must not register
    cache entries nothing can release).  materialize="reliable"
    (executor-churn tier, ``operators/lifecycle.py``): per-round cuts
    and the final cut use persist instead of localCheckpoint, so a
    lost block recomputes through retained lineage; the per-round
    handles are released once the final ranks are counted, and the
    caller releases the result with ``.unpersist()``.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Loop-invariant: the (src, dst, deg) relation and the node set
    # are reused by every iteration (and the final left join) — hoist
    # the degree join out of the loop and persist both, or each
    # iteration re-executes the caller's whole edge lineage (measured
    # at registration: 11.0 s → 4-ish s for the 3-iteration
    # customer↔supplier query, see PERF_NOTES_r09).
    maybe_persist = (
        (lambda df: df.persist()) if materialize else (lambda df: df)
    )
    ed = maybe_persist(edges.join(deg, "src").select("src", "dst", "deg"))
    nodes = maybe_persist(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # try/finally: a failed count/loop-job/checkpoint must still
    # release the invariants, or the failure path reinstates the exact
    # r10 leak this lifecycle exists to prevent (self-review r11).
    handles: list[DataFrame] = []
    try:
        if materialize:
            ed.count()
            nodes.count()
        base = scale * (damping_den - damping_num) // damping_den
        ranks = nodes.withColumn("pr", F.lit(scale).cast("long"))
        for _ in range(int(iterations)):
            contrib = (
                ed.join(ranks, ed["src"] == ranks["node"])
                .select(
                    F.col("dst").alias("node"),
                    F.expr("pr div deg").alias("c"),
                )
            )
            sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = (
                nodes.join(sums, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({damping_num} * coalesce(s, 0L))"
                            f" div {damping_den}"
                        )
                    ).alias("pr"),
                )
            )
            if checkpoint and materialize:
                ranks = cut_lineage_round(ranks, materialize, handles)
        if materialize:
            # Eager: cut the loop lineage and detach from the
            # invariants BEFORE releasing them, so callers can't
            # re-trigger the freed caches and the session accumulates
            # nothing per invocation.  (Reliable tier: persist+count
            # — persist returns self, so the final ranks handle may
            # also sit in `handles`; the identity filter below keeps
            # it cached while the per-round intermediates release.)
            ranks = cut_lineage(ranks, materialize)
    finally:
        if materialize:
            ed.unpersist()
            nodes.unpersist()
            release([h for h in handles if h is not ranks])
    return ranks


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    materialize: bool | str = True,
) -> DataFrame:
    """k-core of an undirected graph (canonical edge list ``a < b``)
    → (node, core_deg): the maximal subgraph where every node keeps
    degree ≥ k, with each survivor's degree INSIDE that subgraph.

    Peeling: ``rounds`` is an UPPER BOUND on the pruning rounds, with
    an unchanged-edge-count early exit (materialized tiers only):
    each round recomputes degrees over the surviving symmetric edge
    relation and semi-joins out the nodes below k, and the loop stops
    as soon as a round removes no edge — every later round would be a
    no-op by induction.  The bounded round count is what makes a
    cross-engine SQL oracle possible — the oracle unrolls exactly the
    same prune sequence, and once the peel has converged every
    further round is a no-op in both engines, so any ``rounds`` ≥ the
    true peel depth yields the identical (and correct) fixpoint.
    Convergence within the pinned count is property-tested (rounds vs
    rounds+4 equality, ``tests/test_graph.py``), not assumed.
    ``materialize=False`` has no per-round count to test, so the lazy
    plan deliberately unrolls ALL ``rounds`` — plan inspection needs
    the full unroll; lazy and eager tiers therefore execute different
    round counts past the fixpoint while computing the same result.

    Scale shape (100 TB): each round is one node-keyed groupBy
    (map-side combined — degree counting) plus two left-semi joins on
    node keys; the survivor relation only shrinks, no round ever
    joins anything bigger than the input edge list, and there is no
    CartesianProduct anywhere (plan-guarded).  Lineage is cut per
    round with ``localCheckpoint`` exactly like the pagerank /
    connected-components loops so a deep peel doesn't stack a
    quadratically-replanned DAG.  materialize=False returns the fully
    lazy unrolled plan with no checkpoint (plan inspection);
    materialize="reliable" cuts with persist instead and releases the
    per-round handles once the final counts are materialized
    (executor-churn tier, ``operators/lifecycle.py``)."""
    sym = edges.select(
        F.col("a").alias("s"), F.col("b").alias("t")
    ).unionByName(
        edges.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    e = sym
    handles: list[DataFrame] = []
    prev_n: int | None = None
    for _ in range(int(rounds)):
        alive = (
            e.groupBy("s")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("s")
        )
        e = (
            e.join(alive, "s", "left_semi")
            .join(alive.withColumnRenamed("s", "t"), "t", "left_semi")
            .select("s", "t")
        )
        if materialize:
            # One job gates the round (the BFS one-job lesson, r14):
            # the lazy per-round cut materializes inside the count()
            # that also tests the fixpoint.  An unchanged edge count
            # means the prune removed nothing — degrees, alive set and
            # survivor relation are then identical next round, so
            # every remaining round is a no-op by induction.  Skipping
            # them changes no result: the pinned ``rounds`` is an
            # upper bound, and rounds-past-convergence equality is
            # property-tested (rounds vs rounds+4, test_graph.py).
            # The driver cost is one scalar per executed round; the
            # saving at any scale is (rounds - depth) full passes over
            # the surviving edge relation.
            e = cut_lineage_round(e, materialize, handles)
            n = e.count()
            if n == prev_n:
                break
            prev_n = n
    out = (
        e.groupBy("s")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .select(F.col("s").alias("node"), "core_deg")
    )
    out = cut_lineage(out, materialize)
    release(handles)
    return out


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int = 64,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected graph
    (canonical edge list ``a < b``) → (u, v, cn, ra_ppb) for every
    NON-edge pair sharing ≥ ``min_common`` neighbors: ``cn`` is the
    common-neighbor count and ``ra_ppb`` the resource-allocation
    index Σ_w 1/deg(w) in integer parts-per-billion
    (``scale // deg(w)`` summed — floor division, cross-engine
    exact; Adamic-Adar's 1/log would put libm in the oracle).

    Scale shape (100 TB): the wedge join explodes deg(w)² pairs per
    CENTER node w — the one quadratic hazard in any common-neighbor
    method — so centers above ``max_center_degree`` are excluded
    up front (the standard hub cut: a node connected to everything
    certifies nothing about any particular pair, exactly the
    shingle-df cap argument in ``dedup.jaccard_pairs``).  After the
    cap the wedge relation is ≤ cap × |E| rows, the pair aggregation
    is map-side combined on (u, v), and the existing-edge removal is
    one left-anti equi-join.  No CartesianProduct (plan-guarded)."""
    sym = edges.select(
        F.col("a").alias("w"), F.col("b").alias("n")
    ).unionByName(
        edges.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = sym.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.filter(F.col("d") <= max_center_degree)
    nbr = sym.join(centers, "w").select(
        "w", "n", F.expr(f"CAST({scale} AS BIGINT) div d").alias("ra_w")
    )
    x, y = nbr.alias("x"), nbr.alias("y")
    wedges = x.join(
        y, (F.col("x.w") == F.col("y.w")) & (F.col("x.n") < F.col("y.n"))
    ).select(
        F.col("x.n").alias("u"),
        F.col("y.n").alias("v"),
        F.col("x.ra_w").alias("ra_w"),
    )
    scored = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("ra_w").alias("ra_ppb"),
        )
        .filter(F.col("cn") >= min_common)
    )
    existing = edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
    return scored.join(existing, ["u", "v"], "left_anti")


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 8,
    materialize: bool | str = True,
) -> DataFrame:
    """Multi-source BFS over an undirected graph (canonical edge list
    ``a < b``; ``seeds`` a (node) relation) → (node, dist): the
    minimum hop count from any seed, exploring at most ``max_rounds``
    hops.  The remaining core graph primitive next to pagerank /
    triangles / components / k-core / link prediction.

    Frontier expansion with the visited set as the loop state: each
    round joins the CURRENT frontier (not the whole visited relation)
    to the edge list and anti-joins out already-visited nodes, so a
    round's work is frontier-adjacency-sized and the whole traversal
    touches each edge O(1) times — textbook Pregel BFS as DataFrame
    joins, lineage cut per round with ``localCheckpoint``.  The loop
    stops early when the frontier empties (the driver-side isEmpty is
    a frontier-sized check, same class as the pagerank loop counts);
    ``max_rounds`` is both the scale guard and what the SQL oracle
    pins — DuckDB's recursive CTE explores the same ≤ max_rounds hops
    (the depth bound is what keeps cyclic graphs from recursing
    forever), so the relations agree exactly whether or not the
    traversal has converged, and a property test pins convergence
    within the registered bound.  materialize=False: fully lazy, no
    checkpoint (plan inspection).  materialize="reliable": per-round
    cuts use persist instead of localCheckpoint (recomputable under
    executor churn); intermediates release once the returned relation
    is counted (``operators/lifecycle.py``)."""
    sym = edges.select(
        F.col("a").alias("s"), F.col("b").alias("t")
    ).unionByName(
        edges.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    # Loop-invariant hoist (the pagerank r09 lesson, applied here in
    # r14): every round's frontier join reads `sym`, so left lazy it
    # re-executes the CALLER's whole edge lineage (for the registered
    # co-purchase query: a lineitem self-join + distinct) once per
    # round — measured at sf0.1: 8 rounds re-ran the edge build 8×.
    # Persisted for the duration of the loop, released in `finally`
    # so a failed round cannot leak the cache.
    if materialize:
        sym = sym.persist()
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.lit(0).cast("int").alias("dist"),
    )
    handles: list[DataFrame] = []
    try:
        if materialize:
            dist = cut_lineage_round(dist, materialize, handles, eager=True)
        frontier = dist
        for r in range(1, int(max_rounds) + 1):
            cand = (
                frontier.join(sym, frontier["node"] == sym["s"])
                .select(F.col("t").alias("node"))
                .distinct()
            )
            new = cand.join(dist, "node", "left_anti").withColumn(
                "dist", F.lit(r).cast("int")
            )
            if materialize:
                # ONE job gates the round: the lazy cut materializes
                # inside the count() that also tests emptiness (the
                # previous eager-cut + isEmpty shape paid two driver
                # round-trips per round for the same information).
                new = cut_lineage_round(new, materialize, handles)
                if new.count() == 0:
                    break
            dist = dist.unionByName(new)
            if materialize:
                dist = cut_lineage_round(dist, materialize, handles)
            frontier = new
        if materialize == "reliable":
            # Materialize the returned relation, then release every
            # per-round intermediate (persist returns self, so `dist`
            # itself may sit in `handles` — keep it cached by identity).
            dist.count()
            release([h for h in handles if h is not dist])
    finally:
        # Safe to release even before the lazy per-round cuts have
        # materialized: every returned `dist` is a union of per-round
        # cut relations (sym is not in its lineage), and unpersist
        # only drops the cache, never recomputability.
        if materialize:
            sym.unpersist()
    return dist
