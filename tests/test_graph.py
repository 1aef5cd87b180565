"""Integer-exact PageRank: hand-computable fixtures plus a pure-Python
reference simulation, mirroring the operator's exact integer rules."""

from pyspark.sql import functions as F

from mr_lda_spark.operators import graph


def _simulate(edges, iterations=3, num=85, den=100, scale=1_000_000):
    """Reference PageRank with the operator's exact integer
    arithmetic: floor-div contributions, integer damping."""
    nodes = {n for e in edges for n in e}
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: scale for n in nodes}
    base = scale * (den - num) // den
    for _ in range(iterations):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += pr[s] // deg[s]
        pr = {n: base + (num * sums[n]) // den for n in nodes}
    return pr


def test_pagerank_two_node_cycle_conserves_mass(spark):
    # a <-> b: perfectly symmetric, every iteration returns exactly
    # scale for both (150000 + 85% of 1e6 floor-div'd cleanly).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["pr"] for r in graph.pagerank(edges, 3).collect()}
    assert got == {"a": 1_000_000, "b": 1_000_000}


def test_pagerank_star_matches_reference_sim(spark):
    # hub h connected to 3 leaves, symmetrized: the hub accumulates.
    e = [("h", x) for x in "abc"] + [(x, "h") for x in "abc"]
    edges = spark.createDataFrame(e, "src string, dst string")
    got = {r["node"]: r["pr"] for r in graph.pagerank(edges, 3).collect()}
    assert got == _simulate(e, 3)
    assert got["h"] > got["a"] == got["b"] == got["c"]


def test_pagerank_dangling_node_keeps_teleport_only(spark):
    # a -> b, b emits nothing: b's outbound mass is dropped (documented
    # semantics, mirrored by the SQL oracle), a keeps only teleport
    # after iteration 2 (nothing points at a).
    e = [("a", "b")]
    edges = spark.createDataFrame(e, "src string, dst string")
    got = {r["node"]: r["pr"] for r in graph.pagerank(edges, 2).collect()}
    assert got == _simulate(e, 2)
    assert got["a"] == 150_000


def test_pagerank_matches_sim_on_random_digraph(spark):
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    e = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(40)
        }
    )
    e = [(s, d) for s, d in e if s != d]
    edges = spark.createDataFrame(e, "src string, dst string")
    got = {r["node"]: r["pr"] for r in graph.pagerank(edges, 4).collect()}
    assert got == _simulate(e, 4)


def _tri_edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangles_k4(spark):
    """K4: C(4,3) = 4 triangles, every node in exactly 3."""
    e = [(a, b) for a in range(4) for b in range(4) if a < b]
    tri = graph.triangles(_tri_edges(spark, e)).collect()
    assert len(tri) == 4
    # every triangle's corners are distinct and each forms once
    assert len({tuple(sorted((r["u"], r["p"], r["q"]))) for r in tri}) == 4
    part = {
        r["node"]: r["n_triangles"]
        for r in graph.triangle_participation(_tri_edges(spark, e)).collect()
    }
    assert part == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_path_has_none(spark):
    e = [(0, 1), (1, 2), (2, 3)]
    assert graph.triangles(_tri_edges(spark, e)).count() == 0


def test_triangles_hub_plus_one(spark):
    """Star K1,5 has no triangles; closing one rim pair makes one."""
    star = [(0, i) for i in range(1, 6)]
    assert graph.triangles(_tri_edges(spark, star)).count() == 0
    closed = star + [(1, 2)]
    tri = graph.triangles(_tri_edges(spark, closed)).collect()
    assert len(tri) == 1
    assert tuple(sorted((tri[0]["u"], tri[0]["p"], tri[0]["q"]))) == (0, 1, 2)


def test_triangles_plan_has_no_cartesian(spark):
    # materialize=False: inspect the REAL lazy plan.  The default
    # materialize=True returns a localCheckpoint scan whose executed
    # plan hides the joins, making the assertions vacuous (ADVICE r10).
    e = [(a, b) for a in range(6) for b in range(6) if a < b]
    plan = (
        graph.triangles(_tri_edges(spark, e), materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_lazy_plan_shape_and_no_persist(spark):
    """materialize=False: the unrolled plan is inspectable (no
    Cartesian/NLJ) and registers NOTHING in the CacheManager."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src int, dst int"
    )
    lazy = graph.pagerank(edges, 2, materialize=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert cm.cachedData().size() == before


def test_pagerank_releases_loop_invariant_caches(spark):
    """VERDICT r10 'What's wrong' #1: pagerank must not leave its
    hoisted ed/nodes persists behind — the CacheManager entry count is
    unchanged after the call returns, and the result is still usable
    (checkpointed) afterwards."""
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2)],
        "src int, dst int",
    )
    ranks = graph.pagerank(edges, 3)
    assert cm.cachedData().size() == before
    got = {r["node"]: r["pr"] for r in ranks.collect()}
    assert set(got) == {0, 1, 2}
    assert all(v > 0 for v in got.values())


# ---------------------------------------------------------------- kcore


def _py_kcore(pairs, k):
    """Reference peel: remove < k-degree nodes until fixpoint."""
    edges = set(pairs)
    while True:
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {v for v, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in alive and b in alive}
        if nxt == edges:
            return {
                v: sum(1 for a, b in edges if v in (a, b)) for v in alive
            }
        edges = nxt


def test_kcore_k4_plus_pendant(spark):
    # K4 with a pendant: the 3-core is exactly the K4, pendant peeled.
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    got = {
        r["node"]: r["core_deg"]
        for r in graph.kcore(_tri_edges(spark, e), k=3, rounds=4).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade_needs_multiple_rounds(spark):
    # chain of pendants hanging off a triangle: each peel round only
    # exposes the next pendant, so the result is wrong unless the
    # peel really iterates.
    e = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    got = {
        r["node"]: r["core_deg"]
        for r in graph.kcore(_tri_edges(spark, e), k=2, rounds=6).collect()
    }
    assert got == _py_kcore(e, 2) == {1: 2, 2: 2, 3: 2}


def test_kcore_matches_reference_on_random_graph(spark):
    import random

    rng = random.Random(11)
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(18), 2)))
            for _ in range(60)
        }
    )
    got = {
        r["node"]: r["core_deg"]
        for r in graph.kcore(
            _tri_edges(spark, pairs), k=4, rounds=10
        ).collect()
    }
    assert got == _py_kcore(pairs, 4)


def test_kcore_registered_rounds_reach_fixpoint(spark):
    """The registered row pins rounds=10; the true fixpoint is
    whatever rounds+4 yields.  Equality here is what lets the
    unrolled SQL oracle claim to BE the k-core, not merely round 10
    of a peel (measured depth: 6 at sf0.01, 5 at sf0.1)."""
    from mr_lda_spark.queries_registry import (
        _KCORE_K,
        _KCORE_ROUNDS,
        graph_kcore_parts,
    )

    sf = "/root/testdata/sf0.001"
    a = graph_kcore_parts(spark, sf).toPandas()
    li = None  # rebuild edges once more with deeper peel
    from mr_lda_spark.session import read_table

    li = read_table(spark, sf, "lineitem").filter(F.col("l_quantity") >= 30)
    ed = (
        li.select("l_orderkey", F.col("l_partkey").alias("a"))
        .join(li.select("l_orderkey", F.col("l_partkey").alias("b")), "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    b = graph.kcore(ed, k=_KCORE_K, rounds=_KCORE_ROUNDS + 4).toPandas()
    key = ["node", "core_deg"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


def test_kcore_lazy_plan_no_cartesian_no_persist(spark):
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()
    e = [(a, b) for a in range(8) for b in range(8) if a < b]
    lazy = graph.kcore(_tri_edges(spark, e), k=3, rounds=3, materialize=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert cm.cachedData().size() == before


# ------------------------------------------------------ link prediction


def test_link_prediction_path_and_square(spark):
    # square 1-2-3-4-1: each diagonal shares exactly its two
    # opposite corners; all degrees are 2 so ra = 2 * (1e9 // 2).
    e = [(1, 2), (2, 3), (3, 4), (1, 4)]
    got = sorted(
        (r["u"], r["v"], r["cn"], r["ra_ppb"])
        for r in graph.link_prediction(
            _tri_edges(spark, e), min_common=2
        ).collect()
    )
    assert got == [(1, 3, 2, 1_000_000_000), (2, 4, 2, 1_000_000_000)]


def test_link_prediction_excludes_existing_edges_and_hubs(spark):
    # star hub 0: every leaf pair shares the hub — but with the hub
    # over the degree cap, NO wedge survives.
    e = [(0, i) for i in range(1, 6)]
    df = graph.link_prediction(
        _tri_edges(spark, e), min_common=1, max_center_degree=4
    )
    assert df.count() == 0
    # with the cap lifted the leaf pairs appear, hub pairs never do
    # (and existing edges stay excluded).
    rows = graph.link_prediction(
        _tri_edges(spark, e), min_common=1, max_center_degree=64
    ).collect()
    pairs = {(r["u"], r["v"]) for r in rows}
    assert pairs == {(i, j) for i in range(1, 6) for j in range(i + 1, 6)}
    assert all(r["ra_ppb"] == 1_000_000_000 // 5 for r in rows)


def test_link_prediction_plan_no_cartesian(spark):
    e = [(a, b) for a in range(8) for b in range(8) if a < b]
    plan = (
        graph.link_prediction(_tri_edges(spark, e))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------ bfs_levels


def _py_bfs(pairs, seeds, cap):
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for r in range(1, cap + 1):
        nxt = {
            t
            for v in frontier
            for t in adj.get(v, ())
            if t not in dist
        }
        if not nxt:
            break
        for t in nxt:
            dist[t] = r
        frontier = nxt
    return dist


def test_bfs_path_distances(spark):
    # path 1-2-3-4-5 from seed 1: dist = index.
    e = [(1, 2), (2, 3), (3, 4), (4, 5)]
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_levels(_tri_edges(spark, e), seeds, 8).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_source_takes_min(spark):
    # seeds at both ends of the path: middle node is 2 from either.
    e = [(1, 2), (2, 3), (3, 4), (4, 5)]
    seeds = spark.createDataFrame([(1,), (5,)], "node int")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_levels(_tri_edges(spark, e), seeds, 8).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_cap_truncates_and_disconnected_unreached(spark):
    e = [(1, 2), (2, 3), (3, 4), (10, 11)]
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_levels(_tri_edges(spark, e), seeds, 2).collect()
    }
    # node 4 is 3 hops away — beyond the cap; component {10,11} never.
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_matches_reference_on_random_graph(spark):
    import random

    rng = random.Random(23)
    pairs = sorted(
        {tuple(sorted(rng.sample(range(25), 2))) for _ in range(40)}
    )
    seeds = spark.createDataFrame([(0,), (7,)], "node int")
    got = {
        r["node"]: r["dist"]
        for r in graph.bfs_levels(
            _tri_edges(spark, pairs), seeds, 10
        ).collect()
    }
    assert got == _py_bfs(pairs, [0, 7], 10)


def test_bfs_registered_cap_reaches_fixpoint(spark):
    """cap vs cap+4 equality on the frozen sf0.001 graph — what lets
    the depth-bounded recursive oracle claim to BE the hop distance,
    not a truncation (measured eccentricity 3-4 at the graded SFs)."""
    from mr_lda_spark.queries_registry import (
        _BFS_MAX_ROUNDS,
        graph_bfs_levels_parts,
    )
    from mr_lda_spark.session import read_table

    sf = "/root/testdata/sf0.001"
    a = graph_bfs_levels_parts(spark, sf).toPandas()
    li = read_table(spark, sf, "lineitem").filter(F.col("l_quantity") >= 30)
    ed = (
        li.select("l_orderkey", F.col("l_partkey").alias("a"))
        .join(
            li.select("l_orderkey", F.col("l_partkey").alias("b")),
            "l_orderkey",
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sym = ed.select(F.col("a").alias("s")).unionByName(
        ed.select(F.col("b").alias("s"))
    )
    seeds = (
        sym.groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.desc("d"), F.asc("s"))
        .limit(3)
        .select(F.col("s").alias("node"))
    )
    b = graph.bfs_levels(ed, seeds, _BFS_MAX_ROUNDS + 4).toPandas()
    assert sorted(map(tuple, a.values.tolist())) == sorted(
        map(tuple, b.values.tolist())
    )


def test_bfs_lazy_plan_no_cartesian_no_persist(spark):
    cm = spark._jsparkSession.sharedState().cacheManager()
    before = cm.cachedData().size()
    e = [(a, b) for a in range(6) for b in range(6) if a < b]
    seeds = spark.createDataFrame([(0,)], "node int")
    lazy = graph.bfs_levels(
        _tri_edges(spark, e), seeds, 3, materialize=False
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert cm.cachedData().size() == before
