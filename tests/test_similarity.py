"""Similarity-search operators: exact vs approximate paths."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import similarity
from mr_lda_spark.session import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = read_table(spark, SF, "embeddings")
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    return {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }


def test_ivf_full_probe_equals_exact(spark, emb, exact_topk):
    """n_probe == n_centroids probes every cell → identical to exact."""
    q = emb.filter(F.col("vec_id") < 10)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ivf_topk(
            emb, q, k=5, n_centroids=8, n_probe=8
        ).collect()
    }
    assert got == exact_topk


def test_ivf_recall_monotone_in_probes(spark, emb, exact_topk):
    """More probed cells ⇒ recall must not drop (and reach 1.0 at full
    probe — covered by the exact-equality test above)."""
    q = emb.filter(F.col("vec_id") < 10)
    recalls = []
    for probe in (2, 4, 6):
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in similarity.ivf_topk(
                emb, q, k=5, n_centroids=8, n_probe=probe
            ).collect()
        }
        hits = sum(1 for key, nid in exact_topk.items() if got.get(key) == nid)
        recalls.append(hits / len(exact_topk))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] > 0.3, recalls


def test_lsh_topk_results_are_valid_neighbors(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    rows = similarity.lsh_topk(emb, q, k=5, n_planes=4).collect()
    assert rows
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 <= r["cos_sim"] <= 1.0


def test_multi_sink_single_lineage(spark, emb, tmp_path):
    from mr_lda_spark.sources.corpus import write_multi

    out_a = str(tmp_path / "buckets")
    out_b = str(tmp_path / "ids")
    buckets = similarity.hyperplane_buckets(emb, n_planes=4)
    write_multi(
        buckets,
        {
            out_a: lambda df: df.groupBy("bucket").count(),
            out_b: lambda df: df.select("vec_id", "bucket"),
        },
    )
    a = spark.read.parquet(out_a)
    b = spark.read.parquet(out_b)
    assert a.agg(F.sum("count")).collect()[0][0] == b.count() == emb.count()


@pytest.mark.slow
def test_embedding_near_dupes_lsh_recall_vs_exact(spark):
    """On planted near-duplicates (the regime the defaults are tuned
    for: cosine ≥ 0.9) the LSH path recovers nearly all exact pairs and
    never invents one."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    # 40 noisy copies of the first 40 vectors: cos ≈ 0.995.
    for j in range(40):
        noisy = base[j] + 0.05 * rng.standard_normal(64)
        rows.append((100 + j, [float(x) for x in noisy]))
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>"
    )
    exact = {
        (r["a"], r["b"])
        for r in similarity.embedding_near_dupes(
            df, threshold=0.9, n_planes=0
        ).collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in similarity.embedding_near_dupes(df, threshold=0.9).collect()
    }
    assert len(exact) >= 40, len(exact)
    assert lsh <= exact, "LSH path produced a pair the exact path lacks"
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_embedding_near_dupes_bucket_cap_drops_hot_bucket(spark, emb):
    """max_bucket_size=0 empties every bucket — the cap is actually
    wired into the default path."""
    got = similarity.embedding_near_dupes(
        emb, threshold=0.3, max_bucket_size=0
    ).count()
    assert got == 0


def test_ivf_kmeans_full_probe_equals_exact(spark, emb, exact_topk):
    """Data-adapted centroids change the cells, not the answer: probing
    every cell still reproduces the exact top-k."""
    q = emb.filter(F.col("vec_id") < 10)
    cents = similarity.kmeans_centroids(emb, n_centroids=8)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ivf_topk(
            emb, q, k=5, n_centroids=8, n_probe=8, centroids=cents
        ).collect()
    }
    assert got == exact_topk


def test_kmeans_centroids_deterministic_and_unit(spark, emb):
    import numpy as np

    c1 = similarity.kmeans_centroids(emb, n_centroids=8)
    c2 = similarity.kmeans_centroids(emb, n_centroids=8)
    assert np.array_equal(c1, c2), "centroids must be reproducible"
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    assert c1.shape == (8, 64)


def test_pq_encode_shape_and_determinism(spark, emb):
    books = similarity.pq_train(emb, n_subspaces=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    a = {r["vec_id"]: list(r["codes"]) for r in similarity.pq_encode(emb, books).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in similarity.pq_encode(emb, books).collect()}
    assert a == b
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in a.values())


def _pq_recall(emb, q, exact_topk, n_subspaces, n_codes):
    exact_sets = {}
    for (qid, _rank), nid in exact_topk.items():
        exact_sets.setdefault(qid, set()).add(nid)
    books = similarity.pq_train(emb, n_subspaces=n_subspaces, n_codes=n_codes)
    got = {}
    for r in similarity.pq_topk(
        emb, q, k=5, n_subspaces=n_subspaces, n_codes=n_codes, books=books
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qid, set()) & s) for qid, s in exact_sets.items())
    return hits / sum(len(s) for s in exact_sets.values())


def test_pq_topk_recall_vs_exact(spark, emb, exact_topk):
    """Set recall@5 of compressed-domain ADC scoring vs exact cosine.
    The synthetic embeddings are near-isotropic (hard mode for PQ —
    no cluster structure to exploit), so the bar is "well above the
    5/400 chance level", not IVF-grade recall; everything is seeded,
    so the measured 0.44 is exactly reproducible."""
    q = emb.filter(F.col("vec_id") < 10)
    recall = _pq_recall(emb, q, exact_topk, n_subspaces=16, n_codes=32)
    assert recall >= 0.4, recall


def test_frozen_pq_books_deterministic_and_fullprobe_runs(spark, emb):
    """Frozen md5-derived codebooks: reproducible, bounded to [-1, 1),
    6-dp grid; the fullprobe query path returns a complete, unique
    (query, rank) ladder whose neighbors never echo the query."""
    import numpy as np

    b1 = similarity.frozen_pq_books()
    b2 = similarity.frozen_pq_books()
    assert np.array_equal(b1, b2) and b1.shape == (8, 16, 8)
    assert (b1 >= -1).all() and (b1 < 1).all()
    assert np.array_equal(b1, np.round(b1, 6))
    # a different salt gives a different matrix (no accidental collapse)
    assert not np.array_equal(b1, similarity.frozen_pq_books(salt="other"))
    q = emb.filter(F.col("vec_id") < 3)
    rows = similarity.pq_fullprobe_topk(emb, q, k=3).collect()
    assert len(rows) == 9
    assert {(r["query_id"], r["rank"]) for r in rows} == {
        (q, rk) for q in range(3) for rk in (1, 2, 3)
    }
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)


def test_ivfpq_fullprobe_equals_pq_fullprobe(spark, emb):
    """Full-probe IVF-PQ over the frozen codebooks must EQUAL the plain
    frozen-PQ full scan — probing every cell recovers the whole corpus
    and the ADC scores are identical (no residual encoding)."""
    q = emb.filter(F.col("vec_id") < 3)
    a = similarity.pq_fullprobe_topk(emb, q, k=3).collect()
    b = similarity.ivfpq_fullprobe_topk(emb, q, k=3, n_centroids=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lsh_frozen_topk_bucket_restricted_exact_rerank(spark, emb):
    """Frozen-plane LSH: returned neighbors share the query's bucket,
    and their cos_sim equals the exact pairwise cosine (the re-rank is
    exact within the candidate set)."""
    q = emb.filter(F.col("vec_id") < 3)
    planes = similarity.frozen_hyperplanes(6, 64)
    rows = similarity.lsh_frozen_topk(emb, q, k=3, n_planes=6).collect()
    assert rows
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in similarity.hyperplane_buckets(emb, planes=planes).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    import numpy as np

    for r in rows:
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]]
        a = np.asarray(vecs[r["query_id"]], dtype=np.float64)
        b = np.asarray(vecs[r["neighbor_id"]], dtype=np.float64)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(cos, abs=1e-4)


def test_pq_finer_quantization_helps(spark, emb, exact_topk):
    """A larger codebook must not hurt recall (finer quantization);
    seeded k-means makes both sides deterministic."""
    q = emb.filter(F.col("vec_id") < 10)
    assert _pq_recall(emb, q, exact_topk, 8, 64) >= _pq_recall(
        emb, q, exact_topk, 8, 16
    )


class _NoCountDF:
    """Proxy that forwards everything except .count() — pins the
    VERDICT r2 item: codebook training must not spend a full corpus
    scan sizing its sample (one-pass hash sampling only)."""

    def __init__(self, df):
        object.__setattr__(self, "_df", df)

    def __getattr__(self, name):
        if name == "count":
            raise AssertionError("codebook sampler called DataFrame.count()")
        return getattr(object.__getattribute__(self, "_df"), name)


def test_codebook_training_never_counts_corpus(spark, emb):
    from mr_lda_spark.operators import similarity

    cents = similarity.kmeans_centroids(_NoCountDF(emb), n_centroids=4)
    assert cents.shape[0] == 4
    books = similarity.pq_train(_NoCountDF(emb), n_subspaces=8, n_codes=8)
    assert books.shape[:2] == (8, 8)


def test_semdedup_finds_planted_within_cluster_dupes(spark):
    """Planted near-copies sharing a label are found; a cross-cluster
    near-copy is invisible by design (SemDeDup's recall trade)."""
    import numpy as np

    rng = np.random.default_rng(11)
    protos = rng.standard_normal((3, 16)) * 4
    rows = []
    vid = 0
    for lbl in range(3):
        for _ in range(6):
            v = protos[lbl] + 0.3 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    # Planted exact near-copy inside label 0 (vec 0 and vec 100).
    rows.append((100, [float(x) for x in protos[0] + 0.01 * rng.standard_normal(16)], 0))
    # Same vector but mislabeled into cluster 1 -> cross-cluster, invisible.
    rows.append((101, [float(x) for x in protos[0] + 0.01 * rng.standard_normal(16)], 1))
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>, label int"
    )
    pairs = similarity.semdedup_pairs(df, threshold=0.95).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (0, 100) in got
    # 101 sits nearest cluster 0's centroid despite label 1 -> assignment
    # follows geometry, so (0, 101) is ALSO found in cluster 0.
    assert (0, 101) in got
    for r in pairs:
        assert r["cos_sim"] >= 0.95


def test_semdedup_cluster_partition_bounds_pairs(spark):
    """Every reported pair is within one cluster: pair count is bounded
    by sum-of-squares of cluster sizes, never the corpus square."""
    import numpy as np

    rng = np.random.default_rng(5)
    protos = rng.standard_normal((4, 8)) * 10
    rows = []
    for i in range(40):
        lbl = i % 4
        v = protos[lbl] + 0.2 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v], lbl))
    df = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<double>, label int"
    )
    pairs = similarity.semdedup_pairs(df, threshold=-1.0).collect()
    # threshold=-1 keeps every within-cluster pair: 4 clusters x C(10,2).
    assert len(pairs) == 4 * 45
    clusters = {r["cluster"] for r in pairs}
    assert clusters == {0, 1, 2, 3}


def test_random_projection_deterministic_and_jl(spark):
    """The hash-derived matrix is identical across invocations, and
    the projection roughly preserves relative distances (JL)."""
    import numpy as np

    rng = np.random.default_rng(3)
    X = rng.standard_normal((30, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    a = similarity.random_projection(df, in_dim=64, out_dim=16).collect()
    b = similarity.random_projection(df, in_dim=64, out_dim=16).collect()
    key = lambda r: (r["vec_id"], r["out_dim"])  # noqa: E731
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # Rebuild projected matrix and check distance-ratio concentration.
    Y = np.zeros((30, 16))
    for r in a:
        Y[r["vec_id"], r["out_dim"]] = r["rp_value"]
    ratios = []
    for i in range(0, 30, 3):
        for j in range(i + 1, 30, 7):
            dx = np.linalg.norm(X[i] - X[j])
            dy = np.linalg.norm(Y[i] - Y[j])
            ratios.append(dy / dx)
    ratios = np.array(ratios)
    # ±1/√k JL: ratios concentrate around 1 (loose 3-sigma band).
    assert 0.5 < ratios.mean() < 1.5
    assert (ratios > 0.3).all() and (ratios < 2.0).all()


def test_ivfpq_fullprobe_equals_pq(spark):
    """n_probe = n_centroids makes IVF-PQ's candidate set the whole
    corpus, so the result must EQUAL plain PQ ADC top-k with the same
    codebooks — greening the composed index machinery itself."""
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = similarity.pq_train(emb, n_subspaces=8, n_codes=16)
    cents = similarity.kmeans_centroids(emb, n_centroids=8)
    full = similarity.ivfpq_topk(
        emb, queries, k=3, n_centroids=8, n_probe=8,
        centroids=cents, books=books,
    ).collect()
    pq = similarity.pq_topk(
        emb, queries, k=3, n_subspaces=8, n_codes=16, books=books
    ).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, pq))


def test_ivfpq_partial_probe_recall(spark, emb, exact_topk):
    """IVF-PQ recall vs exact on the near-isotropic fixture (hard mode
    for both quantizers) sits far above the 3/400 chance level at every
    probe depth.  NOTE recall is deliberately NOT asserted monotone in
    n_probe: unlike exact-rerank IVF, probing more cells adds more
    ADC-approximated candidates whose quantization error can displace
    true neighbors (measured 0.40/0.53/0.47 at probes 2/4/8, seeded)."""
    queries = emb.filter(F.col("vec_id") < 5)
    books = similarity.pq_train(emb, n_subspaces=16, n_codes=32)
    cents = similarity.kmeans_centroids(emb, n_centroids=8)
    e = {
        (q, n) for (q, rk), n in exact_topk.items() if rk <= 3 and q < 5
    }

    def recall(n_probe):
        got = similarity.ivfpq_topk(
            emb, queries, k=3, n_centroids=8, n_probe=n_probe,
            n_subspaces=16, n_codes=32, centroids=cents, books=books,
        ).collect()
        g = {(r["query_id"], r["neighbor_id"]) for r in got}
        return len(g & e) / len(e)

    for n_probe in (2, 4, 8):
        assert recall(n_probe) >= 0.25


@pytest.mark.slow
def test_kmeans_frozen_invariants(spark, emb):
    """Frozen Lloyd: every vector assigned exactly once, clusters come
    from the seed range, more iterations never raise total distortion
    (1 - sim), and repeat runs are identical."""
    from mr_lda_spark.operators import similarity as sim

    a1 = sim.kmeans_frozen(emb, k=8, iterations=1)
    rows = a1.collect()
    n = emb.count()
    assert len(rows) == n
    assert {r["cluster"] for r in rows} <= set(range(8))
    sim1 = sum(r["sim"] for r in rows)
    a2 = sim.kmeans_frozen(emb, k=8, iterations=2)
    sim2 = sum(r["sim"] for r in a2.collect())
    assert sim2 >= sim1 - 1e-6  # Lloyd never worsens the objective
    again = sorted(map(tuple, sim.kmeans_frozen(emb, k=8, iterations=1).collect()))
    assert again == sorted(map(tuple, rows))


def test_ivfflat_frozen_partial_probe_recall(spark, emb, exact_topk):
    """Frozen IVF-Flat at nprobe=2/8: deterministic, and recall vs the
    exact top-k stays above the floor the probe geometry implies."""
    from mr_lda_spark.operators import similarity as sim

    queries = emb.filter(F.col("vec_id") < 5)
    got = sim.ivfflat_frozen_topk(emb, queries, k=3, n_clusters=8, nprobe=2)
    rows = got.collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    exact = {
        (q, n) for (q, rk), n in exact_topk.items() if q < 5 and rk <= 3
    }
    assert len(approx & exact) / len(exact) >= 0.4
    again = sim.ivfflat_frozen_topk(emb, queries, k=3, n_clusters=8, nprobe=2)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


@pytest.mark.slow
def test_ivf_kmeans_frozen_partial_probe(spark, emb, exact_topk):
    """Trained frozen quantizer (2 Lloyd rounds, 16 cells) at nprobe=4:
    deterministic, recall above the probe-geometry floor, and probing
    every cell degenerates to the exact top-k (the full-probe
    equivalence that anchors the partial-probe semantics)."""
    from mr_lda_spark.operators import similarity as sim

    queries = emb.filter(F.col("vec_id") < 5)
    got = sim.ivf_kmeans_frozen_topk(
        emb, queries, k=3, n_clusters=16, nprobe=4, train_iterations=2
    )
    rows = got.collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    exact = {
        (q, n) for (q, rk), n in exact_topk.items() if q < 5 and rk <= 3
    }
    assert len(approx & exact) / len(exact) >= 0.4
    again = sim.ivf_kmeans_frozen_topk(
        emb, queries, k=3, n_clusters=16, nprobe=4, train_iterations=2
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    full = sim.ivf_kmeans_frozen_topk(
        emb, queries, k=3, n_clusters=16, nprobe=16, train_iterations=2
    )
    assert {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in full.collect()
    } == {(q, rk, n) for (q, rk), n in exact_topk.items() if q < 5 and rk <= 3}


def test_ivfpq_frozen_partial_probe(spark, emb, exact_topk):
    """Fully frozen IVF-PQ at nprobe=2/8: deterministic, well-formed
    ranks, recall above the compound (probe ∩ PQ) floor, and the
    integer-exact ADC score equals the float inner product of the
    decoded codebook centroids to within rounding."""
    from mr_lda_spark.operators import similarity as sim

    queries = emb.filter(F.col("vec_id") < 5)
    got = sim.ivfpq_frozen_partial_topk(
        emb, queries, k=3, n_clusters=8, nprobe=2
    )
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in by_q.values())
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    exact = {
        (q, n) for (q, rk), n in exact_topk.items() if q < 5 and rk <= 3
    }
    # compound approximation with UNTRAINED md5 codebooks (machinery
    # row, not a quality row — trained-variant recall is pinned
    # elsewhere): floor just above zero, deterministic by frozen state
    assert len(approx & exact) / len(exact) >= 0.1
    again = sim.ivfpq_frozen_partial_topk(
        emb, queries, k=3, n_clusters=8, nprobe=2
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_kmeans_frozen_sparse_ids_seeds_k_clusters(spark):
    """ADVICE r6: seeding must take the k LOWEST-ID vectors (renumbered
    0..k-1), not filter(vec_id < k) — with sparse, non-zero-based ids
    the old filter silently yielded zero centroids."""
    import numpy as np

    rows = [
        (int(i), [float(x) for x in v])
        for i, v in zip(
            range(1000, 1016),
            np.random.RandomState(7).randn(16, 8),
        )
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.kmeans_frozen(emb, k=4, iterations=1).collect()
    assert len(out) == 16  # every vector assigned (old code: 0 rows)
    assert {r["cluster"] for r in out} <= {0, 1, 2, 3}
    assert len({r["cluster"] for r in out}) >= 2


def test_rrf_fuse_integer_scores_and_missing_sources(spark):
    from mr_lda_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    got = {
        r["neighbor_id"]: (r["fused_rank"], r["rrf_score"])
        for r in rrf_fuse([a, b], topk=4).collect()
    }
    s = lambda r: 1_000_000_000 // (60 + r)  # noqa: E731
    # 11 appears in both sources -> top fused score
    assert got[11] == (1, s(2) + s(1))
    assert got[10] == (2, s(1))
    assert got[13] == (3, s(2))
    assert got[12] == (4, s(3))


def test_rrf_fuse_tie_broken_by_neighbor_id(spark):
    from mr_lda_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 20, 1), (1, 10, 1)],  # impossible dup rank, same score
        "query_id long, neighbor_id long, rank int",
    )
    rows = rrf_fuse([a], topk=2).collect()
    assert [r["neighbor_id"] for r in sorted(
        rows, key=lambda r: r["fused_rank"])] == [10, 20]


def test_margin_mining_normalizes_hubness(spark):
    """The margin criterion's point: a hub query whose whole
    neighborhood scores high (uniform cosines) must NOT mine, while a
    query with one isolated strong match must — even when the hub's
    absolute top cosine is higher."""
    from mr_lda_spark.operators.similarity import margin_mining

    def vec(x, y):
        return [float(x), float(y)]

    # query 10 (hub): corpus vectors all nearly parallel to it.
    # query 20 (isolated match): one aligned vector, two orthogonal-ish.
    queries = spark.createDataFrame(
        [(10, vec(1, 0)), (20, vec(0, 1))],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, vec(1, 0.02)), (2, vec(1, -0.05)), (3, vec(1, 0.1)),
            (4, vec(0.05, 1)), (5, vec(1, 0.3)), (6, vec(1, -0.3)),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["query_id"]: r
        for r in margin_mining(
            queries, corpus, k=3, threshold=1.12
        ).collect()
    }
    # hub: top-3 cosines all ~0.99+ -> margin ~1, not mined, despite
    # cos_top1 being the highest in the whole table
    assert out[10]["cos_top1"] > out[20]["cos_top1"]
    assert not out[10]["mined"]
    assert out[10]["margin"] < 1.12
    # isolated: top1 ~1.0 vs weak runners-up -> margin >> threshold
    assert out[20]["mined"]
    assert out[20]["neighbor_id"] == 4
    assert out[20]["margin"] > 1.5


def test_margin_mining_lsh_equals_exact_when_buckets_saturate(spark):
    """With a single band of 0 effective selectivity impossible, the
    next-best exactness proof: clone vectors so every query/corpus
    pair shares at least one bucket (identical vectors bucket
    identically in every band), making the LSH candidate set the full
    cross set — margin_mining_lsh must then return exactly what
    margin_mining returns."""
    import numpy as np

    from mr_lda_spark.operators.similarity import (
        margin_mining,
        margin_mining_lsh,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    # corpus: small perturbations of one direction (all same bucket
    # with near-certainty under any banding) + the queries themselves
    # reuse the same direction family.
    def jitter(eps, i):
        r = np.random.default_rng(100 + i)
        return [float(x) for x in base + eps * r.standard_normal(64)]

    queries = spark.createDataFrame(
        [(i, jitter(0.001, i)) for i in range(2)],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(10 + i, jitter(0.002, 50 + i)) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    exact = sorted(
        map(tuple, margin_mining(queries, corpus, k=3).collect())
    )
    lsh = sorted(
        map(tuple, margin_mining_lsh(queries, corpus, k=3).collect())
    )
    assert lsh == exact


def test_margin_mining_lsh_plan_no_cartesian(spark):
    """The composition's whole point: candidates come from the banded
    bucket equi-join, never a cross join of the two sets."""
    from mr_lda_spark.operators.similarity import margin_mining_lsh

    q = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    c = spark.createDataFrame(
        [(2, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    plan = (
        margin_mining_lsh(q, c)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # bucketing is Arrow-batched


def test_margin_mining_zero_sum_neighborhood_defined(spark):
    """Integer-exact sums make Σscaled == 0 reachable (rounded
    cosines 0.25, -0.12, -0.13 → 2500-1200-1300 = 0); the degenerate
    neighborhood must be DEFINED — margin NULL, mined False — instead
    of a divide-by-zero whose result differs between engines
    (self-review r11)."""
    import math

    from mr_lda_spark.operators.similarity import margin_mining

    def unit(c):
        return [float(c), float(math.sqrt(1.0 - c * c))]

    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(10, unit(0.25)), (11, unit(-0.12)), (12, unit(-0.13))],
        "vec_id long, embedding array<double>",
    )
    [row] = margin_mining(queries, corpus, k=3).collect()
    assert row["cos_top1"] == 0.25
    assert row["margin"] is None
    assert row["mined"] is False
