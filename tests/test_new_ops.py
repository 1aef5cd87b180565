"""PII scrub, label centroids, and the stream-stream attribution join
(stream ≡ batch)."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import similarity, textops


def test_scrub_pii_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://example.com/x now"),
            (2, "call 555-123-4567 twice 555-123-4567"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.scrub_pii(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_urls"], got[1]["n_phones"]) == (1, 1, 0)
    assert got[1]["clean_text"] == "contact <EMAIL> or visit <URL> now"
    assert got[2]["n_phones"] == 2
    assert got[2]["clean_text"] == "call <PHONE> twice <PHONE>"
    assert got[3]["clean_text"] == "nothing sensitive here"


def test_label_centroids_matches_numpy(spark):
    import numpy as np

    rows = [
        (0, [1.0, 2.0], 7),
        (1, [3.0, 4.0], 7),
        (2, [10.0, 20.0], 8),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["label"], r["pos"]): (r["centroid"], r["n_vecs"])
        for r in similarity.label_centroids(df).collect()
    }
    assert got[(7, 0)] == (pytest.approx(2.0), 2)
    assert got[(7, 1)] == (pytest.approx(3.0), 2)
    assert got[(8, 0)] == (pytest.approx(10.0), 1)
    assert got[(8, 1)] == (pytest.approx(20.0), 1)
    np_mean = np.mean([[1.0, 2.0], [3.0, 4.0]], axis=0)
    assert [got[(7, i)][0] for i in range(2)] == pytest.approx(list(np_mean))


@pytest.mark.slow
def test_stream_join_equals_batch(spark, sf_dir):
    import uuid

    from mr_lda_spark.session import read_table
    from mr_lda_spark.streaming import events as se

    views = se.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "view"
    )
    buys = se.read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    stream = se.run_stream_to_batch(
        se.view_purchase_join_stream(views, buys),
        f"t_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    ev = read_table(spark, sf_dir, "events")
    batch = se.view_purchase_join_stream(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    assert sorted(map(tuple, stream.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_pack_sequences_invariants(spark, sf_dir):
    from mr_lda_spark.operators.curation import pack_sequences
    from mr_lda_spark.operators.textops import chunk_documents
    from mr_lda_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, overlap=8)
    packed = pack_sequences(chunks, max_tokens=512, n_shards=4).collect()
    assert len(packed) == chunks.count()
    for r in packed:
        assert 0 <= r.shard < 4
        assert r.shard == r.doc_id % 4
        # a chunk starts inside its bin
        assert 0 <= r.bin_offset < 512
    # bins fill to capacity: every bin except each shard's last holds
    # >= 512 - (max chunk - 1) tokens of budget by construction
    from collections import defaultdict

    per_bin = defaultdict(int)
    for r in packed:
        per_bin[(r.shard, r.bin_id)] += r.n_chunk_tokens
    for shard in {s for s, _ in per_bin}:
        bins = sorted(b for s, b in per_bin if s == shard)
        # contiguous bin ids per shard (no empty bins skipped)
        assert bins == list(range(len(bins)))
        for b in bins[:-1]:
            assert per_bin[(shard, b)] >= 512 - 63


def test_mixture_weights_sum_to_one(spark, sf_dir):
    from mr_lda_spark.operators.curation import mixture_weights
    from mr_lda_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    rows = mixture_weights(docs, temperature=0.7).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # flattening: low-resource domains gain relative share vs natural
    nat = {r.lang: r.n_docs for r in rows}
    tot = sum(nat.values())
    for r in rows:
        if r.n_docs < tot / len(nat):
            assert r.weight > r.n_docs / tot


def test_bm25_semantics(spark):
    """Docs without query terms never appear; a doc matching more query
    terms outranks a longer doc matching one; idf stays positive even
    for a term in every doc (Lucene +1 floor)."""
    from mr_lda_spark.operators.textops import bm25_topk

    rows = [
        (1, "hash join scan filter sort"),
        (2, "hash hash hash something else entirely padded out long " + "x " * 40),
        (3, "no relevant terms at all here"),
        (4, "hash join other words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(docs, ["hash", "join", "scan"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids
    assert set(ids) == {1, 2, 4}
    assert ids[0] == 1  # all three query terms, short doc
    assert all(r["bm25"] > 0 for r in got)


def test_bigram_lm_semantics(spark):
    """<2-token docs are dropped; exact duplicate docs score
    identically; a doc built from corpus-common bigrams has lower
    perplexity than one of corpus-unique bigrams."""
    from mr_lda_spark.operators.textops import bigram_lm_scores

    common = "the cat sat on the mat"
    rows = [
        (1, common),
        (2, common),
        (3, common),
        (4, "zeta omega unique bigrams nowhere else"),
        (5, "single"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert 5 not in got
    assert got[1]["avg_logprob"] == got[2]["avg_logprob"] == got[3]["avg_logprob"]
    assert got[1]["perplexity"] < got[4]["perplexity"]
    assert got[1]["n_bigrams"] == 5


def test_source_overlap_exact_and_shingle(spark):
    """Leakage matrix semantics pinned: exact mode counts whole-text
    copies across sources; shingle mode counts shared 3-grams; frac is
    asymmetric (denominator = first source's distinct units)."""
    from mr_lda_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "A"),
            (1, "alpha beta gamma delta", "B"),   # exact copy in B
            (2, "epsilon zeta eta theta", "A"),
            (3, "unique content here words", "B"),
            (4, "more unique content again words", "B"),
        ],
        "doc_id long, text string, source string",
    )
    exact = {
        (r["source_a"], r["source_b"]): r
        for r in dedup.source_overlap(docs).collect()
    }
    assert exact[("A", "B")]["n_shared"] == 1
    assert exact[("A", "B")]["n_a"] == 2      # A has 2 distinct texts
    assert exact[("A", "B")]["frac_of_a"] == 0.5
    assert exact[("B", "A")]["n_a"] == 3
    sh = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in dedup.source_overlap(docs, ngram=3).collect()
    }
    assert sh[("A", "B")] == 2  # the copy's two 3-grams


def test_source_overlap_minhash_tracks_true_jaccard(spark):
    """Sketch estimate: identical sources estimate 1.0, disjoint
    sources 0.0, half-overlapping sources in between — and the
    estimate is deterministic (md5 seeds)."""
    from mr_lda_spark.operators import dedup

    shared = [f"common text number {i} with several words" for i in range(20)]
    only_a = [f"alpha only doc {i} distinct words here" for i in range(20)]
    only_c = [f"charlie{i} crimson{i} cobalt{i} copper{i} coral{i}" for i in range(20)]
    rows = []
    for i, t in enumerate(shared):
        rows += [(100 + i, t, "A"), (200 + i, t, "B")]   # A ≡ B
    for i, t in enumerate(only_a):
        rows.append((300 + i, t, "A"))
    for i, t in enumerate(only_c):
        rows.append((400 + i, t, "C"))                   # C disjoint
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in dedup.source_overlap_minhash(docs, num_hashes=32).collect()
    }
    assert est[("A", "C")] == 0.0 and est[("B", "C")] == 0.0
    # B ⊂ A with |B|/|A| ≈ 1/2 → true Jaccard ≈ 0.5; 32 seeds → loose band
    assert 0.2 <= est[("A", "B")] <= 0.8
    again = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in dedup.source_overlap_minhash(docs, num_hashes=32).collect()
    }
    assert est == again


def test_hll_within_documented_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) must land within its documented
    error bound of the exact per-group count (VERDICT r5 item #4).
    HLL++ rsd is a standard deviation, not a hard cap — assert 5 sigma,
    which a correct sketch essentially never exceeds."""
    from mr_lda_spark.session import read_table

    e = read_table(spark, sf_dir, "events")
    rows = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(5, 5 * 0.02 * r["exact"]), (
            r["event_type"], r["approx"], r["exact"],
        )


def test_pearson_correlations_known_values(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.profile import pearson_correlations

    # y = 2x (r=1), z anti-correlated with x (r=-1), w constant (null)
    rows = [(x, 2 * x, 10 - x, 5) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "x long, y long, z long, w long")
    got = {
        (r["var_a"], r["var_b"]): r["r"]
        for r in pearson_correlations(df, ["x", "y", "z", "w"]).collect()
    }
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("x", "w")] is None
    assert got[("y", "z")] == -1.0


def test_copurchase_lift_known_values(spark):
    from mr_lda_spark.operators.mining import copurchase_lift

    # 4 baskets: {a,b} x3, {a,c} x1 -> pair (a,b) support 3
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "bk long, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in copurchase_lift(df, "bk", "item", min_support=2).collect()
    }
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r["n_pair"], r["n_a"], r["n_b"], r["n_baskets"]) == (3, 4, 3, 4)
    # lift = (3*4)/(4*3) = 1.0 -> 1_000_000 ppm
    assert r["lift_ppm"] == 1_000_000


def test_copurchase_lift_dedups_within_basket(spark):
    from mr_lda_spark.operators.mining import copurchase_lift

    # duplicate (basket, item) rows must not inflate counts
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "bk long, item string")
    r = copurchase_lift(df, "bk", "item", min_support=2).collect()[0]
    assert r["n_pair"] == 2 and r["n_a"] == 2


def test_item_similarity_topk_symmetry_and_rank(spark):
    from mr_lda_spark.operators.mining import item_similarity_topk

    # a co-occurs with b twice, with c once; all in 3 baskets
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "bk long, item string")
    out = item_similarity_topk(df, "bk", "item", k=2, min_support=1)
    got = {
        (r["item"], r["rank"]): (r["neighbor"], r["sim"])
        for r in out.collect()
    }
    # a: n_a=3; (a,b) n=2, n_b=3 -> 2/3 ; (a,c) n=1, n_c=2 -> 1/sqrt(6)
    assert got[("a", 1)][0] == "b"
    assert abs(got[("a", 1)][1] - 2 / 3) < 1e-6
    assert got[("a", 2)][0] == "c"
    # symmetry: b's top neighbor is a with the same sim
    assert got[("b", 1)][0] == "a"
    assert got[("b", 1)][1] == got[("a", 1)][1]


def test_zorder_single_point_domain(spark):
    """Degenerate domains (max == min == 0) must not divide by zero
    and land everything in one cell."""
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.layout import zorder_cell_extents

    df = spark.range(10).select(
        F.lit(0).cast("long").alias("x"), F.lit(0).cast("long").alias("y")
    )
    cells = zorder_cell_extents(df, "x", "y", qbits=8, levels=3).collect()
    assert len(cells) == 1 and cells[0]["n_rows"] == 10


def test_markov_self_loops_counted(spark):
    import datetime
    from mr_lda_spark.operators.funnel import markov_transitions

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, 1, "a", t0 + datetime.timedelta(seconds=i), 0.0)
        for i in range(1, 5)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    got = markov_transitions(events).collect()
    assert len(got) == 1
    assert (got[0]["src"], got[0]["dst"], got[0]["n"]) == ("a", "a", 3)
    assert got[0]["p_ppm"] == 1_000_000


def test_hll_empty_input(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators import hll

    empty = spark.range(0).select(F.col("id").cast("string").alias("k"))
    # a global aggregate always yields one row; the empty sketch must
    # flow through the linear-counting branch to est_distinct = 0
    row = hll.hll_distinct(empty, "k", [], p=8).collect()
    assert len(row) == 1
    assert row[0]["used_buckets"] == 0
    assert row[0]["est_distinct"] == 0
