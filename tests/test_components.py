"""Connected-components clustering, keep-one survivors, eval-set
decontamination, and tf-idf — unit + property checks against pure
Python references."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import dedup, textops


def _py_components(pairs):
    """Union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (10, 11)],          # two components
        [(1, 2)],                            # single edge
        [(5, 1), (4, 5), (3, 4), (2, 3)],    # a long chain (diameter 4)
        [(1, 2), (3, 4), (2, 3), (1, 4)],    # cycle
        [(7, 7)],                            # self-loop
    ],
)
def test_connected_components_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == _py_components(pairs)


def test_survivors_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "a long, b long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_survivors(docs, pairs).collect()
    )
    # {0,1,2} -> 0, {5,6} -> 5, singletons 3,4,7 untouched.
    assert kept == [0, 3, 4, 5, 7]


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here padding tokens extra"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps over something else entirely")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in textops.decontaminate(train, ev, n=5).collect()
    }
    # doc 1 shares the 5-gram "quick brown fox jumps over"; doc 2 none.
    assert got[1] == (1, True)
    assert got[2] == (0, False)


def test_tfidf_top_terms_python_parity(spark):
    import math

    corpus = {
        1: "apple banana apple cherry",
        2: "banana cherry cherry date",
        3: "apple date date date",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tfidf"])
        for r in textops.tfidf_top_terms(df, k=2).collect()
    }
    # Pure-python reference.
    toks = {d: t.split() for d, t in corpus.items()}
    docfreq = {}
    for t in toks.values():
        for term in set(t):
            docfreq[term] = docfreq.get(term, 0) + 1
    n = len(corpus)
    for d, t in toks.items():
        scores = sorted(
            (
                (-round(t.count(term) * math.log(n / docfreq[term]), 6), term)
                for term in set(t)
            ),
        )
        for rnk, (neg, term) in enumerate(scores[:2], start=1):
            assert got[(d, rnk)] == (term, -neg), (d, rnk)


def test_connected_components_plan_has_no_cartesian(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    plan = dedup.connected_components(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
