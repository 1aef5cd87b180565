"""Property test: the distributed n-gram Jaccard pipeline vs a pure
Python reference on generated corpora."""

import pytest
from hypothesis import given, settings, strategies as st

from mr_lda_spark.operators import dedup

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12),
    min_size=2,
    max_size=10,
)


def _py_shingles(tokens, n=3):
    return {
        " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    }


@given(doc_strategy)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_jaccard_pipeline_matches_python(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.jaccard_near_dupes_exact(df, threshold=0.0).collect()
    }
    # Pure-python oracle.
    sh = {i: _py_shingles(t) for i, t in enumerate(docs)}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue  # pipeline only scores pairs sharing a shingle
            want[(a, b)] = inter / len(sh[a] | sh[b])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(round(want[k], 6), abs=1e-6)


def test_incremental_jaccard_prunes_old_old_pairs(spark):
    """new_from keeps exactly the pairs touching the new batch:
    equals the full result filtered on b >= split, and an old-old
    planted dupe disappears while old-new survives."""
    from mr_lda_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base + " one"),
        (2, base + " one"),          # old-old dup with 1
        (50, "totally different words here about spark engines run"),
        (100, base + " one"),        # new, dup with 1 and 2
        (101, "totally different words here about spark engines run"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = dedup.jaccard_near_dupes_exact(
        docs, threshold=0.5, max_shingle_df=100
    ).collect()
    inc = dedup.jaccard_near_dupes_exact(
        docs, threshold=0.5, max_shingle_df=100, new_from=100
    ).collect()
    full_pairs = {(r["a"], r["b"]) for r in full}
    inc_pairs = {(r["a"], r["b"]) for r in inc}
    assert (1, 2) in full_pairs
    assert inc_pairs == {(a, b) for a, b in full_pairs if b >= 100}
    assert (1, 100) in inc_pairs and (50, 101) in inc_pairs
    assert (1, 2) not in inc_pairs


def test_containment_catches_embedded_doc(spark):
    """A small doc embedded verbatim in a much larger one scores
    containment 1.0 while its Jaccard is far below any useful
    near-dup threshold — the case the directional metric exists for."""
    from mr_lda_spark.operators import dedup

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (1, small),
        (2, filler + " " + small + " " + filler),  # contains doc 1
        (3, "entirely unrelated words about engines and rivers flow"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r
        for r in dedup.containment_pairs(
            docs, threshold=0.9, max_shingle_df=100
        ).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment"] == pytest.approx(1.0)
    assert r["jaccard"] < 0.2
    assert all(a == 1 and b == 2 for (a, b) in got)


def test_edit_distance_pairs_finds_small_edits_only(spark):
    base = " ".join(f"tok{i} mid{i} end{i}" for i in range(30))
    rows = [
        (1, base),
        (2, base.replace("tok3", "tok3X")),        # 1 char insert
        (3, base.replace("mid7 ", "")),            # small delete
        (4, "completely different content " * 10), # no shared shingles
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in dedup.edit_distance_pairs(docs, max_distance=16).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == len("mid7 ")
    assert all(4 not in pair for pair in got)
    # bound respected: nothing above the cap, no -1 sentinels leak
    assert all(0 <= d <= 16 for d in got.values())


def test_edit_distance_pairs_cap_excludes_distant_texts(spark):
    a = " ".join(f"w{i}" for i in range(40))
    # same shingle PREFIX (blocks together via a shared band) but a
    # long divergent tail: distance above the cap -> excluded.
    rows = [(1, a + " same tail one"), (2, a + " " + "z " * 60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.edit_distance_pairs(docs, max_distance=8).collect()
    assert got == []


def test_sorted_neighborhood_finds_prefix_sharing_near_dups(spark):
    from mr_lda_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dot"),  # 1 edit
            (3, "a completely different document body here"),
            # shares the 8-char block prefix but far in edit distance
            (4, "the quick red panda sleeps all day long in a tree"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["a"], r["b"]): r["dist"]
        for r in dedup.sorted_neighborhood_pairs(
            docs, window=3, max_distance=5
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1
    assert all(k == (1, 2) for k in pairs)


def test_sorted_neighborhood_candidates_capped_by_window(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators import dedup

    # 20 identical texts: a hot block — candidates must be <= w*n,
    # not C(n,2)
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"), F.lit("same text body").alias("text")
    )
    pairs = dedup.sorted_neighborhood_pairs(docs, window=3).collect()
    assert len(pairs) == 3 * 20 - (1 + 2 + 3)  # tail rows lack successors


def test_survivors_by_score_keeps_best(spark):
    from mr_lda_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a long, b long"
    )  # clusters {1,2,3}, {4,5}; 6 unpaired
    scores = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.7), (6, 0.0)],
        "doc_id long, quality_score double",
    )
    kept = sorted(
        r["doc_id"]
        for r in dd.dedup_survivors_by_score(docs, pairs, scores).collect()
    )
    # cluster one keeps 2 (best score); cluster two ties -> lowest id 4
    assert kept == [2, 4, 6]
