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
