"""Property tests for the continuation operator family (entropy, JS
divergence, weighted tickets, KMV) vs pure-python references on
generated inputs — the test_dedup_properties strategy: few examples,
each a whole generated corpus through the real distributed pipeline."""

import hashlib
import math

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from mr_lda_spark.operators import kmv
from mr_lda_spark.operators.curation import weighted_sample
from mr_lda_spark.operators.textops import (
    char_entropy,
    char_entropy_stateless,
    source_divergence,
)

text_strategy = st.lists(
    st.text(
        alphabet="abcde √é ",  # small alphabet incl. space + unicode
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


def _py_entropy(text):
    counts = {}
    for ch in text:
        counts[ch] = counts.get(ch, 0) + 1
    n = sum(counts.values())
    if n == 0:
        return 0, 0, 0, 0.0
    s = sum(round(c * math.log2(c) * 1e6) for c in counts.values())
    return n, len(counts), s, round(math.log2(n) - s / (n * 1e6), 4)


@given(text_strategy)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_entropy_both_variants_match_python(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (char_entropy, char_entropy_stateless):
        got = {r["doc_id"]: r for r in fn(df).collect()}
        for i, t in rows:
            n, d, s, h = _py_entropy(t)
            r = got[i]
            assert (r["n_chars"], r["n_distinct_chars"], r["clogc_q"]) == (
                n, d, s,
            ), (fn.__name__, t)
            assert r["entropy_bits"] == pytest.approx(h, abs=1e-4)


words = st.sampled_from(["aa", "bb", "cc", "dd"])
corpus_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(words, min_size=1, max_size=10),
    ),
    min_size=2,
    max_size=12,
)


@given(corpus_strategy)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_js_divergence_matches_python(spark, docs):
    rows = [(i, " ".join(t), s) for i, (s, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r["js_bits"]
        for r in source_divergence(df).collect()
    }
    # python reference
    from collections import Counter, defaultdict

    cnt = defaultdict(Counter)
    for _, text, s in rows:
        cnt[s].update(text.split())
    labels = sorted(cnt)
    for i, a in enumerate(labels):
        for b in labels[i + 1:]:
            na, nb = sum(cnt[a].values()), sum(cnt[b].values())
            shared = set(cnt[a]) & set(cnt[b])
            if not shared:
                assert (a, b) not in got
                continue
            sq = 0
            ca = cb = 0
            for t in shared:
                p, q = cnt[a][t] / na, cnt[b][t] / nb
                sq += round(
                    0.5
                    * (p * math.log2(2 * p / (p + q))
                       + q * math.log2(2 * q / (p + q)))
                    * 1e9
                )
                ca += cnt[a][t]
                cb += cnt[b][t]
            want = round(sq / 1e9 + (2 - ca / na - cb / nb) / 2, 6)
            assert got[(a, b)] == pytest.approx(want, abs=1e-6), (a, b)


@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 100)),
        min_size=1,
        max_size=30,
        unique_by=lambda x: x[0],
    ),
    st.integers(1, 8),
)
@settings(max_examples=6, deadline=None)
def test_weighted_sample_matches_python(spark, id_weights, k):
    df = spark.createDataFrame(id_weights, "doc_id long, w long")
    got = sorted(
        (r["min_key"], r["doc_id"])
        for r in weighted_sample(df, "w", k=k).collect()
    )

    def mirror(i, w):
        w = min(max(w, 1), 64)
        return min(
            int(hashlib.md5(f"{i}:wrs:{j}".encode()).hexdigest()[:15], 16)
            for j in range(1, w + 1)
        )

    want = sorted((mirror(i, w), i) for i, w in id_weights)[:k]
    assert got == want


@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 500)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 12),
)
@settings(max_examples=6, deadline=None)
@pytest.mark.slow
def test_kmv_sketch_and_merge_match_python(spark, rows, k):
    df = spark.createDataFrame(
        [(i, g, f"v{v}") for i, (g, v) in enumerate(rows)],
        "id long, source string, key string",
    )
    sk = kmv.kmv_sketch(df, "key", ["source"], k=k)
    got = {}
    for r in sk.collect():
        got.setdefault(r["source"], []).append((r["rank"], r["h"]))

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, set()).add(h60(f"v{v}"))
    for g, hs in by_g.items():
        want = list(enumerate(sorted(hs)[:k], start=1))
        assert sorted(got[g]) == want, g
    # merge == direct bottom-k of the union
    merged = sorted(
        r["h"] for r in kmv.kmv_merge(sk, k=k).collect()
    )
    allh = set()
    for hs in by_g.values():
        allh |= hs
    # merged sketch of per-group sketches == bottom-k of union only
    # when every group's sketch covers its part of the global
    # bottom-k — always true since per-group sketches keep k each.
    assert merged == sorted(allh)[:k]
