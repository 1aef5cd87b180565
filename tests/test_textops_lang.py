"""Char-trigram language ID accuracy + CJK analyzer fixtures."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import analyzers, parse, textops

FIXTURES = [
    (0, "the cat is sitting in the garden and it was watching the birds", "en"),
    (1, "el perro de la casa y los chicos que juegan en el parque", "es"),
    (2, "der hund ist in dem garten und die kinder spielen auf der wiese", "de"),
    (3, "le chien est dans le jardin et les enfants jouent par la rue", "fr"),
    (4, "wo3 men2 zai4 gong1 yuan2 de5 shi4 le5 ta1 men2 he2 ni3 hao3", "zh"),
    (5, "", "und"),
    (6, "qqq zzz xxx", "und"),
]


@pytest.fixture(scope="module")
def lang_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in FIXTURES], schema="doc_id long, text string"
    )


def test_language_id_accuracy_on_mixed_langs(spark, lang_docs):
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in textops.language_id(lang_docs).collect()
    }
    for doc_id, _, want in FIXTURES:
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_language_id_profiles_are_trigrams(spark):
    for lang, profile in textops.LANG_TRIGRAMS.items():
        assert len(profile) >= 20, lang
        assert all(len(t) == 3 for t in profile), lang


CJK_CASES = [
    ("spark 数据处理 engine", ["spark", "数据", "据处", "处理", "engine"]),
    ("我 love 数", ["我", "love", "数"]),
    ("こんにちは", ["こん", "んに", "にち", "ちは"]),
    ("한국어 text", ["한국", "국어", "text"]),
    ("", []),
    ("Hello, World!", ["hello", "world"]),
]


def test_cjk_bigram_callable():
    for text, want in CJK_CASES:
        assert analyzers.cjk_bigram(text) == want, text


def test_cjk_codegen_matches_callable(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CJK_CASES)],
        schema="doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", analyzers.cjk_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    for i, (text, want) in enumerate(CJK_CASES):
        assert got[i] == want, (text, got[i], want)


def test_cjk_analyzer_via_u1_extension_point(spark):
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    df = spark.createDataFrame(
        [(0, "spark 数据处理 engine")], schema="doc_id long, text string"
    )
    toks = sorted(
        r["term"]
        for r in parse.tokenize(df, analyzer=analyzers.cjk_bigram).collect()
    )
    assert toks == sorted(["spark", "数据", "据处", "处理", "engine"])
    # The codegen twin produces the identical token relation.
    toks2 = sorted(r["term"] for r in analyzers.tokenize_cjk(df).collect())
    assert toks2 == toks


def test_repetition_scores_pinned_semantics(spark):
    """Gopher-style repetition signals on crafted docs: a looping
    bigram trips top_bigram_frac, a repeated trigram trips
    dup_trigram_frac, and diverse text trips neither."""
    from mr_lda_spark.operators import textops

    docs = spark.createDataFrame(
        [
            # "spam ham" * 6 -> top bigram ("spam ham" or "ham spam")
            # dominates; every trigram repeats.
            (0, "spam ham " * 6),
            # 12 distinct tokens, no repeated n-gram at all.
            (1, "one two three four five six seven eight nine ten up down"),
            # tokens repeat but never adjacently in the same order:
            # dup_token_frac high, n-gram signals low.
            (2, "a b c d e f g a c e g b d f"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textops.repetition_scores(docs).collect()}
    r0 = rows[0]
    assert r0["n_tokens"] == 12
    assert r0["dup_token_frac"] == pytest.approx(1 - 2 / 12, abs=1e-6)
    assert r0["top_bigram_frac"] == pytest.approx(6 / 11, abs=1e-6)
    assert r0["dup_trigram_frac"] == 1.0
    assert r0["repetitive"]
    r1 = rows[1]
    assert r1["dup_token_frac"] == 0.0
    assert r1["top_bigram_frac"] == pytest.approx(1 / 11, abs=1e-6)
    assert r1["dup_trigram_frac"] == 0.0
    assert not r1["repetitive"]
    r2 = rows[2]
    assert r2["dup_token_frac"] == pytest.approx(0.5, abs=1e-6)
    assert r2["dup_trigram_frac"] == 0.0
    assert not r2["repetitive"]


def test_blocklist_filter_empty_list_is_all_clear(spark):
    """blocked=[] is a valid configuration (nothing blocked), not an
    error: every doc passes with zero hits (ADVICE r5)."""
    docs = spark.createDataFrame(
        [(0, "clean text here"), (1, "more clean text")],
        "doc_id long, text string",
    )
    rows = sorted(
        map(tuple, textops.blocklist_filter(docs, []).collect())
    )
    assert rows == [(0, 0, False), (1, 0, False)]


def test_decontaminate_spans_semantics(spark):
    """Surgical span removal: only the covered windows go, overlapping
    windows merge, clean docs pass through untouched, fully
    contaminated docs come back empty."""
    ev = spark.createDataFrame(
        [(100, "one two three four five"), (101, "zz zz zz zz zz")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # exact 5-gram in the middle -> 5 tokens cut
            (0, "aa bb one two three four five cc dd"),
            # overlapping windows: "zz"*6 matches the zz-5-gram at two
            # overlapping starts -> all 6 zz tokens cut
            (1, "xx zz zz zz zz zz zz yy"),
            # untouched
            (2, "totally clean text here"),
            # fully contaminated
            (3, "one two three four five"),
            # shorter than n -> untouched
            (4, "one two"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textops.decontaminate_spans(docs, ev, n=5).collect()
    }
    assert rows[0]["clean_text"] == "aa bb cc dd"
    assert rows[0]["n_removed"] == 5 and rows[0]["n_tokens"] == 9
    assert rows[1]["clean_text"] == "xx yy"
    assert rows[2]["clean_text"] == "totally clean text here"
    assert rows[2]["n_removed"] == 0
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 5
    assert rows[4]["clean_text"] == "one two" and rows[4]["n_removed"] == 0


from hypothesis import given, settings, strategies as st

_w = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_w, min_size=0, max_size=14).map(" ".join)


def _ref_decontaminate_spans(train_texts, eval_texts, n):
    """Independent pure-Python span decontamination."""
    ev = set()
    for t in eval_texts:
        toks = t.split()
        for i in range(len(toks) - n + 1):
            ev.add(tuple(toks[i : i + n]))
    out = {}
    for doc_id, t in enumerate(train_texts):
        toks = t.split()
        bad = set()
        for i in range(len(toks) - n + 1):
            if tuple(toks[i : i + n]) in ev:
                bad.update(range(i, i + n))
        kept = [tok for i, tok in enumerate(toks) if i not in bad]
        out[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(_doc, min_size=1, max_size=6),
    st.lists(_doc, min_size=1, max_size=3),
    st.integers(2, 4),
)
@pytest.mark.slow
def test_decontaminate_spans_property(spark, train_texts, eval_texts, n):
    """Property: on arbitrary small corpora the Spark span cutter
    equals the independent pure-Python reference — same windows, same
    overlap merging, same reassembly."""
    docs = spark.createDataFrame(
        list(enumerate(train_texts)), "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(eval_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in textops.decontaminate_spans(docs, ev, n=n).collect()
    }
    assert got == _ref_decontaminate_spans(train_texts, eval_texts, n)
