"""Segment-level dedup with reconstruction (dedup.segment_dedup):
first-occurrence survival corpus-wide and per-doc, order-preserving
rebuild, zero-loss when the corpus has no duplicate segments."""

import pytest

from mr_lda_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_no_duplicates_is_identity(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h i"),
            (2, "j k l m n o p q"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, width=4, scope="corpus").collect()
    }
    assert out[1]["dedup_text"] == "a b c d e f g h i"
    assert out[1]["n_segments"] == 3 and out[1]["n_dropped"] == 0
    assert out[2]["dedup_text"] == "j k l m n o p q"


def test_corpus_scope_drops_later_copy_entirely(spark):
    # doc 2 is a verbatim copy of doc 1 (two aligned 4-token segments):
    # the first occurrence (doc 1) survives, doc 2 collapses to "".
    docs = _docs(
        spark,
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, width=4, scope="corpus").collect()
    }
    assert out[1]["dedup_text"] == "a b c d e f g h"
    assert out[1]["n_kept"] == 2
    assert out[2]["dedup_text"] == ""
    assert out[2]["n_kept"] == 0 and out[2]["n_dropped"] == 2


def test_corpus_scope_first_by_doc_then_index(spark):
    # The shared segment sits at index 1 of doc 1 and index 0 of doc 2:
    # (doc_id, seg_idx) ordering keeps doc 1's copy even though doc 2's
    # occurs at a smaller index.
    docs = _docs(
        spark,
        [(1, "x x x x a b c d"), (2, "a b c d y y y y")],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, width=4, scope="corpus").collect()
    }
    assert out[1]["dedup_text"] == "x x x x a b c d"
    assert out[2]["dedup_text"] == "y y y y"


def test_doc_scope_is_doc_local(spark):
    # Intra-doc repeat removed; the SAME segment in another doc is kept
    # (doc scope never reaches across documents).
    docs = _docs(
        spark,
        [(1, "a b c d a b c d e f"), (2, "a b c d z z z z")],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, width=4, scope="doc").collect()
    }
    assert out[1]["dedup_text"] == "a b c d e f"
    assert out[1]["n_segments"] == 3 and out[1]["n_dropped"] == 1
    assert out[2]["dedup_text"] == "a b c d z z z z"
    assert out[2]["n_dropped"] == 0


def test_short_tail_segment_participates(spark):
    # Tail segments shorter than width dedup like any other segment.
    docs = _docs(spark, [(1, "a b c d e"), (2, "e")])
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, width=4, scope="corpus").collect()
    }
    assert out[1]["dedup_text"] == "a b c d e"
    assert out[2]["dedup_text"] == "" and out[2]["n_dropped"] == 1


def test_empty_doc_row_dropped(spark):
    docs = _docs(spark, [(1, "a b"), (2, "")])
    rows = dedup.segment_dedup(docs, width=4, scope="corpus").collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_bad_scope_raises(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        dedup.segment_dedup(docs, width=4, scope="both")


# ---- exact_substring_dedup (Lee et al. sliding-window protocol) ----


def test_substring_short_docs_untouched(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(docs, n=4).collect()
    }
    # Docs shorter than n carry no window — even verbatim copies stay.
    assert out[1]["clean_text"] == "a b c" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "a b c" and out[2]["n_removed"] == 0


def test_substring_later_copy_scrubbed(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, "a b c d z")])
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(docs, n=4).collect()
    }
    # doc 2's window "a b c d" (start 1) duplicates doc 1's first
    # window; its 4 covered tokens go, the tail token survives.
    assert out[1]["clean_text"] == "a b c d e"
    assert out[2]["clean_text"] == "z" and out[2]["n_removed"] == 4


def test_substring_overlapping_windows_merge(spark):
    # "a b c d e f" appears in both docs: doc 2 holds THREE duplicated
    # 4-windows (starts 1,2,3) whose position union is one maximal
    # 6-token span — the overlap-merge semantics of the paper.
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f x y z w")])
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(docs, n=4).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "x y z w"
    assert out[2]["n_removed"] == 6


def test_substring_intra_doc_repeat(spark):
    # The same window repeated WITHIN one doc: only the first start
    # survives; the union covers the later occurrence.
    docs = _docs(spark, [(1, "a b c d q q a b c d")])
    out = dedup.exact_substring_dedup(docs, n=4).collect()[0]
    assert out["clean_text"] == "a b c d q q"
    assert out["n_removed"] == 4


def test_substring_fully_scrubbed_doc(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    out = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(docs, n=4).collect()
    }
    assert out[1]["clean_text"] == "a b c d"
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 4
