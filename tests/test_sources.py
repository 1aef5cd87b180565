"""Raw corpus sources: tab-split (P1) and polylingual null-language
handling (P6)."""

from mr_lda_spark.sources.corpus import read_raw_corpus, read_raw_corpus_poly


def test_read_raw_corpus_tab_split(spark, tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text(
        "docA\thello world foo\n"
        "malformed line without tab\n"
        "docB\tbar baz\n"
    )
    rows = read_raw_corpus(spark, str(f)).collect()
    got = {r["title"]: r["body"] for r in rows}
    assert got == {"docA": "hello world foo", "docB": "bar baz"}


def test_read_raw_corpus_poly_null_language(spark, tmp_path):
    f = tmp_path / "poly.txt"
    f.write_text(
        "doc1\thello world\tbonjour monde\n"
        "doc2\tnull\tsalut\n"  # language 0 missing (literal null, P6)
        "doc3\tonly english\tnull\n"
    )
    rows = read_raw_corpus_poly(spark, str(f), n_languages=2).collect()
    got = {(r["title"], r["lang"]): r["body"] for r in rows}
    assert got == {
        ("doc1", 0): "hello world",
        ("doc1", 1): "bonjour monde",
        ("doc2", 1): "salut",
        ("doc3", 0): "only english",
    }


def test_jsonl_roundtrip(spark, tmp_path):
    from mr_lda_spark.sources.corpus import read_jsonl_corpus, write_jsonl

    f = tmp_path / "corpus.jsonl"
    f.write_text(
        '{"id": "a", "text": "hello world", "meta": {"src": "web"}}\n'
        "this is not json at all\n"
        '{"id": "b", "text": "second doc"}\n'
        '{"id": null, "text": "no id -> dropped"}\n'
    )
    df = read_jsonl_corpus(spark, str(f))
    got = {r["title"]: (r["body"], r["meta"]) for r in df.collect()}
    assert got == {
        "a": ("hello world", {"src": "web"}),
        "b": ("second doc", None),
    }
    out = str(tmp_path / "sink")
    write_jsonl(df.drop("meta"), out)
    back = spark.read.json(out)
    assert sorted((r["title"], r["body"]) for r in back.collect()) == [
        ("a", "hello world"),
        ("b", "second doc"),
    ]


def test_ldac_corpus_roundtrip(spark, tmp_path):
    """lda-c data-format round trip: 0-based on disk, 1-based back,
    doc identity = line number in doc_id sort order."""
    from mr_lda_spark.sources.corpus import (
        read_ldac_corpus,
        write_ldac_corpus,
    )

    corpus = spark.createDataFrame(
        [
            (7, [1, 3, 9], [2, 1, 4], None),
            (2, [5], [1], None),
        ],
        "doc_id long, term_ids array<int>, term_counts array<int>, gamma array<double>",
    )
    out = str(tmp_path / "ldac")
    write_ldac_corpus(corpus, out)
    back = read_ldac_corpus(spark, out).collect()
    got = sorted((r["line"], r["term_id"], r["term_count"]) for r in back)
    # doc 2 sorts first -> line 0; doc 7 -> line 1.
    assert got == [(0, 5, 1), (1, 1, 2), (1, 3, 1), (1, 9, 4)]
    # On-disk ids are 0-based lda-c convention.
    import glob
    [f] = glob.glob(out + "/part-*")
    lines = open(f).read().splitlines()
    assert lines[0] == "1 4:1"
    assert lines[1] == "3 0:2 2:1 8:4"
