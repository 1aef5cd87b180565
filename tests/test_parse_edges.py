"""Edge semantics of the parse pipeline (P5/P7 collapse behavior)."""

from pyspark.sql import functions as F

from mr_lda_spark.operators import parse


def test_collapsed_documents_drop_out(spark):
    """A doc whose every term is OOV/stop-listed produces no rows —
    the COLLAPSED_DOCUMENTS semantics of ParseCorpus.java:588-591."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, "the the the"),  # all stopwords → collapses
            (3, "beta gamma"),
        ],
        "doc_id long, text string",
    )
    tokens = parse.tokenize(docs, stopwords=["the"])
    stats = parse.term_stats(tokens)
    dictionary = parse.build_dictionary(stats, 3)
    corpus = parse.encode_corpus(tokens, dictionary)
    assert sorted(
        set(r["doc_id"] for r in corpus.collect())
    ) == [1, 3]


def test_oov_terms_dropped_by_df_filter(spark):
    docs = spark.createDataFrame(
        [(i, "common rare" if i == 0 else "common") for i in range(10)],
        "doc_id long, text string",
    )
    tokens = parse.tokenize(docs)
    stats = parse.term_stats(tokens)
    # min_df 20% of 10 docs = 2 → 'rare' (df=1) is out-of-dictionary.
    dictionary = parse.build_dictionary(stats, 10, min_df_frac=0.2)
    assert [r["term"] for r in dictionary.collect()] == ["common"]
    corpus = parse.encode_corpus(tokens, dictionary)
    assert corpus.filter(F.col("doc_id") == 0).count() == 1  # only 'common'


def test_empty_dictionary_yields_empty_corpus(spark):
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    tokens = parse.tokenize(docs)
    stats = parse.term_stats(tokens)
    dictionary = parse.build_dictionary(stats, 1, min_df_frac=5.0)  # nothing passes
    assert dictionary.count() == 0
    assert parse.encode_corpus(tokens, dictionary).count() == 0


def test_duplicate_token_counts(spark):
    docs = spark.createDataFrame([(7, "w w w v")], "doc_id long, text string")
    tokens = parse.tokenize(docs)
    dictionary = parse.build_dictionary(parse.term_stats(tokens), 1)
    corpus = parse.encode_corpus(tokens, dictionary)
    got = {r["term_id"]: r["term_count"] for r in corpus.collect()}
    terms = {r["term"]: r["term_id"] for r in dictionary.collect()}
    assert got[terms["w"]] == 3 and got[terms["v"]] == 1
