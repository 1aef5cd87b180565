"""U1 pluggable analyzer: custom Python tokenizer via UDF path."""

from mr_lda_spark.operators import parse


def test_custom_analyzer(spark, documents):
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)

    # Defined inside the test so cloudpickle serializes it by value
    # (a module-level function would be pickled by reference to a
    # module the executors can't import).
    def bigram_analyzer(text):
        ws = [t for t in text.split() if t]
        return [f"{a}_{b}" for a, b in zip(ws, ws[1:])]

    docs = documents.limit(20)
    toks = parse.tokenize(docs, analyzer=bigram_analyzer)
    rows = toks.collect()
    assert rows and all("_" in r["term"] for r in rows)
    # Default path unchanged: unigram terms, no underscores from it.
    uni = parse.tokenize(docs).collect()
    assert uni and all("_" not in r["term"] for r in uni)
