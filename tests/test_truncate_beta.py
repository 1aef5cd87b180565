"""Working version of the reference's disabled -truncatebeta feature."""

import numpy as np
import pytest

from mr_lda_spark.operators import parse
from mr_lda_spark.plans import lda
from mr_lda_spark.plans.lda import DEFAULT_LOG_ETA

K = 3


@pytest.fixture(scope="module")
def encoded(spark, documents):
    tokens = parse.tokenize(documents)
    dictionary = parse.build_dictionary(parse.term_stats(tokens), documents.count())
    return parse.corpus_to_doc_form(parse.encode_corpus(tokens, dictionary)), dictionary.count()


def test_truncation_keeps_topn_floors_rest(spark, encoded):
    corpus_doc, num_terms = encoded
    n_keep = 5
    _, state = lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=2, max_gamma_iter=5, seed=2, truncate_beta=n_keep,
    )
    eb = state.elog_beta[1:]
    for k in range(K):
        col = eb[:, k]
        kept = np.sum(col > DEFAULT_LOG_ETA)
        assert kept <= n_keep + 1e-9, f"topic {k}: {kept} > {n_keep}"
        assert np.all(col[col <= DEFAULT_LOG_ETA] == DEFAULT_LOG_ETA)


def test_no_truncation_when_n_ge_vocab(spark, encoded):
    corpus_doc, num_terms = encoded
    _, full = lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=2, max_gamma_iter=5, seed=2,
    )
    _, trunc = lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=2, max_gamma_iter=5, seed=2, truncate_beta=num_terms,
    )
    # Same code path; tolerance covers last-ulp jitter from shuffle
    # arrival order in the relational phi combine.
    np.testing.assert_allclose(
        full.elog_beta, trunc.elog_beta, rtol=1e-9, atol=1e-12
    )
