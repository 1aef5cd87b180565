"""Shape stress: larger K than documents' natural topic count and a
sanity pass on the invariants at that scale."""

import numpy as np

from mr_lda_spark.operators import parse
from mr_lda_spark.plans import lda


def test_k16_single_iteration(spark, documents):
    tokens = parse.tokenize(documents)
    dictionary = parse.build_dictionary(
        parse.term_stats(tokens), documents.count()
    )
    corpus_doc = parse.corpus_to_doc_form(
        parse.encode_corpus(tokens, dictionary)
    )
    num_terms = dictionary.count()
    K = 16
    final, state = lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=2, max_gamma_iter=8, seed=99, gamma_tol=1e-4,
    )
    assert state.elog_beta.shape == (num_terms + 1, K)
    assert state.alpha.shape == (K,)
    mass = np.exp(state.elog_beta[1:]).sum(axis=0)
    assert np.all(mass <= 1.0 + 1e-9) and np.all(mass > 0.1)
    row = final.limit(1).collect()[0]
    assert len(row["gamma"]) == K
    # ELBO non-decreasing even at K >> natural topic count.
    h = state.history
    assert h[1] >= h[0] - abs(h[0]) * 1e-6
