"""Path A ↔ Path B sanity: native VB-EM and MLlib online-VB trained on
the same encoded corpus should land in the same quality regime
(SURVEY.md §5 implication 3: held-out perplexity sanity check)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import parse
from mr_lda_spark.plans import lda, mllib_lda

K = 4


@pytest.fixture(scope="module")
def shared_corpus(spark, documents):
    tokens = parse.tokenize(documents)
    dictionary = parse.build_dictionary(
        parse.term_stats(tokens), documents.count()
    )
    corpus_doc = parse.corpus_to_doc_form(parse.encode_corpus(tokens, dictionary))
    return corpus_doc, dictionary.count()


@pytest.mark.slow
def test_native_perplexity_in_mllib_regime(spark, shared_corpus):
    corpus_doc, num_terms = shared_corpus
    _, state = lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=5, max_gamma_iter=20, seed=13,
    )
    assert state.perplexity_history, "instrumentation missing"
    native_ppl = state.perplexity_history[-1]

    model, vecs = mllib_lda.train_mllib(
        corpus_doc, num_terms, K, max_iterations=10, seed=13
    )
    mllib_ppl = float(np.exp(model.logPerplexity(vecs)))

    # Same regime, not equality: both are per-token perplexities on the
    # same corpus; vocabulary is ~30 so both should be far under V and
    # within 2x of each other.
    assert native_ppl < num_terms
    assert mllib_ppl / 2 < native_ppl < mllib_ppl * 2, (native_ppl, mllib_ppl)


def test_instrumentation_recorded(spark, shared_corpus):
    corpus_doc, num_terms = shared_corpus
    _, state = lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=2, max_gamma_iter=5, seed=13,
    )
    assert len(state.iter_seconds) == len(state.history) == 2
    assert all(s > 0 for s in state.iter_seconds)
    assert state.total_tokens > 0
    # Perplexity should improve (or hold) as ELBO rises.
    assert state.perplexity_history[-1] <= state.perplexity_history[0] * 1.001


@pytest.mark.slow
def test_snapshots_written(spark, shared_corpus, tmp_path):
    corpus_doc, num_terms = shared_corpus
    out = str(tmp_path / "snaps")
    lda.train(
        spark, corpus_doc, num_terms, K,
        max_iterations=2, max_gamma_iter=5, seed=13, snapshot_dir=out,
    )
    import json
    import os

    assert os.path.isdir(os.path.join(out, "gamma-1"))
    assert os.path.isdir(os.path.join(out, "gamma-2"))
    meta = json.load(open(os.path.join(out, "alpha-2.json")))
    assert len(meta["alpha"]) == K and len(meta["perplexity"]) == 2
    # Resume from the snapshot (reference -modelindex semantics).
    gamma = spark.read.parquet(os.path.join(out, "gamma-2"))
    warm = corpus_doc.drop("gamma").join(gamma, "doc_id", "left")
    _, s2 = lda.train(
        spark, warm, num_terms, K, max_iterations=1, max_gamma_iter=5, seed=13
    )
    assert len(s2.history) == 1


@pytest.mark.slow
def test_mllib_seeded_train_is_partition_dependent(spark, shared_corpus):
    """The evidence behind lda_mllib_topics staying rows-only forever
    (VERDICT r10 #6): a fixed seed does NOT pin MLlib LDA across
    partitionings, because OnlineLDAOptimizer.submitMiniBatch samples
    each mini-batch with RDD.sample (XORShiftRandom seeded per
    (seed, partitionIndex)) — so the two-geometry golden-freeze
    technique can never produce a stable expectation.  If Spark ever
    makes this partition-independent, this test goes red and the row
    can be golden-frozen after all."""
    corpus_doc, num_terms = shared_corpus
    mats = []
    for nparts in (2, 16):
        model, _ = mllib_lda.train_mllib(
            corpus_doc.repartition(nparts),
            num_terms,
            K,
            max_iterations=3,
            seed=20260815,
        )
        mats.append(np.asarray(model.topicsMatrix().toArray()))
    assert float(np.abs(mats[0] - mats[1]).max()) > 1e-9


@pytest.mark.slow
def test_native_seeded_train_is_partition_independent(spark, shared_corpus):
    """The contrast that makes the native path golden-freezable where
    MLlib is not: plans/lda seeds gamma init by hashing doc_id, so the
    trained beta is bit-stable (to combine jitter) across corpus
    partitionings."""
    corpus_doc, num_terms = shared_corpus
    betas = []
    for nparts in (2, 16):
        _, state = lda.train(
            spark,
            corpus_doc.repartition(nparts),
            num_terms,
            K,
            max_iterations=2,
            max_gamma_iter=5,
            gamma_tol=0.0,
            converge=0.0,
            seed=20260815,
        )
        betas.append(state.elog_beta.copy())
    assert float(np.abs(betas[0] - betas[1]).max()) < 1e-8
