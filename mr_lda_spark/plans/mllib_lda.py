"""Path A — MLlib-backed LDA (SURVEY.md §7.0).

Covers vanilla train/inference via ``pyspark.ml.clustering.LDA`` and
serves as a correctness cross-check for the native VB-EM path.  The
native path remains required for informed priors η, polylingual LDA,
and asymmetric-α re-estimation (MLlib cannot express those).
"""

from __future__ import annotations

from pyspark.ml.clustering import LDA
from pyspark.ml.linalg import Vectors, VectorUDT
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def corpus_to_vectors(corpus_doc: DataFrame, num_terms: int) -> DataFrame:
    """Doc-form corpus → (doc_id, features SparseVector).

    Dictionary ids are 1-based (index 0 reserved, README.md:61); MLlib
    vectors are 0-based, so slot v holds term_id v (size V+1, slot 0
    always empty) to keep the id mapping trivial.

    Arrow-batched (``useArrow=True`` → ArrowEvalPython): the inputs
    cross to Python as Arrow columns, not pickled rows — VectorUDT has
    no built-in constructor expression, so a Python UDF is unavoidable
    here, but it need not be the row-serialized kind.
    """
    size = num_terms + 1

    @F.udf(returnType=VectorUDT(), useArrow=True)
    def to_vec(term_ids, term_counts):
        pairs = sorted(zip(term_ids, term_counts))
        return Vectors.sparse(
            size, [int(t) for t, _ in pairs], [float(c) for _, c in pairs]
        )

    return corpus_doc.select(
        "doc_id", to_vec("term_ids", "term_counts").alias("features")
    )


def train_mllib(
    corpus_doc: DataFrame,
    num_terms: int,
    num_topics: int,
    max_iterations: int = 20,
    seed: int = 42,
    optimizer: str = "online",
):
    """Fit MLlib LDA; returns (model, vectorized corpus)."""
    vecs = corpus_to_vectors(corpus_doc, num_terms)
    model = LDA(
        k=num_topics,
        maxIter=max_iterations,
        seed=seed,
        optimizer=optimizer,
        featuresCol="features",
    ).fit(vecs)
    return model, vecs


def mllib_beta(model, spark: SparkSession) -> DataFrame:
    """Export MLlib topics in the engine's tall BETA schema
    (topic, term_id, log_beta)."""
    import numpy as np

    tm = model.topicsMatrix().toArray()  # (V+1, K) term-major
    with np.errstate(divide="ignore"):
        log_beta = np.log(tm / tm.sum(axis=0, keepdims=True))
    rows = [
        (int(k), int(v), float(log_beta[v, k]))
        for v in range(1, tm.shape[0])
        for k in range(tm.shape[1])
        if np.isfinite(log_beta[v, k])
    ]
    from mr_lda_spark.schemas import BETA

    return spark.createDataFrame(rows, schema=BETA)
