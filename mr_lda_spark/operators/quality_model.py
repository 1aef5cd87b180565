"""Quality-classifier training: distill a cheap linear model from a
teacher signal and serve it relationally.

This completes the model-based-quality-filter loop whose inference half
is ``textops.quality_model_score``: a pretraining pipeline (CCNet /
DCLM / fastText-classifier style) trains a small classifier on labeled
examples — positives from a curated set or an expensive teacher
(LLM judge, heuristic ensemble), negatives from raw web — then scores
the whole corpus with it.  Here:

- **Features** are the four cheap per-document statistics from
  ``textops.quality_scores`` (token count, mean word length, stop-word
  ratio, digit ratio) — all codegen projections, no shuffle.
- **Teacher labels** default to thresholding the heuristic composite
  score (the distillation pattern: student mimics the teacher on cheap
  features); any (doc_id, label) DataFrame can be supplied instead.
- **Training** is ``pyspark.ml`` ``LogisticRegression`` — distributed
  L-BFGS over the assembled feature vectors, so the fit itself scales
  with executors (at 100 TB one would fit on a deterministic
  ``hash_sample`` of the corpus; the sampler is in ``curation``).
- **Serving** does NOT use ``model.transform`` (row-at-a-time vector
  UDF): the learned coefficients are inlined as literals into a plain
  codegen expression, identical in shape to ``quality_model_score`` —
  zero shuffle, whole-stage codegen, broadcast-free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_lda_spark.operators.textops import quality_scores

FEATURES = ["n_tokens", "mean_word_len", "stop_ratio", "digit_ratio"]


def teacher_labels(
    docs: DataFrame, threshold: float = 0.6, text_col: str = "text"
) -> DataFrame:
    """Default teacher: binarize the heuristic composite score."""
    return quality_scores(docs, text_col).select(
        "doc_id",
        *(F.col(c) for c in FEATURES),
        (F.col("quality_score") >= threshold).cast("double").alias("label"),
    )


def train_quality_classifier(
    docs: DataFrame,
    labels: Optional[DataFrame] = None,
    threshold: float = 0.6,
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> dict:
    """Fit the linear student; return plain-float weights (not a model
    object) so serving can stay relational.

    Returns ``{"coef": {feature: w}, "intercept": b,
    "train_agreement": frac}`` where agreement is the student's accuracy
    against the teacher on the training set.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = teacher_labels(docs, threshold, text_col)
    if labels is not None:
        feats = feats.drop("label").join(labels, "doc_id")
    assembled = VectorAssembler(
        inputCols=FEATURES, outputCol="features"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(assembled)
    coef = {f: float(w) for f, w in zip(FEATURES, model.coefficients)}
    pred = model.transform(assembled)
    agree = pred.select(
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias("a")
    ).first()["a"]
    return {
        "coef": coef,
        "intercept": float(model.intercept),
        "train_agreement": float(agree),
    }


def score_with_model(
    docs: DataFrame, model: dict, text_col: str = "text",
    decimal_exact: bool = False,
) -> DataFrame:
    """Serve the trained weights as a pure codegen expression: one
    narrow projection over the feature relation, learned weights inlined
    as literals (no broadcast, no UDF, no shuffle beyond the feature
    computation itself).

    ``decimal_exact=True`` accumulates the margin in DECIMAL(18,6)
    arithmetic instead of double.  The features are already rounded to
    6 decimals, so decimal products/sums are *exact* and bit-identical
    across engines — double accumulation differs in the last ulp
    between JVM and C float association, which flips the 6th rounded
    decimal on knife-edge rows.  Doubles are the fast path for serving;
    decimal is for cross-engine-reproducible audits.
    """
    feats = quality_scores(docs, text_col)
    if decimal_exact:
        dec = "decimal(18,6)"
        margin = F.lit(str(model["intercept"])).cast(dec)
        for f_name in FEATURES:
            margin = margin + (
                F.lit(str(model["coef"][f_name])).cast(dec)
                * F.col(f_name).cast(dec)
            )
        margin_d = margin.cast("double")
    else:
        margin = F.lit(model["intercept"])
        for f_name in FEATURES:
            margin = margin + F.lit(model["coef"][f_name]) * F.col(f_name)
        margin_d = margin
    return feats.select(
        "doc_id",
        F.round(margin, 6).cast("double").alias("margin"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin_d)), 6).alias(
            "model_prob"
        ),
        (margin > 0).alias("keep"),
    )
