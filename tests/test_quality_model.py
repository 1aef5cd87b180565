"""Distilled quality classifier: train on teacher labels, serve
relationally, agree with the teacher."""

from pyspark.sql import functions as F

from mr_lda_spark.operators import quality_model as qm


def test_student_learns_teacher(spark, documents):
    model = qm.train_quality_classifier(documents)
    # The teacher is a (mostly) linear function of the same features —
    # the student must track it closely on its own training set.
    assert model["train_agreement"] >= 0.9
    assert set(model["coef"]) == set(qm.FEATURES)


def test_relational_serving_matches_mllib_decision(spark, documents):
    model = qm.train_quality_classifier(documents)
    served = qm.score_with_model(documents, model)
    teacher = qm.teacher_labels(documents)
    joined = served.join(teacher.select("doc_id", "label"), "doc_id")
    agree = joined.select(
        F.avg(
            (F.col("keep").cast("double") == F.col("label")).cast("double")
        ).alias("a")
    ).first()["a"]
    assert agree >= 0.9
    # Probabilities are valid and the margin is finite.
    row = served.agg(
        F.min("model_prob").alias("lo"), F.max("model_prob").alias("hi")
    ).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_serving_plan_is_shuffle_free(spark, documents):
    model = qm.train_quality_classifier(documents)
    plan = qm.score_with_model(documents, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow projection
