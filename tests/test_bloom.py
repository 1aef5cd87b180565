"""Bloom membership gate (operators/bloom.py): exact-parity with the
string-broadcast decontamination path, superset/pruning contract of
the prefilter, and the Arrow-not-pickled plan shape."""
import pytest

from pyspark.sql import functions as F

from mr_lda_spark.operators import bloom, textops


def _splits(documents):
    ev = documents.filter(F.col("doc_id") % 10 == 0)
    tr = documents.filter(F.col("doc_id") % 10 != 0)
    return tr, ev


@pytest.mark.slow
def test_bloom_decontaminate_matches_plain(spark, documents):
    tr, ev = _splits(documents)
    plain = sorted(map(tuple, textops.decontaminate(tr, ev, n=5).collect()))
    via_bloom = sorted(
        map(tuple, textops.decontaminate_bloom(tr, ev, n=5).collect())
    )
    assert plain == via_bloom
    assert any(r[2] for r in plain), "fixture must contain contamination"


def test_prefilter_is_superset_and_prunes(spark, documents):
    tr, ev = _splits(documents)
    doc_ng = textops.shingles(tr, "text", 5).distinct()
    ev_ng = textops.shingles(ev, "text", 5).select("shingle").distinct()
    n_keys = ev_ng.count()
    words, m = bloom.bloom_build(ev_ng, "shingle", n_keys)
    cand = set(
        r["shingle"]
        for r in bloom.bloom_prefilter(doc_ng, "shingle", words, m)
        .select("shingle")
        .distinct()
        .collect()
    )
    true = set(
        r["shingle"]
        for r in doc_ng.join(ev_ng, "shingle").select("shingle").distinct().collect()
    )
    total = doc_ng.select("shingle").distinct().count()
    assert true <= cand, "Bloom must never drop a true member"
    # At 12 bits/key, 6 hashes the fp rate is ~0.3%; anything under a
    # tenth of the corpus proves the gate actually gates.
    assert len(cand) < total / 10, (len(cand), total)


def test_empty_reference_set(spark, documents):
    tr, _ = _splits(documents)
    empty = documents.filter(F.lit(False))
    out = textops.decontaminate_bloom(tr, empty, n=5)
    assert out.filter(F.col("contaminated")).count() == 0
    assert out.count() == tr.count()


def test_bloom_probe_is_arrow_not_pickled(spark, documents):
    tr, ev = _splits(documents)
    plan = (
        textops.decontaminate_bloom(tr, ev, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_pruned_join_equals_plain_join(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.bloom import bloom_pruned_join

    big = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    small = spark.range(0, 5000, 83).select(
        F.col("id").alias("k"), F.lit("dim").alias("d")
    )
    got = sorted(
        (r["k"], r["v"], r["d"])
        for r in bloom_pruned_join(big, small, "k").collect()
    )
    want = sorted(
        (r["k"], r["v"], r["d"])
        for r in big.join(small, "k").collect()
    )
    assert got == want and len(got) == len(range(0, 5000, 83))


def test_bloom_pruned_join_empty_small_side(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.bloom import bloom_pruned_join

    big = spark.range(100).select(F.col("id").alias("k"))
    small = spark.range(0).select(F.col("id").alias("k"))
    assert bloom_pruned_join(big, small, "k").count() == 0


def test_jvm_prefilter_equals_udf_prefilter(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators import bloom

    ref = spark.range(0, 1000, 13).select(F.col("id").alias("k"))
    words, m = bloom.bloom_build(ref, "k", n_keys=100)
    big = spark.range(2000).select(F.col("id").alias("k"))
    via_udf = sorted(
        r["k"] for r in bloom.bloom_prefilter(big, "k", words, m).collect()
    )
    via_jvm = sorted(
        r["k"]
        for r in bloom.bloom_prefilter_jvm(big, "k", words, m).collect()
    )
    assert via_udf == via_jvm
    assert set(range(0, 1000, 13)) <= set(via_jvm)
