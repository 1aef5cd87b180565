"""HyperLogLog sketch (operators/hll.py): register bounds, merge
associativity (shard sketches == one-pass sketch), estimate accuracy
vs the exact distinct count, and determinism across re-evaluation."""

from pyspark.sql import functions as F

from mr_lda_spark.operators import hll, textops


def _keys(documents):
    docs = documents
    return textops.shingles(docs, "text", 5).join(
        docs.select("doc_id", "lang"), "doc_id"
    )


def test_register_bounds(spark, documents):
    regs = hll.hll_registers(_keys(documents), "shingle", ["lang"], p=8)
    rows = regs.collect()
    assert rows, "no registers"
    for r in rows:
        assert 0 <= r["bucket"] < 256
        assert 1 <= r["r"] <= 53
    # at most m registers per group
    per_group = (
        regs.groupBy("lang").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_group <= 256


def test_merge_equals_direct(spark, documents):
    """Register-wise max over per-language sketches must equal the
    direct global sketch — the associativity that makes HLL a
    distributed (partial-aggregable) operator."""
    keys = _keys(documents)
    per_lang = hll.hll_registers(keys, "shingle", ["lang"], p=8)
    merged = {
        (r["bucket"]): r["r"]
        for r in per_lang.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .collect()
    }
    direct = {
        (r["bucket"]): r["r"]
        for r in hll.hll_registers(keys, "shingle", [], p=8).collect()
    }
    assert merged == direct


def test_estimate_within_error_bound(spark, documents):
    """|est - exact| within 5 standard errors (1.04/sqrt(m) each) of
    the true distinct count — a deterministic fixture, so this is a
    fixed assertion, not a flaky statistical one."""
    keys = _keys(documents)
    est_rows = hll.hll_distinct(keys, "shingle", [], p=8).collect()
    assert len(est_rows) == 1
    est = est_rows[0]["est_distinct"]
    exact = keys.select("shingle").distinct().count()
    se = 1.04 / (256 ** 0.5)
    assert abs(est - exact) <= 5 * se * exact, (est, exact)


def test_small_range_uses_linear_counting(spark):
    """With distinct << m the CASE must take the linear-counting
    branch (zeros > 0, raw <= 2.5m) and land near the true count."""
    df = spark.range(40).select(
        F.concat(F.lit("k"), F.col("id")).alias("shingle")
    )
    row = hll.hll_distinct(df, "shingle", [], p=8).collect()[0]
    assert row["used_buckets"] < 256
    assert abs(row["est_distinct"] - 40) <= 8, row


def test_pairwise_sets_identical_and_disjoint(spark):
    from pyspark.sql import functions as F

    # A and B identical (union == each), C disjoint from both
    base = spark.range(4000).select(
        F.concat(F.lit("k"), F.col("id")).alias("shingle")
    )
    a = base.withColumn("src", F.lit("A"))
    b = base.withColumn("src", F.lit("B"))
    c = spark.range(4000, 8000).select(
        F.concat(F.lit("k"), F.col("id")).alias("shingle"),
        F.lit("C").alias("src"),
    )
    keys = a.unionByName(b).unionByName(c)
    regs = hll.hll_registers(keys, "shingle", ["src"], p=8)
    got = {
        (r["a"], r["b"]): r
        for r in hll.hll_pairwise_sets(regs, "src", p=8).collect()
    }
    ab = got[("A", "B")]
    # identical sets: union estimate equals the single-set estimate,
    # so the inclusion-exclusion intersection equals est_a (== est_b)
    assert ab["est_union"] == ab["est_a"] == ab["est_b"]
    assert ab["est_intersection"] == ab["est_a"]
    # disjoint: intersection estimate within sketch noise of zero
    ac = got[("A", "C")]
    assert ac["est_union"] > ac["est_a"]
    assert ac["est_intersection"] <= 0.15 * ac["est_union"]


def test_cumulative_prefix_estimates_monotone(spark):
    """Register-wise max over a growing prefix can only lower the
    scaled harmonic sum, so the cumulative estimate curve must be
    non-decreasing — the invariant behind a uniques-to-date chart."""
    from pyspark.sql import functions as F

    keys = spark.range(6000).select(
        F.concat(F.lit("g"), (F.col("id") % 6)).alias("src"),
        F.concat(F.lit("k"), (F.col("id") % 2500)).alias("shingle"),
    )
    regs = hll.hll_registers(keys, "shingle", ["src"], p=8)
    labels = regs.select("src").distinct()
    cum = (
        labels.alias("k")
        .join(regs.alias("r"), F.col("r.src") <= F.col("k.src"))
        .groupBy(F.col("k.src").alias("src"), F.col("r.bucket"))
        .agg(F.max("r.r").alias("r"))
    )
    curve = [
        r["est_distinct"]
        for r in hll.hll_estimate(cum, ["src"], p=8)
        .orderBy("src")
        .collect()
    ]
    assert curve == sorted(curve)
