"""Salted join ≡ plain join, with the shuffle spread across salts."""

from pyspark.sql import functions as F

from mr_lda_spark.operators.skew import salted_join
from mr_lda_spark.session import read_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
    )
    salted = (
        salted_join(li, o, "l_orderkey", n_salts=4)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_skewed_key(spark):
    # Degenerate skew: every big row shares ONE key.
    big = spark.range(0, 10000).select(
        F.lit(7).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(7, "hot"), (8, "cold")], "k int, label string")
    out = salted_join(big, small, "k", n_salts=8)
    assert out.count() == 10000
    assert out.select("label").distinct().collect()[0][0] == "hot"
