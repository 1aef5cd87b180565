"""Bucketed co-located join: pre-bucketing both fact tables on the
join key removes the per-query shuffle — the 100 TB strategy claimed in
README/SURVEY, demonstrated on the real plans."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.session import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .option("path", str(wh / "li_bucketed"))
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .option("path", str(wh / "o_bucketed"))
        .saveAsTable("o_bucketed")
    )
    return spark.table("li_bucketed"), spark.table("o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, o = bucketed
    # Disable auto-broadcast so the join strategy is the bucketed SMJ,
    # not a broadcast that would hide the exchange question.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # The join itself must not re-shuffle either bucketed side: the
        # only exchange allowed is the one for the final groupBy.
        join_section = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan, plan[:500]
        assert join_section.count("Exchange") == 0, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_correct(spark, bucketed):
    li, o = bucketed
    got = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)))
        .collect()[0][0]
    )
    want = (
        read_table(spark, SF, "lineitem")
        .join(
            read_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count(F.lit(1)))
        .collect()[0][0]
    )
    assert got == want
