"""O4 streaming reduce: must agree with relational aggregation, and
groups must arrive whole and sorted."""

from pyspark.sql import functions as F

from mr_lda_spark.operators.secondary_sort import streaming_group_reduce
from mr_lda_spark.session import ensure_package_shipped, read_table

SF = "/root/testdata/sf0.001"


def test_streaming_reduce_matches_groupby(spark):
    ensure_package_shipped(spark)
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )

    def reduce_group(key, grp):
        # The MapReduce contract: rows of the group arrive sorted.
        ln = grp["l_linenumber"].tolist()
        assert ln == sorted(ln), "group not sorted within partition"
        return {
            "l_orderkey": int(key),
            "n": len(grp),
            "qty": float(grp["l_quantity"].sum()),
        }

    out = streaming_group_reduce(
        li,
        partition_key="l_orderkey",
        sort_key="l_linenumber",
        reduce_group=reduce_group,
        out_schema="l_orderkey long, n long, qty double",
    )
    got = {r["l_orderkey"]: (r["n"], round(r["qty"], 6)) for r in out.collect()}
    want = {
        r["l_orderkey"]: (r["n"], round(r["qty"], 6))
        for r in li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    assert got == want


def test_countvectorizer_crosscheck(spark, documents):
    """SURVEY §7.1 step 2: MLlib CountVectorizer as a dictionary
    cross-check — same vocabulary set under the same df filter (ids
    differ: CV orders by tf, ours by df/tf per the reference)."""
    from pyspark.ml.feature import CountVectorizer, RegexTokenizer

    from mr_lda_spark.operators import parse

    tok = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=r"\s+"
    ).transform(documents)
    cv = CountVectorizer(
        inputCol="toks", outputCol="vec", minDF=2.0
    ).fit(tok)

    tokens = parse.tokenize(documents)
    stats = parse.term_stats(tokens)
    ours = parse.build_dictionary(stats, documents.count()).filter(
        F.col("df") >= 2
    )
    assert set(cv.vocabulary) == {r["term"] for r in ours.collect()}
