"""SQL-first usage: everything runnable through spark.sql over the
registered views, agreeing with the DataFrame API."""

import duckdb

from mr_lda_spark import sql_catalog
from mr_lda_spark.operators import parse

SF = "/root/testdata/sf0.001"


def test_register_and_query(spark):
    names = sql_catalog.register_tables(spark, SF)
    assert set(names) >= {"lineitem", "documents", "events"}
    out = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """
    ).collect()
    assert sum(r["n"] for r in out) == 6000


def test_sql_matches_dataframe_api(spark):
    sql_catalog.register_tables(spark, SF)
    via_sql = spark.sql(
        """
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
        FROM (SELECT doc_id, explode(split(text, '\\\\s+')) AS term
              FROM documents)
        WHERE term <> ''
        GROUP BY term
        """
    ).collect()
    docs = spark.table("documents")
    via_df = parse.term_stats(parse.tokenize(docs)).collect()
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))


def test_unicode_text_parity_with_duckdb(spark, tmp_path):
    """Unicode-safe tokenize + md5: Spark and DuckDB must agree on
    UTF-8 content digests and token counts."""
    rows = [
        (0, "café naïve 模型 データ processing"),
        (1, "émile zürich 北京 tokyo"),
        (2, "ascii only words here"),
    ]
    p = str(tmp_path / "u.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)

    from pyspark.sql import functions as F

    sdf = (
        spark.read.parquet(p)
        .select(
            "doc_id",
            F.md5("text").alias("h"),
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"),
        )
        .collect()
    )
    got = sorted((r["doc_id"], r["h"], r["n"]) for r in sdf)
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            SELECT doc_id, md5(text) AS h,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                        AS INT) AS n
            FROM '{p}/*.parquet' ORDER BY doc_id
            """
        ).fetchall()
    )
    assert got == want
