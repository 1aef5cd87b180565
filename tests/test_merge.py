"""Relational MERGE semantics (SCD1 upsert / delete)."""

from mr_lda_spark.operators.merge import merge_delete, merge_upsert


def test_merge_upsert_updates_and_inserts(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_delete_removes_matching_keys(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    tomb = spark.createDataFrame([(2,), (9,)], "k long")
    got = sorted(r["k"] for r in merge_delete(base, tomb, ["k"]).collect())
    assert got == [1, 3]
