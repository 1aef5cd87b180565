"""Bin-bucketed interval-overlap join: exactness vs brute force,
endpoint inclusivity, multi-bucket dedup, and plan shape (no
cartesian product)."""

import random

from pyspark.sql import functions as F

from mr_lda_spark.operators.intervals import interval_overlap_pairs


def _brute(rows):
    out = set()
    for a in rows:
        for b in rows:
            if (a[0],) < (b[0],) and b[1] <= a[2] and a[1] <= b[2]:
                out.add((a[0], b[0], min(a[2], b[2]) - max(a[1], b[1])))
    return out


def test_overlap_matches_brute_force_random(spark):
    rng = random.Random(13)
    rows = [
        (i, s := rng.randrange(0, 10_000), s + rng.randrange(0, 500))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    got = {
        (r["id_a"], r["id_b"], r["overlap"])
        for r in interval_overlap_pairs(df, ["id"], "s", "e", 250).collect()
    }
    assert got == _brute(rows)


def test_touching_endpoints_and_bucket_spans(spark):
    rows = [
        (1, 0, 100),     # touches 2 at 100 exactly
        (2, 100, 400),   # spans several 100-buckets (dedup matters)
        (3, 150, 160),   # inside 2
        (4, 401, 500),   # disjoint from 2 by 1 unit
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    got = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in interval_overlap_pairs(df, ["id"], "s", "e", 100).collect()
    }
    assert got == {(1, 2): 0, (2, 3): 10}


def test_plan_has_no_cartesian_product(spark):
    df = spark.createDataFrame([(1, 0, 10)], "id long, s long, e long")
    plan = (
        interval_overlap_pairs(df, ["id"], "s", "e", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
