"""Exact distributed quantiles: DuckDB quantile_disc equivalence on
randomized data, heavy-tie termination, tiny-survivor thresholds, and
the rank rule's boundary cases."""

import random

import duckdb
import pytest

from mr_lda_spark.operators.quantile import exact_quantiles

PS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0]


def _duck(vals, ps):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    return {
        p: con.execute(
            f"SELECT quantile_disc(x, {p!r}) FROM t"
        ).fetchone()[0]
        for p in ps
    }


def _spark_q(spark, vals, ps, **kw):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    return {
        r["p"]: r["value"]
        for r in exact_quantiles(df, "x", ps, **kw).collect()
    }


def test_matches_duckdb_on_random_floats(spark):
    rng = random.Random(11)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(5000)]
    # force the iterative path: tiny threshold -> several rounds
    got = _spark_q(spark, vals, PS, threshold=64, n_buckets=32)
    assert got == _duck(vals, PS)


def test_matches_duckdb_with_heavy_ties(spark):
    rng = random.Random(5)
    vals = [float(rng.choice([1, 1, 1, 2, 7, 7, 9])) for _ in range(3000)]
    # one value dominates: refinement must terminate via the
    # bucket-collapses-to-one-value rule, not range shrinkage
    got = _spark_q(spark, vals, PS, threshold=16, n_buckets=8)
    assert got == _duck(vals, PS)


@pytest.mark.slow
def test_matches_duckdb_small_n_rank_boundaries(spark):
    for n in (1, 2, 3, 4, 5, 6, 10):
        vals = [float(i) for i in range(1, n + 1)]
        got = _spark_q(spark, vals, PS, threshold=2, n_buckets=4)
        assert got == _duck(vals, PS), f"n={n}"


def test_integer_column_is_cast_once(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    got = {
        r["p"]: r["value"]
        for r in exact_quantiles(df, "x", [0.5]).collect()
    }
    assert got == {0.5: 49.0}


def test_nulls_ignored_and_empty_input(spark):
    df = spark.createDataFrame(
        [(None,), (3.0,), (None,), (1.0,), (2.0,)], "x double"
    )
    got = {
        r["p"]: r["value"]
        for r in exact_quantiles(df, "x", [0.5]).collect()
    }
    assert got == {0.5: 2.0}
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5]).collect() == []


def test_grouped_matches_duckdb(spark):
    rng = random.Random(3)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.uniform(0, 1000))
        for _ in range(4000)
    ] + [("solo", 42.0)]  # single-row group
    df = spark.createDataFrame(rows, "g string, x double")
    ps = [0.25, 0.5, 0.9]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_quantiles(
            df, "x", ps, by=["g"], threshold=32, n_buckets=16
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {}
    for p in ps:
        for g, v in con.execute(
            f"SELECT g, quantile_disc(x, {p!r}) FROM t GROUP BY g"
        ).fetchall():
            want[(g, p)] = v
    assert got == want
