"""Type-2 SCD construction (operators/scd.py): run collapsing,
interval chaining, null-state transitions, determinism under ties."""

from mr_lda_spark.operators.scd import scd2


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "k string, state string, ts long, id long"
    )


def _scd(spark, rows):
    df = scd2(_rows(spark, rows), "k", ["state"], ["ts", "id"], "ts")
    return sorted(
        (
            (r["k"], r["version"], r["state"], r["valid_from"],
             r["valid_to"], r["n_obs"], r["is_current"])
            for r in df.collect()
        )
    )


def test_runs_collapse_and_chain(spark):
    rows = [
        ("a", "x", 1, 1),
        ("a", "x", 2, 2),
        ("a", "y", 3, 3),
        ("a", "x", 4, 4),
    ]
    assert _scd(spark, rows) == [
        ("a", 1, "x", 1, 3, 2, False),
        ("a", 2, "y", 3, 4, 1, False),
        ("a", 3, "x", 4, None, 1, True),
    ]


def test_null_is_a_distinct_state(spark):
    rows = [
        ("a", "x", 1, 1),
        ("a", None, 2, 2),
        ("a", None, 3, 3),
        ("a", "y", 4, 4),
    ]
    got = _scd(spark, rows)
    assert [g[1:3] for g in got] == [
        (1, "x"), (2, None), (3, "y")
    ]
    # intervals chain with no gap: each valid_to = next valid_from
    assert [g[3] for g in got] == [1, 2, 4]
    assert [g[4] for g in got] == [2, 4, None]


def test_single_observation_is_current(spark):
    got = _scd(spark, [("a", "x", 5, 1)])
    assert got == [("a", 1, "x", 5, None, 1, True)]


def test_keys_are_independent(spark):
    rows = [
        ("a", "x", 1, 1),
        ("b", "y", 1, 2),
        ("a", "y", 2, 3),
    ]
    got = _scd(spark, rows)
    assert [g[:2] for g in got] == [("a", 1), ("a", 2), ("b", 1)]


def test_tie_on_ts_broken_by_id(spark):
    # same ts, id decides order: x(id=1) then y(id=2) -> two versions
    rows = [("a", "x", 1, 1), ("a", "y", 1, 2)]
    got = _scd(spark, rows)
    assert [g[1:3] for g in got] == [(1, "x"), (2, "y")]
