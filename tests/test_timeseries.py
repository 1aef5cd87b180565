"""Edge semantics of the timeseries operators: RANGE-frame boundary
inclusivity, equal-timestamp peers, spine completeness, gap marking,
and forward-fill carry."""

import datetime as dt

from pyspark.sql import functions as F

from mr_lda_spark.operators import timeseries

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_rolling_range_boundaries_inclusive(spark):
    # Window = 10 min: a row exactly 10 min back is IN (inclusive lower
    # bound), 10 min + 1 us back is OUT.
    rows = [
        ("u", _ts(0), 1),
        ("u", _ts(10), 10),   # sees minute-0 row (exactly window back)
        ("u", _ts(20) + dt.timedelta(microseconds=1), 100),  # not min-10
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v long")
    out = timeseries.rolling_range_agg(
        df, "user", "ts", 10 * 60 * 1_000_000, {"s": F.sum("v")}
    )
    got = {r["v"]: r["s"] for r in out.collect()}
    assert got == {1: 1, 10: 11, 100: 100}


def test_rolling_range_equal_ts_are_peers(spark):
    # RANGE frame: rows with the same timestamp see each other in both
    # orders — no tiebreak needed for determinism.
    rows = [("u", _ts(0), 2), ("u", _ts(0), 3)]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v long")
    out = timeseries.rolling_range_agg(
        df, "user", "ts", 60_000_000, {"s": F.sum("v")}
    )
    assert [r["s"] for r in out.collect()] == [5, 5]


def test_rolling_partitions_do_not_leak(spark):
    rows = [("a", _ts(0), 1), ("b", _ts(1), 7)]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v long")
    out = timeseries.rolling_range_agg(
        df, "user", "ts", 3_600_000_000, {"s": F.sum("v")}
    )
    assert {(r["user"], r["s"]) for r in out.collect()} == {("a", 1), ("b", 7)}


def test_gap_fill_marks_and_carries(spark):
    # Hours 0, 3 present; 1-2 are gaps carrying hour-0's value.
    rows = [("t", _ts(0), 5), ("t", _ts(180), 9)]
    df = spark.createDataFrame(rows, "g string, h timestamp, cents long")
    out = timeseries.gap_fill(df, ["g"], "h", ["cents"]).orderBy("h")
    got = [(r["was_gap"], r["cents"], r["cents_ff"]) for r in out.collect()]
    assert got == [
        (False, 5, 5),
        (True, None, 5),
        (True, None, 5),
        (False, 9, 9),
    ]


def test_gap_fill_spine_is_per_group(spark):
    # Group spans differ; each group's spine covers only its own range.
    rows = [
        ("a", _ts(0), 1),
        ("a", _ts(120), 2),
        ("b", _ts(60), 3),
    ]
    df = spark.createDataFrame(rows, "g string, h timestamp, cents long")
    out = timeseries.gap_fill(df, ["g"], "h", ["cents"])
    counts = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"a": 3, "b": 1}


def test_time_spine_single_bucket_group(spark):
    df = spark.createDataFrame(
        [("x", _ts(0))], "g string, h timestamp"
    )
    spine = timeseries.time_spine(df, ["g"], "h")
    assert spine.count() == 1

def test_salted_rolling_matches_plain_on_adversarial_edges(spark):
    """The salted decomposition must be bit-equal to the plain window
    on every boundary it reasons about: ts exactly on a bucket edge,
    left edge (t - W) hitting a real row exactly (inclusive), ties in
    both the current and previous bucket, keys with a single bucket,
    and keys with empty previous buckets."""
    W = 10 * 60 * 1_000_000  # 10 min
    rows = [
        # key "u": rows straddling 3 buckets incl. exact edges
        ("u", _ts(0), 1), ("u", _ts(0), 2),            # tie at bucket start
        ("u", _ts(9), 4),
        ("u", _ts(10), 8),                             # exactly next bucket edge
        ("u", _ts(19), 16), ("u", _ts(19), 32),        # tie near edge
        ("u", _ts(20), 64),                            # left edge hits _ts(10)
        ("u", _ts(35), 128),                           # prev bucket empty-ish
        # key "v": everything inside one bucket
        ("v", _ts(2), 1000), ("v", _ts(3), 2000),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v long")
    plain = timeseries.rolling_range_agg(
        df, "user", "ts", W,
        {"s": F.sum("v"), "n": F.count(F.lit(1))},
    )
    salted = timeseries.rolling_range_sum_salted(
        df, "user", "ts", W, {"s": "v", "n": None}
    )
    key = lambda r: (r["user"], r["ts"], r["v"])  # noqa: E731
    p = {key(r): (r["s"], r["n"]) for r in plain.collect()}
    s = {key(r): (r["s"], r["n"]) for r in salted.collect()}
    assert p == s
    # spot-check the math once by hand: _ts(20) sees [10, 20] inclusive
    assert p[("u", _ts(20), 64)] == (8 + 16 + 32 + 64, 4)


def test_salted_rolling_matches_plain_randomized(spark):
    """Randomized cross-check on a hot key: 300 rows, many ties,
    timestamps spanning ~8 buckets."""
    import random

    rng = random.Random(9)
    W = 1_000_000 * 60  # 1 min buckets
    rows = [
        ("hot", _ts(0) + dt.timedelta(seconds=rng.randrange(0, 480)),
         rng.randrange(1, 100))
        for _ in range(300)
    ] + [
        ("cold", _ts(0) + dt.timedelta(seconds=rng.randrange(0, 480)),
         rng.randrange(1, 100))
        for _ in range(20)
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v long")
    plain = timeseries.rolling_range_agg(
        df, "user", "ts", W, {"s": F.sum("v")}
    ).groupBy("user").agg(
        F.sum(F.col("s") * F.col("v")).alias("chk"),
        F.count(F.lit(1)).alias("n"),
    )
    salted = timeseries.rolling_range_sum_salted(
        df, "user", "ts", W, {"s": "v"}
    ).groupBy("user").agg(
        F.sum(F.col("s") * F.col("v")).alias("chk"),
        F.count(F.lit(1)).alias("n"),
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect()))


def test_rolling_count_anomalies_integer_exact(spark):
    """Hand-checkable series: constant 10s, one spike, one gap hour
    (densified to zero, itself an anomaly vs a constant history)."""
    from mr_lda_spark.operators.timeseries import rolling_count_anomalies

    rows = [("a", i * 3600, 10) for i in range(12)]
    rows += [("a", 12 * 3600, 100)]          # spike
    rows += [("a", i * 3600, 10) for i in range(13, 39)]
    # hour 39 missing entirely -> densified cnt=0
    rows += [("a", 40 * 3600, 10)]
    df = spark.createDataFrame(rows, "k string, bucket long, n long")
    got = {
        r["bucket"] // 3600: (r["cnt"], r["lookback"], r["is_anomaly"])
        for r in rolling_count_anomalies(
            df, "k", "bucket", "n", step=3600,
            lookback=24, z=3, min_periods=8,
        ).collect()
    }
    assert len(got) == 41                      # spine densified 0..40
    assert got[39][0] == 0                     # gap filled with zero
    # warm-up: frames shorter than min_periods never flag
    for h in range(0, 8):
        assert got[h][2] is False
    # constant history, constant value: no flag
    assert got[11] == (10, 11, False)
    # the spike against a zero-variance constant history flags
    assert got[12] == (100, 12, True)
    # hour 16: the spike is IN the trailing frame -> sigma inflated
    # (z-score masking, a documented property) -> 10 does not flag
    assert got[16][2] is False
    # hour 39: spike left the 24h frame (15..38 all constant), so the
    # densified zero against a zero-variance history flags
    assert got[39][2] is True
    # and the recovery hour after the gap does not flag (one zero in
    # the frame widens sigma; 10 is within 3 sigma)
    assert got[40][0] == 10


def test_rolling_count_anomalies_groups_independent(spark):
    from mr_lda_spark.operators.timeseries import rolling_count_anomalies

    rows = [("a", i * 60, 5) for i in range(10)]
    rows += [("b", i * 60, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, bucket long, n long")
    out = rolling_count_anomalies(
        df, "k", "bucket", "n", step=60,
        lookback=4, z=3, min_periods=2,
    ).collect()
    assert len(out) == 20
    assert not any(r["is_anomaly"] for r in out)
    # per-group sx at bucket 4 is 4 buckets x group's own constant
    sx = {(r["k"], r["bucket"] // 60): r["sx"] for r in out}
    assert sx[("a", 4)] == 20 and sx[("b", 4)] == 28


def test_rolling_count_anomalies_snaps_offgrid_buckets(spark):
    """Buckets not on the min+k*step grid must floor-align and merge,
    never silently vanish (r9 self-review finding)."""
    from mr_lda_spark.operators.timeseries import rolling_count_anomalies

    rows = [("a", 0, 4), ("a", 5, 6), ("a", 10, 2), ("a", 3600, 1)]
    df = spark.createDataFrame(rows, "k string, bucket long, n long")
    got = {
        r["bucket"]: r["cnt"]
        for r in rolling_count_anomalies(
            df, "k", "bucket", "n", step=3600,
            lookback=4, z=3, min_periods=2,
        ).collect()
    }
    # buckets 0, 5, 10 align to 0 and merge; total row count preserved
    assert got == {0: 12, 3600: 1}
