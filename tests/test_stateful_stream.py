"""applyInPandasWithState spend tracker: state must carry across
triggers (multi-file source => multiple micro-batches)."""
import pytest

import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mr_lda_spark.streaming import events as se
from mr_lda_spark.streaming import stateful

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.mark.slow
def test_state_carries_across_triggers(spark, tmp_path):
    src = str(tmp_path / "events_src")
    rows1 = [(1, 7, 10.0), (2, 7, 20.0), (3, 8, 5.0)]
    rows2 = [(4, 7, 100.0), (5, 9, 1.0)]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.parquet(
        src, mode="append"
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tracked = stateful.user_spend_tracker_stream(stream, threshold=100.0)
    sink = se.run_stream_to_batch(
        tracked, f"t_{uuid.uuid4().hex[:8]}", output_mode="update"
    )
    rows = sink.collect()
    # User 7 appears in both micro-batches -> two update rows, the
    # final one having accumulated BOTH batches (state carried).
    u7 = sorted(
        (r["n_events"], r["total_value"], r["over_threshold"])
        for r in rows
        if r["user_id"] == 7
    )
    assert u7[-1] == (3, 130.0, 1)
    assert len(u7) == 2  # one update per trigger containing user 7
    # Final per-user state equals the batch aggregate.
    final = {
        r["user_id"]: (r["n_events"], r["total_value"], r["over_threshold"])
        for r in sorted(rows, key=lambda r: r["n_events"])
    }
    assert final[7] == (3, 130.0, 1)
    assert final[8] == (1, 5.0, 0)
    assert final[9] == (1, 1.0, 0)


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_rolling_kernel_ties_boundaries_and_multi_trigger():
    """Drive the per-key pandas kernel directly: inclusive [t-W, t]
    bounds, equal-ts peers, and state carrying the history across
    triggers when event-time order holds between them."""
    import pandas as pd

    W = 100
    fn = stateful._rolling(W, evict_before_us=None)
    st = _FakeState()
    b1 = pd.DataFrame(
        {"event_id": [1, 2, 3], "user_id": [7] * 3,
         "ts_us": [0, 0, 100], "cents": [5, 7, 10]}
    )
    out1 = pd.concat(fn((7,), [b1], st))
    got1 = dict(zip(out1["event_id"], zip(out1["n_24h"], out1["cents_24h"])))
    # peers at ts=0 see each other; ts=100 includes ts-100=0 (inclusive)
    assert got1 == {1: (2, 12), 2: (2, 12), 3: (3, 22)}
    # second trigger, later event-time: exactly window-edge + beyond
    b2 = pd.DataFrame(
        {"event_id": [4, 5], "user_id": [7, 7],
         "ts_us": [200, 301], "cents": [1, 2]}
    )
    out2 = pd.concat(fn((7,), [b2], st))
    got2 = dict(zip(out2["event_id"], zip(out2["n_24h"], out2["cents_24h"])))
    assert got2 == {4: (2, 11), 5: (1, 2)}  # 301-100=201 excludes 200


def test_rolling_kernel_eviction_bounds_state():
    import pandas as pd

    fn = stateful._rolling(100, evict_before_us=100)
    st = _FakeState()
    b = pd.DataFrame(
        {"event_id": [1, 2, 3], "user_id": [1] * 3,
         "ts_us": [0, 50, 500], "cents": [1, 1, 1]}
    )
    list(fn((1,), [b], st))
    ts, cents = st.get
    assert ts == [500] and cents == [1]  # horizon = max - 100


@pytest.mark.slow
def test_rolling_stream_matches_batch_window(spark, tmp_path):
    """End-to-end: the drained stream equals the batch RANGE window
    on the same synthetic events (ties + boundary hits included)."""
    import datetime as dt

    from mr_lda_spark.operators import timeseries

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, t0, "purchase", 1.0),
        (2, 7, t0, "purchase", 2.0),                      # tie
        (3, 7, t0 + dt.timedelta(hours=24), "purchase", 4.0),  # edge in
        (4, 7, t0 + dt.timedelta(hours=48, microseconds=1), "purchase", 8.0),
        (5, 8, t0, "purchase", 16.0),
        (6, 8, t0, "view", 99.0),                         # filtered out
    ]
    schema = ("event_id long, user_id long, ts timestamp,"
              " event_type string, value double")
    src = str(tmp_path / "roll_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    import uuid

    got = se.run_stream_to_batch(
        stateful.rolling_spend_stream(stream),
        f"rolltest_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    batch = spark.createDataFrame(rows, schema).filter(
        F.col("event_type") == "purchase"
    ).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    want = timeseries.rolling_range_agg(
        batch, "user_id", "ts", 86_400_000_000,
        {"n_24h": F.count(F.lit(1)), "cents_24h": F.sum("cents")},
    ).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        F.col("n_24h").cast("int").alias("n_24h"), "cents_24h",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect()))
