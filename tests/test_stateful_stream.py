"""applyInPandasWithState spend tracker: state must carry across
triggers (multi-file source => multiple micro-batches)."""

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
