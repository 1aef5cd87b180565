"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.8) — these are the
"arrives free in Spark" additions: tumbling-window aggregation with
watermarked late-data handling, and session windows.  Each streaming
query has a batch twin with identical semantics (the registry exposes
the batch twin with a DuckDB oracle; the streaming tests assert
stream ≡ batch on the same input).

Scale: the parquet source here stands in for Kafka/Kinesis; watermarks
bound state, and the aggregation keys (event_type × hour, user session)
are high-cardinality enough to distribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events parquet, normalized to a
    session-zone TIMESTAMP ts (same normalization as the batch reader:
    the generator has shipped ts as nanosecond INT64 in some versions
    and microsecond TIMESTAMP in others).

    A streaming source needs its schema declared up front, so probe the
    batch reader's resolved schema once (driver-side footer read only —
    no data scan) and declare the matching streaming schema.
    """
    import os

    from mr_lda_spark.session import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    resolved = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    ts_type = resolved["ts"].dataType
    raw = (
        spark.readStream.schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        # The source wants a directory; select just the events table.
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw, ts_type)


def hourly_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type with watermarked state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "n_events",
            "sum_value",
        )
    )


def segment_revenue_stream(
    events: DataFrame, customer: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the (batch)
    customer dimension, then windowed revenue per market segment.

    This is the third streaming join mode (alongside the stream-stream
    attribution join and the stateful tracker): the static side is
    re-resolved and BROADCAST per micro-batch — stateless, no watermark
    on the dim, and dim updates between batches are picked up
    automatically.  Exactly the shape of a production "enrich events
    with account metadata" stage.
    """
    dim = F.broadcast(
        customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "c_mktsegment",
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_batch(
    stream_df: DataFrame,
    query_name: str,
    timeout_sec: int = 120,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a streaming query into an in-memory sink (availableNow:
    process everything, then stop) and return the result as a batch
    DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = stream_df.sparkSession
    # Detach from the memory sink before returning (checkpoint +
    # dropTempView): callers drain with fresh uuid names, so returning
    # the live sink table would leak one in-memory table per drain for
    # the session's lifetime (r10 self-review; the ADVICE r9 #1/#2
    # leak class).
    out = spark.table(query_name).localCheckpoint()
    spark.catalog.dropTempView(query_name)
    return out


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session ends after ``gap_minutes`` of
    user inactivity (classic islands via lag + running sum — the batch
    twin of ``session_window``).

    Returns (user_id, session_id, session_start_epoch, session_end_epoch,
    n_events, sum_value).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(
            gap.isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(gap) > gap_minutes * 60),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_sid = flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        F.unix_timestamp(F.max("ts")).alias("session_end_epoch"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming session windows via the built-in session_window
    (stateful, watermark-bounded)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"),
            "n_events",
            "sum_value",
        )
    )


def view_purchase_join_stream(
    views: DataFrame,
    purchases: DataFrame,
    join_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: every purchase matched to the same
    user's view events in the preceding ``join_window``.

    Both sides carry watermarks plus the event-time range predicate, so
    the join state is bounded (Spark evicts view rows older than
    watermark + window) — the canonical attribution join at scale.
    Inner join + availableNow drain is deterministic, so the batch
    interval-join SQL is an exact oracle.
    """
    v = (
        views.select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        ).withWatermark("view_ts", watermark)
    )
    b = (
        purchases.select(
            F.col("user_id").alias("b_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        ).withWatermark("purchase_ts", watermark)
    )
    return (
        v.join(
            b,
            F.expr(
                f"""
                user_id = b_user_id
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + interval {join_window}
                """
            ),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
            ).alias("lag_secs"),
            F.round("value", 4).alias("purchase_value"),
        )
    )
