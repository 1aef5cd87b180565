"""Uniform streaming-source entry points (file / rate / kafka-gated)."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.streaming import sources

SF = "/root/testdata/sf0.001"


def test_file_source_streams_events(spark, tmp_path):
    df = sources.read_stream(
        spark, "file", path=SF, glob="events.parquet"
    )
    assert df.isStreaming
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("src_file_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM src_file_test").collect()
    assert rows and all(r["n"] > 0 for r in rows)


def test_rate_source_builds(spark):
    df = sources.read_stream(spark, "rate", rows_per_second=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}


def test_kafka_options_shape():
    opts = sources.kafka_options(
        "broker:9092", topic="events", starting_offsets="earliest",
        max_offsets_per_trigger=1000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "startingOffsets": "earliest",
        "subscribe": "events",
        "maxOffsetsPerTrigger": "1000",
    }
    with pytest.raises(ValueError):
        sources.kafka_options("b:9092")  # neither topic nor assign
    with pytest.raises(ValueError):
        sources.kafka_options("b:9092", topic="t", assign="a")  # both


def test_kafka_gated_with_clear_error(spark):
    if sources._kafka_available(spark):
        pytest.skip("kafka connector present; gate not exercised")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        sources.read_stream(
            spark, "kafka", bootstrap_servers="b:9092", topic="t"
        )
