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


def test_probe_conf_discipline(spark, tmp_path):
    """ADVICE r3: defining a stream over ordinary parquet must not flip
    the session-wide nanosAsLong conf; an unreadable path falls back to
    EVENTS_SCHEMA with a warning (any failure, not just
    AnalysisException), leaving the conf untouched."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.unset(key)
    except Exception:
        pass
    try:
        # ordinary parquet: probe succeeds without the conf
        p = str(tmp_path / "plain")
        spark.range(3).select(
            F.col("id").alias("event_id")
        ).write.parquet(p)
        df = sources.read_stream(spark, "file", path=p)
        assert df.isStreaming
        assert spark.conf.get(key, None) is None

        # corrupt footer: warn + static fallback (not just
        # AnalysisException), conf untouched, stream still defined
        bad = tmp_path / "corrupt"
        bad.mkdir()
        (bad / "junk.parquet").write_bytes(b"not a parquet file at all")
        with pytest.warns(UserWarning, match="schema probe failed"):
            df2 = sources.read_stream(spark, "file", path=str(bad))
        assert df2.isStreaming
        assert df2.schema == sources.EVENTS_SCHEMA
        assert spark.conf.get(key, None) is None
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
