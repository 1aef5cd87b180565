"""Idempotent foreachBatch sink: exactly-once under replay + restart."""

import os
import shutil

from pyspark.sql import functions as F

from mr_lda_spark.streaming.exactly_once import (
    IdempotentBatchSink,
    run_exactly_once,
)

SF = "/root/testdata/sf0.001"


def _doc_stream(spark, src_dir):
    schema = spark.read.parquet(f"{SF}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def _split_docs(spark, tmp_path, n_files=4):
    """Write the docs table as n separate parquet files so the
    maxFilesPerTrigger=1 stream produces n micro-batches."""
    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.repartition(n_files).write.mode("overwrite").parquet(src)
    return src, docs.count()


def test_exactly_once_drain_and_restart(spark, tmp_path):
    src, n_docs = _split_docs(spark, tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    sink = IdempotentBatchSink(out)
    run_exactly_once(_doc_stream(spark, src), sink, ckpt)
    assert sink.read_committed(spark).count() == n_docs

    # Restart with the same checkpoint: offsets are caught up, so no
    # batch re-runs and nothing duplicates.
    sink2 = IdempotentBatchSink(out)
    run_exactly_once(_doc_stream(spark, src), sink2, ckpt)
    assert sink2.read_committed(spark).count() == n_docs


def test_replayed_batch_is_skipped(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = IdempotentBatchSink(out)
    batch = spark.range(10).withColumn("v", F.col("id") * 2)

    sink(batch, 0)
    assert sink.read_committed(spark).count() == 10

    # Simulate Spark re-delivering batch 0 after a post-commit failure:
    # the sink must ack without rewriting.
    sink(batch, 0)
    assert sink.replays_skipped == 1
    assert sink.read_committed(spark).count() == 10


def test_uncommitted_batch_invisible_then_replay_heals(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = IdempotentBatchSink(out)
    batch = spark.range(5).withColumn("v", F.lit("x"))

    sink(batch, 0)
    sink(batch, 1)
    # Crash window: payload 1 written but marker lost.
    os.remove(os.path.join(out, "_commits", "1.commit"))
    assert sink.read_committed(spark).count() == 5  # batch 1 invisible

    # Replay of batch 1 (what a restart would do) overwrites its own
    # directory and re-commits — visible exactly once.
    sink(batch, 1)
    assert sink.read_committed(spark).count() == 10
