"""Streaming deduplication: exact-dedup a document stream with
watermark-bounded state, writing an exactly-once parquet sink.

The batch twin is ``dedup.exact_duplicates``; here the digest is
computed map-side on the stream and ``dropDuplicates`` keeps the first
arrival per digest (state bounded by the watermark when an event-time
column exists; unbounded-state variant for keyed snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def dedup_stream(docs_stream: DataFrame) -> DataFrame:
    """First-arrival-wins exact dedup on the content digest."""
    return (
        docs_stream.withColumn("text_hash", F.md5("text"))
        .dropDuplicates(["text_hash"])
    )


def run_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Drain to a parquet sink with a checkpoint location — restart the
    same (sink, checkpoint) pair and already-committed batches are not
    re-written (exactly-once file sink semantics)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
