"""Streaming Gram / covariance sufficient statistics — the linalg
family composed with Structured Streaming.

Same architectural point as the HLL / CMS / AMS twins
(``streaming/hll_stream.py``): ``operators/linalg.gram_moments`` is a
stateless Arrow transform followed by ONE groupBy().sum(), which is
exactly the shape Structured Streaming maintains incrementally — so
the batch operator runs VERBATIM on the stream and the answer is
bit-for-bit the batch Gram (integer-exact partials make the combine
order irrelevant by construction, stream micro-batching included;
the oracle is the batch SQL).  State is bounded at
d(d+1)/2 + d + 1 rows (2 145 for d = 64) regardless of stream
length — a one-pass second-moment sketch in the formal sense, kept
exactly rather than approximately because the quantized sums fit
DECIMAL(38,0) headroom at any realistic corpus size (see the
overflow budget in ``operators/linalg.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_embeddings_stream", "gram_moments_from_stream"]

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One file per trigger = one scan partition per micro-batch at any
    # scale; spread each batch across the cores before the Arrow
    # quantize/matmul kernel (same rationale as read_documents_stream).
    return (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
    )


def gram_moments_from_stream(
    spark,
    vecs_stream: DataFrame,
    query_name: str,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
    timeout_sec: int = 120,
) -> DataFrame:
    """Maintain the exact Gram statistics OVER A STREAM and return
    them as a static DataFrame.  Drained availableNow in complete
    mode into a memory sink (bounded: the d²-shaped relation), then
    detached — temp view dropped in a finally so the timeout path
    detaches too (the ADVICE r10 sink-leak class)."""
    from mr_lda_spark.operators.linalg import gram_moments
    from mr_lda_spark.streaming._state import bounded_state_shuffle

    with bounded_state_shuffle(spark, dim * (dim + 1) // 2 + dim + 1):
        q = (
            gram_moments(vecs_stream, vec_col, dim, scale)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming gram drain '{query_name}' exceeded "
                f"{timeout_sec}s — refusing to hand back a partial "
                "moment table"
            )
        stats = spark.table(query_name).localCheckpoint()
    finally:
        q.stop()
        spark.catalog.dropTempView(query_name)
    return stats
