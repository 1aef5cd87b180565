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
    # maxFilesPerTrigger=1 means every micro-batch scans ONE file =
    # ONE partition, at any cluster size — so the CPU-heavy per-row
    # kernels above this source (shingle/trigram/hash explodes) would
    # run single-task per trigger.  The repartition spreads each
    # micro-batch across the session's cores BEFORE the explode; the
    # downstream stateful aggregate is associative, so the drained
    # state is identical (guide §2: partitioning derived from the
    # source's real split count — here pinned at 1 by the trigger —
    # not a constant).
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
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


class NearDedupSink:
    """Streaming NEAR-dup dedup: a ``foreachBatch`` sink that maintains
    a growing MinHash-LSH bucket index and admits only documents that
    are near-dup-free against BOTH the current micro-batch and all
    previously admitted history — the continuous-ingest twin of
    ``dedup.near_duplicates_minhash``.

    Per batch (all bounded work, nothing rescans admitted text except
    the candidate-matched slice):

    1. within-batch collapse: full MinHash→LSH→verify over the batch,
       connected components to the minimum doc_id;
    2. history probe: the batch's band buckets equi-join the committed
       bucket index (a compact (doc_id, band, band_key) relation —
       ~4 rows/doc regardless of text size); only docs sharing a
       bucket with history become candidates;
    3. exact Jaccard verify of those candidates against the matched
       old docs only (left-semi read of the survivor store — predicate
       pushdown keeps this the candidate slice, not history);
    4. survivors append under ``docs/batch_id=N``, their buckets under
       ``index/batch_id=N``, commit marker LAST — the same replay-safe
       recipe as ``exactly_once.IdempotentBatchSink``: a re-delivered
       batch_id is skipped, a half-written batch is invisible (readers
       go through the commit log) and overwritten on replay.

    At 100 TB the per-batch cost is O(batch) + O(index ∩ batch bucket
    keys): the index join shuffles on high-cardinality (band, key) and
    the verify joins only candidate pairs.
    """

    def __init__(
        self,
        out_dir: str,
        threshold: float = 0.5,
        shingle_n: int = 3,
        max_bucket_size: int = 1000,
    ):
        import os

        self.out_dir = out_dir
        self.docs_dir = os.path.join(out_dir, "docs")
        self.index_dir = os.path.join(out_dir, "index")
        self.commit_dir = os.path.join(out_dir, "_commits")
        self.threshold = threshold
        self.shingle_n = shingle_n
        self.max_bucket_size = max_bucket_size
        os.makedirs(self.commit_dir, exist_ok=True)
        self.replays_skipped = 0

    def _marker(self, batch_id: int) -> str:
        import os

        return os.path.join(self.commit_dir, f"{int(batch_id)}.commit")

    def _committed(self) -> list[int]:
        import os

        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.commit_dir)
            if f.endswith(".commit")
        )

    def _committed_paths(self, base_dir: str) -> list[str]:
        """Data directories of committed batches that actually exist.

        Markers are only written for non-empty batches, but a sink
        directory produced by an earlier version (or hand-edited) may
        carry a marker with no data dir — tolerate it rather than
        failing every subsequent read with PATH_NOT_FOUND."""
        import os

        return [
            p
            for b in self._committed()
            if os.path.isdir(p := os.path.join(base_dir, f"batch_id={b}"))
        ]

    def survivors(self, spark: SparkSession) -> DataFrame:
        """All documents admitted by committed batches."""
        paths = self._committed_paths(self.docs_dir)
        if not paths:
            raise ValueError(f"no committed batches under {self.out_dir}")
        return spark.read.parquet(*paths)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        from mr_lda_spark.operators import dedup

        if os.path.exists(self._marker(batch_id)):
            self.replays_skipped += 1
            return
        spark = batch_df.sparkSession
        pinned: list[DataFrame] = []

        def _persist(df: DataFrame) -> DataFrame:
            pinned.append(df.persist())
            return pinned[-1]

        try:
            batch = _persist(batch_df)
            if batch.count() == 0:
                # No data, no marker: an empty batch is a no-op and
                # replaying it is harmless, while a marker with no
                # docs/index dir would poison every later history read
                # (ADVICE r4).
                return
            within = dedup.near_duplicates_minhash(
                batch, threshold=self.threshold, shingle_n=self.shingle_n
            )
            final = _persist(dedup.dedup_survivors(batch, within))
            final.count()
            old_paths = self._committed_paths(self.index_dir)
            if old_paths:
                old_buckets = spark.read.parquet(*old_paths)
                new_buckets = dedup.minhash_band_buckets(
                    dedup.minhash_signatures(
                        final, shingle_n=self.shingle_n
                    )
                )
                # Hot-bucket gate over the COMBINED old+new relation —
                # mirrors lsh_candidate_pairs' cap: a degenerate
                # boilerplate band_key accumulated in history would
                # otherwise fan out quadratically (ADVICE r4).
                sized = (
                    new_buckets.select("band", "band_key")
                    .unionByName(old_buckets.select("band", "band_key"))
                    .groupBy("band", "band_key")
                    .agg(F.count(F.lit(1)).alias("bucket_n"))
                    .filter(F.col("bucket_n") <= self.max_bucket_size)
                    .select("band", "band_key")
                )
                cand = _persist(
                    new_buckets.join(sized, ["band", "band_key"], "left_semi")
                    .select("band", "band_key", F.col("doc_id").alias("a"))
                    .join(
                        old_buckets.select(
                            "band", "band_key", F.col("doc_id").alias("b")
                        ),
                        ["band", "band_key"],
                    )
                    .select("a", "b")
                    .distinct()
                )
                cand.count()
                old_ids = cand.select(F.col("b").alias("doc_id")).distinct()
                old_docs = self.survivors(spark).join(
                    old_ids, "doc_id", "left_semi"
                )
                union_docs = final.select("doc_id", "text").unionByName(
                    old_docs.select("doc_id", "text")
                )
                matched = dedup.jaccard_verify(
                    union_docs,
                    cand,
                    shingle_n=self.shingle_n,
                    threshold=self.threshold,
                )
                drop_ids = matched.select(
                    F.col("a").alias("doc_id")
                ).distinct()
                final = final.join(drop_ids, "doc_id", "left_anti")
            final = _persist(final)
            final.count()
            final.write.mode("overwrite").parquet(
                os.path.join(self.docs_dir, f"batch_id={int(batch_id)}")
            )
            dedup.minhash_band_buckets(
                dedup.minhash_signatures(final, shingle_n=self.shingle_n)
            ).write.mode("overwrite").parquet(
                os.path.join(self.index_dir, f"batch_id={int(batch_id)}")
            )
            with open(self._marker(batch_id), "w") as fh:
                fh.write("ok")
        finally:
            # Long-running streams otherwise accumulate executor
            # storage memory batch over batch (ADVICE r4).
            for df in pinned:
                df.unpersist()


def run_near_dedup_stream(
    docs_stream: DataFrame,
    sink: NearDedupSink,
    checkpoint_dir: str,
    timeout_sec: int = 180,
) -> None:
    """Drain a document stream through the near-dup sink (availableNow:
    one pass over whatever the source currently holds; restart with the
    same checkpoint to process only new files)."""
    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
