"""Exactly-once streaming sinks for targets that are not Spark's
transactional file sink.

Spark's parquet ``writeStream`` sink is already exactly-once (the file
sink commits batch manifests under ``_spark_metadata``;
``dedup_stream.run_to_parquet`` uses it).  For everything else — JDBC
tables, key-value stores, external services — Structured Streaming
only guarantees *at-least-once* through ``foreachBatch``: a micro-batch
can be re-delivered after a failure with the **same** ``batch_id``.

The standard recipe (Structured Streaming programming guide,
"foreachBatch" note on reusing batchId for deduplication) is an
idempotent writer keyed on ``(checkpoint, batch_id)``:

1. before writing, consult a commit log for ``batch_id``;
2. if present, skip (the batch already landed — this is a replay);
3. else write the payload, then append the commit marker *last*.

Here the commit log is a directory of empty ``<batch_id>.commit``
markers next to the output (atomic create-once on local/HDFS-like
stores), and the payload write is an append of parquet files into a
``batch_id=N`` subdirectory, so a half-written batch that died before
its marker is invisible to readers who go through :func:`read_committed`
and is simply overwritten on replay.

At 100-TB scale nothing here is driver-bound: the marker check is one
filesystem stat per micro-batch, and the payload write is an ordinary
distributed parquet write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentBatchSink:
    """``foreachBatch`` target with replay-safe (exactly-once) writes.

    Parameters
    ----------
    out_dir: payload root; each micro-batch lands under
        ``batch_id=<n>/`` so replays overwrite their own batch only.
    commits: delivery log (``<n>.commit`` markers). A batch counts as
        delivered only once its marker exists; the marker is written
        after the payload, so the failure window re-delivers (replay)
        rather than loses.
    """

    def __init__(self, out_dir: str, transform=None):
        self.out_dir = out_dir
        self.commit_dir = os.path.join(out_dir, "_commits")
        os.makedirs(self.commit_dir, exist_ok=True)
        # Optional per-batch DataFrame→DataFrame transform applied
        # before the write.  Safe for any BATCH-INVARIANT computation:
        # stateless projections, and aggregations whose groups derive
        # from single input rows (e.g. per-DOCUMENT token/shingle
        # stats — a document is one source row, so its whole group is
        # always inside one micro-batch).  Cross-row state (corpus df,
        # cross-doc dedup) needs the stateful sinks instead.
        self.transform = transform
        # Replays observed and skipped; exposed for tests/monitoring.
        self.replays_skipped = 0

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, f"{int(batch_id)}.commit")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            # Re-delivery after a post-write/pre-ack failure: the data
            # is already down; acking again must be a no-op.
            self.replays_skipped += 1
            return
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        (
            batch_df.write.mode("overwrite")
            .parquet(os.path.join(self.out_dir, f"batch_id={int(batch_id)}"))
        )
        # Marker LAST: a crash between payload and marker re-runs the
        # batch, whose overwrite replaces the partial output.
        with open(self._marker(batch_id), "w") as fh:
            fh.write("ok")

    def read_committed(self, spark) -> DataFrame:
        """Read back only fully-committed batches."""
        committed = sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.commit_dir)
            if f.endswith(".commit")
        )
        paths = [
            os.path.join(self.out_dir, f"batch_id={b}") for b in committed
        ]
        if not paths:
            raise ValueError("no committed batches under %s" % self.out_dir)
        return spark.read.parquet(*paths)


def run_exactly_once(
    stream_df: DataFrame,
    sink: IdempotentBatchSink,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Drain ``stream_df`` through an idempotent ``foreachBatch`` sink.

    Restarting with the same ``(checkpoint_dir, sink)`` pair resumes
    from the checkpointed offsets; any micro-batch Spark re-delivers is
    absorbed by the sink's commit log.
    """
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
