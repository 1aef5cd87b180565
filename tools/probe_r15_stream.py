#!/usr/bin/env python3
"""Round-15 probe: decompose the streaming micro-batch FIXED overhead
(VERDICT r14 "Next round" #3 — the ~1.5-2 s gap between every
documents_stream_* row and its batch twin).

For each probed stream shape this drains the query exactly the way the
registered row does (availableNow, same sink kind) and prints, per
micro-batch, Structured Streaming's own progress breakdown
(durationMs: triggerExecution / queryPlanning / getBatch / latestOffset
/ addBatch / walCommit / commitOffsets) plus the wall around the whole
drain — so the fixed cost is attributed to planning vs offset-log I/O
vs the actual batch job vs sink commit, instead of guessed.

Usage: python tools/probe_r15_stream.py out.json [reps]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def drain_progress(q, timeout_sec=120):
    q.awaitTermination(timeout_sec)
    return [json.loads(p) if isinstance(p, str) else p for p in q.recentProgress]


def main() -> None:
    out_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from mr_lda_spark.session import get_spark
    from mr_lda_spark.streaming import dedup_stream as ds
    from mr_lda_spark.operators import textops

    spark = get_spark("probe-r15-stream")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm: one throwaway drain so JIT/codegen/session init is paid.
    results: dict[str, list] = {}

    def run_parquet_sink(tag: str):
        run = uuid.uuid4().hex[:8]
        base = tempfile.gettempdir()
        out = f"{base}/probe_stream_{run}/out"
        ckpt = f"{base}/probe_stream_{run}/ckpt"
        stream = textops.char_entropy_stateless(
            ds.read_documents_stream(spark, sf_dir)
        ).withColumn("passed", F.col("entropy_bits") >= 4.0)
        t0 = time.perf_counter()
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        prog = drain_progress(q)
        wall = time.perf_counter() - t0
        t1 = time.perf_counter()
        n = spark.read.parquet(out).count()
        read_back = time.perf_counter() - t1
        results.setdefault(tag, []).append(
            {
                "wall_drain": round(wall, 3),
                "read_back": round(read_back, 3),
                "rows": n,
                "batches": [
                    {
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "durationMs": p.get("durationMs"),
                    }
                    for p in prog
                ],
            }
        )

    def run_memory_sink(tag: str):
        name = "probe_mem_" + uuid.uuid4().hex[:8]
        agg = (
            ds.dedup_stream(ds.read_documents_stream(spark, sf_dir))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        prog = drain_progress(q)
        wall = time.perf_counter() - t0
        t1 = time.perf_counter()
        n = spark.table(name).count()
        read_back = time.perf_counter() - t1
        spark.catalog.dropTempView(name)
        results.setdefault(tag, []).append(
            {
                "wall_drain": round(wall, 3),
                "read_back": round(read_back, 3),
                "rows": n,
                "batches": [
                    {
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "durationMs": p.get("durationMs"),
                        "stateOperators": p.get("stateOperators"),
                    }
                    for p in prog
                ],
            }
        )

    # Also time the pieces AROUND the drain that the registered rows
    # pay per call: stream DEFINITION (schema probe) and session jobs.
    def time_definition(tag: str):
        t0 = time.perf_counter()
        ds.read_documents_stream(spark, sf_dir)
        results.setdefault(tag, []).append(
            {"define_sec": round(time.perf_counter() - t0, 3)}
        )

    run_parquet_sink("warmup")
    for _ in range(reps):
        time_definition("define_documents_stream")
        run_parquet_sink("entropy_gate_parquet_sink")
        run_memory_sink("dedup_stateful_memory_sink")

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({k: len(v) for k, v in results.items()}))


if __name__ == "__main__":
    main()
