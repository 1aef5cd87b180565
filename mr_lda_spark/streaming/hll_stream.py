"""Streaming HyperLogLog — the sketch family composed with Structured
Streaming.

The point this module makes is architectural: ``operators/hll.py``'s
register relation is a plain ``groupBy().max()``, which is EXACTLY the
shape Structured Streaming can maintain incrementally — so the batch
operator is reused VERBATIM on the stream (same hash, same registers,
same estimate, bit-for-bit the batch answer; the oracle is the batch
SQL).  Streaming state is bounded by construction: ``groups × m``
register rows total, never a function of the stream length — the
whole reason HLL exists is that bound, and it is what makes
"distinct keys over an unbounded stream" a safe stateful query where
``dropDuplicates`` state would grow forever.

Two-step finalization (streaming registers → batch estimate) is the
production pattern: one streaming aggregation maintains the registers
(Spark allows a single agg per streaming query), the estimator is a
trivial batch query over the m-row register table each time someone
reads the dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_lda_spark.operators.textops import _tokens

__all__ = [
    "shingle_lang_stream", "hll_estimate_stream", "cms_table_from_stream",
    "ams_cells_from_stream",
]


def shingle_lang_stream(docs_stream: DataFrame, n: int = 5) -> DataFrame:
    """(lang, shingle) explode over a streaming documents source —
    LITERALLY ``textops.shingles`` with the lang label as the carried
    key (a stream cannot join labels back later the way batch does),
    so batch and stream tokenize identically by construction."""
    from mr_lda_spark.operators.textops import shingles

    return shingles(docs_stream, "text", n, id_cols=("lang",))


def hll_estimate_stream(
    spark,
    registers_stream: DataFrame,
    group_cols: list[str],
    query_name: str,
    p: int = 8,
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain a streaming register relation (availableNow, complete
    mode — state is groups × m rows) into a memory sink and finalize
    with the BATCH estimator.  Returns the per-group estimate
    DataFrame."""
    from mr_lda_spark.operators.hll import hll_estimate
    from mr_lda_spark.streaming._state import bounded_state_shuffle

    # State bound: groups × m registers.  The group columns here are
    # label-like (lang / source) — a couple of dozen values at any
    # corpus size, so 32 bounds them generously (a low guess only
    # costs a fuller store, never a wrong result: the sizing is a
    # partition-count heuristic, state is exact either way).
    with bounded_state_shuffle(spark, 32 * (1 << p)):
        q = (
            registers_stream.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    # Detach from the memory sink before returning: checkpoint the
    # (bounded, groups × m) register rows and drop the sink's temp
    # view, else every drain leaks one never-dropped in-memory table
    # for the session's lifetime (the ADVICE r9 #1/#2 leak class).
    # The drop sits in a finally so the TIMEOUT path also detaches
    # the sink (ADVICE r10: the error path leaked the very table the
    # change set out to eliminate).
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming register drain '{query_name}' exceeded "
                f"{timeout_sec}s — refusing to estimate from a "
                "partially-filled sketch"
            )
        regs = spark.table(query_name).localCheckpoint()
    finally:
        q.stop()
        spark.catalog.dropTempView(query_name)
    return hll_estimate(regs, group_cols, p)


def cms_table_from_stream(
    spark,
    keys_stream: DataFrame,
    key_col: str,
    query_name: str,
    width: int = 8192,
    depth: int = 5,
    timeout_sec: int = 120,
):
    """Maintain a count-min sketch OVER A STREAM and return it as the
    packed (depth, width) numpy array: ``sketch.cms_table`` is one
    groupBy-count — the other streaming-safe sketch aggregate (state
    bounded at depth × width cells regardless of stream length; the
    same argument as the HLL registers, with counts instead of max).
    Drained availableNow in complete mode."""
    import numpy as np

    from mr_lda_spark.operators.sketch import cms_table
    from mr_lda_spark.streaming._state import bounded_state_shuffle

    with bounded_state_shuffle(spark, depth * width):
        q = (
            cms_table(keys_stream, key_col, width, depth)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    # packing kept inline rather than shared with cms_build: that
    # helper drives its own collect; this one packs an already-drained
    # memory table (same 4 lines, different source of rows).  The
    # sink drop sits in a finally so the timeout path detaches too
    # (ADVICE r10).
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming CMS drain '{query_name}' exceeded "
                f"{timeout_sec}s — a partial sketch would "
                "under-estimate and break the exact-output contract"
            )
        packed = np.zeros((depth, width), dtype=np.int64)
        for row in spark.table(query_name).collect():
            packed[int(row["d"]), int(row["col"])] = int(row["cnt"])
    finally:
        q.stop()
        spark.catalog.dropTempView(query_name)
    return packed


def ams_cells_from_stream(
    spark,
    keys_stream: DataFrame,
    key_col: str,
    query_name: str,
    width: int = 8192,
    depth: int = 5,
    timeout_sec: int = 120,
) -> DataFrame:
    """Maintain the signed AMS/CountSketch cell relation OVER A STREAM
    and return it as a static DataFrame: ``sketch.ams_cells`` is one
    groupBy().sum() — the third streaming-safe sketch aggregate (state
    bounded at depth × width cells; signed counts instead of counts or
    max).  Drained availableNow in complete mode; the estimator tail
    (``sketch.ams_estimate_from_cells``) then runs as a trivial batch
    query over the cell table."""
    from mr_lda_spark.operators.sketch import ams_cells
    from mr_lda_spark.streaming._state import bounded_state_shuffle

    with bounded_state_shuffle(spark, depth * width):
        q = (
            ams_cells(keys_stream, key_col, width, depth)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    # Detach from the memory sink (bounded depth × width rows) and
    # drop the sink's temp view — see hll_estimate_stream; finally so
    # the timeout path detaches too (ADVICE r10).
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming AMS drain '{query_name}' exceeded "
                f"{timeout_sec}s — a partial sketch is a biased "
                "estimator; refusing to finalize"
            )
        cells = spark.table(query_name).localCheckpoint()
    finally:
        q.stop()
        spark.catalog.dropTempView(query_name)
    return cells
