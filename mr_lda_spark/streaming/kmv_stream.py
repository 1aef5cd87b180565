"""Streaming KMV bottom-k sketch via ``applyInPandasWithState``.

The batch KMV sketch (`operators/kmv.py`) selects each group's k
smallest distinct hashes with window functions — not a shape Structured
Streaming's built-in aggregates can maintain (bottom-k needs ordered
state, not a commutative scalar).  This is exactly the
``applyInPandasWithState`` tier (the `stateful.py` spend-tracker
pattern): explicit GroupState holds the group's current k smallest
hashes (an array<long>, bounded at k entries per group BY CONSTRUCTION),
each Arrow batch merges-and-prunes against it, and the drained result
is bit-identical to the batch sketch — bottom-k is order-insensitive,
so trigger boundaries cannot change the answer.

Transient memory per Arrow chunk is chunk-sized (the merge prunes to k
after every chunk, never materializing a trigger's full distinct set);
persistent state is k longs per group.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_OUT_SCHEMA = "source string, hs array<long>"
KMV_STATE_SCHEMA = "hs array<long>"


def _kmv_tracker(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (hs,) = state.get if state.exists else ([],)
        cur = sorted(int(h) for h in hs)
        for pdf in pdfs:
            merged = set(cur)
            merged.update(int(h) for h in pdf["h"].unique())
            cur = sorted(merged)[:k]
        state.update((cur,))
        yield pd.DataFrame({"source": [key[0]], "hs": [cur]})

    return fn


def kmv_sketch_stream(
    keys_stream: DataFrame,
    key_col: str,
    group_col: str = "source",
    k: int = 64,
) -> DataFrame:
    """Streaming bottom-k: (group, hs[≤k]) maintained in GroupState.
    The hash is the repo-wide md5 60-bit prefix, so the drained state
    equals the batch ``kmv.kmv_sketch`` relation exactly — including
    the NULL-key drop: batch ``kmv_sketch`` filters NULL keys before
    hashing, and without the mirror filter here a NULL key's NULL
    hash reaches the Arrow batch as NaN and ``int(h)`` in the tracker
    raises (ADVICE r11), breaking bit-equality for any non-shingle
    caller."""
    from mr_lda_spark.operators.kmv import _h60

    h = _h60(F.col(key_col))
    return (
        keys_stream.filter(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("source"), h.alias("h"))
        .groupBy("source")
        .applyInPandasWithState(
            _kmv_tracker(k),
            outputStructType=KMV_OUT_SCHEMA,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def kmv_drain_stream(
    spark,
    sketch_stream: DataFrame,
    query_name: str,
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain the streaming sketch (availableNow) into a memory sink
    and explode to the batch sketch's (source, h, rank) relation.
    Update-mode memory sinks APPEND each trigger's emitted rows, so a
    multi-micro-batch run leaves one row per group PER TRIGGER; the
    final state is selected per group by the sketch's own monotonicity
    (size grows until k, then the kth — last — element strictly
    decreases on every update), ordering by (size DESC, last element
    ASC); rows tying on both are identical states, so any winner is
    the same state.  Sink detach in a ``finally`` (the hll_stream
    leak-class rule)."""
    from mr_lda_spark.streaming._state import bounded_state_shuffle

    # State bound: one row per group (source labels — dozens at any
    # corpus size; 64 is generous).  Narrowing the state stage also
    # trims the applyInPandasWithState fan-out: the Python tracker
    # launches per shuffle partition, so session-width partitions pay
    # a Python worker round-trip per (mostly empty) partition per
    # micro-batch.
    with bounded_state_shuffle(spark, 64):
        q = (
            sketch_stream.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"streaming KMV drain '{query_name}' exceeded "
                f"{timeout_sec}s — refusing a partially-drained sketch"
            )
        rows = spark.table(query_name).localCheckpoint()
    finally:
        q.stop()
        spark.catalog.dropTempView(query_name)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.size("hs").desc(),
        F.element_at("hs", F.size("hs")).asc_nulls_last(),
    )
    final = (
        rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return final.select(
        "source", F.posexplode("hs").alias("pos", "h")
    ).select(
        "source", "h", (F.col("pos") + 1).cast("int").alias("rank")
    )


def shingle_source_stream(docs_stream: DataFrame, n: int = 3) -> DataFrame:
    """(source, shingle) explode over a streaming documents source —
    LITERALLY ``textops.shingles`` with the source label as the carried
    key, so batch and stream tokenize identically by construction (the
    bit-equality the documents_stream_kmv oracle depends on)."""
    from mr_lda_spark.operators.textops import shingles

    return shingles(docs_stream, "text", n, id_cols=("source",))
