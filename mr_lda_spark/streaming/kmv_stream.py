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
    equals the batch ``kmv.kmv_sketch`` relation exactly."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col)), 1, 15), 16, 10
    ).cast("bigint")
    return (
        keys_stream.select(F.col(group_col).alias("source"), h.alias("h"))
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
    Update-mode emits one row per group per trigger; the LAST row per
    group is the final state (earlier partials are superseded), so the
    drain keeps the max-length entry per group — with availableNow's
    single trigger there is exactly one row per group anyway.  Sink
    detach in a ``finally`` (the hll_stream leak-class rule)."""
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
    return rows.select(
        "source", F.posexplode("hs").alias("pos", "h")
    ).select(
        "source", "h", (F.col("pos") + 1).cast("int").alias("rank")
    )


def shingle_source_stream(docs_stream: DataFrame, n: int = 3) -> DataFrame:
    """(source, shingle) explode over a streaming documents source —
    same tokenize/shingle pipeline as ``textops.shingles`` (1-based
    positions) with the source label kept inline."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    with_toks = docs_stream.select(
        "source", toks.alias("toks")
    ).filter(F.size("toks") >= n)
    idx = F.sequence(F.lit(1), F.size("toks") - (n - 1))

    def shingle(i):
        return F.concat_ws(
            " ", *[F.element_at("toks", i + j) for j in range(n)]
        )

    return with_toks.select(
        "source",
        F.explode(F.transform(idx, lambda i: shingle(i))).alias("shingle"),
    )
