"""Bloom-filter membership gate — the broadcast-semi-join scale path
for reference key sets too large to broadcast as strings.

The reference (lintool/Mr.LDA) has no Bloom operator; this belongs to
the LLM-data-pipeline suite (cross-source membership, eval-set
decontamination).  The existing ``textops.decontaminate`` broadcasts
the deduplicated eval n-gram STRINGS — fine while the eval suite is
benchmark-sized, but a 10M-n-gram reference set is ~1 GB of strings
per executor.  The Bloom gate replaces that with an m-bit bitset
(``bits_per_key`` ≈ 12 → ~1.4 bits/byte/key: 10M keys ≈ 15 MB) built
and applied without ever hashing in Python:

1. BUILD — reference keys hash JVM-side (``xxhash64(key, i)`` per
   probe ``i``, so Catalyst/codegen does the work), the hit positions
   reduce to at most ``m/64`` (word_index, OR-mask) rows via a
   ``bit_or`` aggregate, and only that word list — the bitset itself,
   never the E×k position multiset — is collected and packed into a
   numpy ``uint64`` array on the driver.
2. PROBE — candidate rows carry their k positions as an
   ``array<bigint>`` column (same JVM expressions, so build and probe
   hashes agree by construction); an Arrow-vectorized pandas UDF does
   k bitset lookups per row (pure numpy gather/shift on the batch —
   no per-row Python).
3. VERIFY — Bloom positives are a superset (false-positive rate
   ≈ 0.5^n_hashes at the default sizing); callers that need exact
   semantics join the surviving candidates against the reference keys.
   The point is that the 100 TB side reaches that join pre-shrunk to
   true-matches + fp noise instead of in full.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mr_lda_spark.operators.localrel import local_df

__all__ = [
    "bloom_positions", "bloom_build", "bloom_prefilter",
    "bloom_prefilter_jvm", "bloom_pruned_join",
]


def bloom_positions(key: Column, m: int, n_hashes: int) -> Column:
    """The k probe positions of ``key`` in an m-bit filter, as an
    ``array<bigint>`` of JVM-computed ``pmod(xxhash64(key, i), m)``
    values — shared by build and probe so the two sides can never
    disagree on the hash family."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
            for i in range(n_hashes)
        ]
    )


def _bitset_size(n_keys: int, bits_per_key: int) -> int:
    m = max(1024, n_keys * bits_per_key)
    return ((m + 63) // 64) * 64  # whole words


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_keys: int,
    bits_per_key: int = 12,
    n_hashes: int = 6,
) -> tuple[np.ndarray, int]:
    """Build the packed bitset for the distinct values of
    ``keys[key_col]``.  ``n_keys`` sizes the filter (callers usually
    already know or count it; an overestimate only wastes bits).

    Returns ``(words, m)`` — a ``uint64`` numpy array of ``m/64``
    words.  The driver-side collect is the word list (≤ m/64 rows,
    i.e. the bitset itself), NOT the key set or position multiset.
    """
    m = _bitset_size(n_keys, bits_per_key)
    words = (
        keys.select(
            F.explode(
                bloom_positions(F.col(key_col), m, n_hashes)
            ).alias("pos")
        )
        .distinct()
        .groupBy((F.col("pos") / 64).cast("long").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(pos % 64 as int))")
            ).alias("mask")
        )
        .collect()
    )
    packed = np.zeros(m // 64, dtype=np.uint64)
    for row in words:
        packed[int(row["word"])] = np.uint64(
            int(row["mask"]) & 0xFFFFFFFFFFFFFFFF
        )
    return packed, m


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    words: np.ndarray,
    m: int,
    n_hashes: int = 6,
) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` the filter might contain — a
    superset of the true members (fp ≈ 0.5^n_hashes), with the Bloom
    test run as one Arrow-batched numpy pass over JVM-computed
    positions."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(words)

    @F.pandas_udf("boolean")
    def _hit(positions: pd.Series) -> pd.Series:
        bits = bc.value
        if len(positions) == 0:
            return pd.Series([], dtype=bool)
        mat = np.vstack(positions.to_numpy())  # (batch, k) int64
        w = bits[mat >> 6]
        hit = (w >> (mat & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(np.all(hit.astype(bool), axis=1))

    return (
        df.withColumn(
            "_bloom_pos", bloom_positions(F.col(key_col), m, n_hashes)
        )
        .filter(_hit(F.col("_bloom_pos")))
        .drop("_bloom_pos")
    )


def bloom_prefilter_jvm(
    df: DataFrame,
    key_col: str,
    words: np.ndarray,
    m: int,
    n_hashes: int = 6,
) -> DataFrame:
    """JVM-side variant of :func:`bloom_prefilter`: the packed bitset
    rides a 1-row broadcast DataFrame as an ``array<bigint>`` column
    and every probe is a pure Column expression
    (``element_at(words, pos div 64 + 1) >> (pos & 63)) & 1`` —
    whole-stage-codegen, NO Python in the row path.

    Why both exist: the pandas-UDF probe ships each row's k positions
    through Arrow — measured 40× slower than the plain broadcast join
    it was supposed to beat when the probed side is the 100 TB fact
    table (SCALING_r09c first run).  This form keeps the probe at
    codegen speed; the UDF form remains for contexts already inside a
    Python stage.  Output sets are identical (same hash family, same
    bitset)."""
    spark = df.sparkSession
    arr = [int(x) for x in words.astype(np.int64)]
    bf = local_df(
        spark, [(arr,)], "__bloom_words array<bigint>"
    )
    cond = F.lit(True)
    for i in range(1, n_hashes + 1):
        bit = F.expr(
            f"(shiftright(element_at(__bloom_words, "
            f"cast(element_at(_bp, {i}) div 64 as int) + 1), "
            f"cast(element_at(_bp, {i}) % 64 as int))) & 1"
        )
        cond = cond & (bit == 1)
    return (
        df.withColumn(
            "_bp", bloom_positions(F.col(key_col), m, n_hashes)
        )
        .crossJoin(F.broadcast(bf))
        .filter(cond)
        .drop("_bp", "__bloom_words")
    )


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    bits_per_key: int = 12,
    n_hashes: int = 6,
) -> DataFrame:
    """Equi-join with an explicit Bloom runtime filter: build the
    bitset from the SMALL side's distinct keys, prefilter the BIG side
    map-side before its shuffle, then run the exact join (which
    removes the Bloom false positives) — output identical to
    ``big.join(small, key_col)``, but the big side reaches the shuffle
    pre-shrunk to matches + fp noise.

    This is the join-pruning shape engines call a runtime filter /
    sideways information passing: at 100 TB the win is that the
    filtered-out rows never leave their input partitions — with a
    selective dimension predicate the big side's shuffle drops by the
    selectivity factor while the bitset costs ~1.5 bytes/key
    broadcast.  (Spark's own AQE runtime filters cover common cases;
    the explicit operator makes the technique available composed with
    anything, and its bitset build is the audited bloom.py path:
    JVM-side hashing, bit_or word aggregation, bitset-sized driver
    state.)

    The small side is counted once to size the filter (a driver
    scalar, like the reference's α sidecar — the side is dimension-
    sized by assumption).
    """
    keys = small.select(key_col).distinct().persist()
    n_keys = keys.count()
    words, m = bloom_build(
        keys, key_col, n_keys, bits_per_key, n_hashes
    )
    keys.unpersist()
    pruned = bloom_prefilter_jvm(big, key_col, words, m, n_hashes)
    return pruned.join(small, key_col)
