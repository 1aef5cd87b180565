"""Count-min sketch — the bounded-state aggregation path for heavy
hitters over key spaces too large to shuffle in full.

Sibling of ``operators/bloom.py`` in the sketch-prefilter + exact-
verify family (the reference, lintool/Mr.LDA, has neither; both belong
to the LLM-data-pipeline suite).  An exact heavy-hitters query
shuffles every distinct key; at 100 TB the n-gram key space dwarfs the
answer.  The CMS route never shuffles keys at all:

1. BUILD — every key occurrence maps to ``depth`` cells
   (``pmod(xxhash64(key, d), width)``, JVM-side) and the corpus
   reduces to the (depth × width) cell-count table — the shuffle after
   partial aggregation is AT MOST depth×width rows PER PARTITION no
   matter the corpus (the sketch property), and the collected table is
   a few KB.
2. PROBE — the table broadcasts back; each row's estimate
   (min over its depth cells, the classic CMS bound: est ≥ true count,
   overestimate ≈ collisions) is an Arrow-vectorized numpy gather.
   The ≥-threshold filter runs MAP-SIDE, and because the estimate is a
   function of the key alone, all occurrences of a key pass or fail
   together — so the surviving rows are exactly every occurrence of
   every candidate key.
3. VERIFY — an exact groupBy over candidate occurrences only (true
   hitters + collision noise), re-applying the threshold on the exact
   counts.  Output is bit-identical to the full exact query; the only
   cost that scales with the corpus is two linear passes.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cms_positions", "cms_table", "cms_build", "cms_candidates",
    "heavy_hitters_cms", "cms_positions_md5", "selfjoin_mass_estimate",
    "ams_f2_estimate", "ams_cells", "ams_estimate_from_cells",
    "CmsSaturationWarning", "cms_tail_pass_fraction",
]


class CmsSaturationWarning(UserWarning):
    """The sketch width cannot prune at this threshold — the prefilter
    will pass (nearly) everything and the query degrades to the exact
    groupBy plus two wasted passes."""


def cms_tail_pass_fraction(table: np.ndarray, threshold: int) -> float:
    """Expected prefilter pass fraction for a TAIL key, from the
    sketch itself — PERF_NOTES_r09 §1's width-sizing rule
    ("tail-mass/width must stay below the threshold, else the
    prefilter saturates") in its directly-testable form.

    A tail key hashes to one uniform cell per depth row and its
    estimate is the min of those cells, so it survives the ≥threshold
    filter iff EVERY row's cell is already at the bar:
    pass ≈ Π_d (fraction of row-d cells ≥ threshold).  Cells cross
    the bar either because they hold a true hitter (≈ n_hitters/width
    per row — harmless, tiny) or because the collision load
    tail_mass/width approaches the threshold — the saturation the
    rule bounds.  Everything needed is in the collected
    (depth, width) table: no extra pass over the data."""
    frac = (table >= threshold).mean(axis=1)
    return float(np.prod(frac))


def cms_positions(key: Column, width: int, depth: int) -> Column:
    """Per-row cell columns for each of the ``depth`` hash rows, as an
    ``array<bigint>`` — shared by build and probe so the two sides use
    the same hash family by construction."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width))
            for d in range(depth)
        ]
    )


def cms_table(
    keys: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """The sketch as a relation: (d, col, cnt) cell counts — at most
    depth × width rows total, reached through partial aggregation (the
    map side emits at most that many rows per partition)."""
    return (
        keys.select(
            F.posexplode(
                cms_positions(F.col(key_col), width, depth)
            ).alias("d", "col")
        )
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_build(
    keys: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> np.ndarray:
    """Collect the cell table into a (depth, width) int64 array (a few
    KB — the sketch, not the keys)."""
    table = np.zeros((depth, width), dtype=np.int64)
    for row in cms_table(keys, key_col, width, depth).collect():
        table[int(row["d"]), int(row["col"])] = int(row["cnt"])
    return table


def cms_candidates(
    keys: DataFrame,
    key_col: str,
    threshold: int,
    width: int = 8192,
    depth: int = 5,
    table: "np.ndarray | None" = None,
) -> DataFrame:
    """The prefilter stage alone: every OCCURRENCE whose key's CMS
    min-estimate clears ``threshold`` (true hitters + collision
    noise; all occurrences of a key pass or fail together).  Exposed
    separately so probes can measure the pass fraction — the
    saturation diagnostic: once avg cell load ≳ threshold the
    estimate clears the bar everywhere and the pass fraction → 1.

    ``table`` injects a pre-built (depth, width) cell array — the
    streaming path builds the sketch incrementally (``cms_table`` is
    one groupBy-count, exactly the aggregate Structured Streaming
    maintains) and probes the batch corpus with it."""
    spark = keys.sparkSession
    tbl = (
        cms_build(keys, key_col, width, depth) if table is None else table
    )
    # Width-sizing guard (VERDICT r9 "Next round" #5): if most tail
    # keys' min-estimates already clear the threshold, the prefilter
    # passes (nearly) everything and the caller pays two extra corpus
    # passes for nothing.  Warn (not raise: output stays exact either
    # way) with the width that would restore pruning — pass fraction
    # scales with (tail_mass/(width*threshold))^depth, so growing
    # width by the measured load ratio collapses it.
    pf = cms_tail_pass_fraction(tbl, threshold)
    if pf >= 0.5:
        import warnings

        load = int(tbl.sum(axis=1).min()) // max(threshold, 1) + 1
        warnings.warn(
            CmsSaturationWarning(
                f"CMS width {tbl.shape[1]} saturated at threshold "
                f"{threshold}: expected tail-key pass fraction "
                f"{pf:.2f} — the prefilter cannot prune. Use width "
                f">~ {load} (row mass / threshold) or run the exact "
                f"groupBy directly."
            ),
            stacklevel=2,
        )
    bc = spark.sparkContext.broadcast(tbl)

    @F.pandas_udf("boolean")
    def _maybe_heavy(positions: pd.Series) -> pd.Series:
        table = bc.value
        if len(positions) == 0:
            return pd.Series([], dtype=bool)
        mat = np.vstack(positions.to_numpy())  # (batch, depth)
        d_idx = np.arange(mat.shape[1])[None, :]
        est = table[d_idx, mat].min(axis=1)
        return pd.Series(est >= threshold)

    return (
        keys.withColumn(
            "_cms_pos",
            cms_positions(F.col(key_col), width, depth),
        )
        .filter(_maybe_heavy(F.col("_cms_pos")))
        .drop("_cms_pos")
    )


def heavy_hitters_cms(
    keys: DataFrame,
    key_col: str,
    threshold: int,
    width: int = 8192,
    depth: int = 5,
    table: "np.ndarray | None" = None,
) -> DataFrame:
    """Exact heavy hitters (count ≥ threshold) through the CMS
    prefilter: identical output to the plain groupBy-HAVING query,
    without ever shuffling the full key space.  ``keys`` is one row
    per key OCCURRENCE (e.g. exploded tokens).  ``table`` optionally
    injects an externally-built sketch (see :func:`cms_candidates`)."""
    candidates = cms_candidates(
        keys, key_col, threshold, width, depth, table=table
    )
    return (
        candidates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


def cms_positions_md5(key: Column, width: int, depth: int) -> Column:
    """md5-derived cell positions (``('0x'+md5(d:key)[:15]) % width``
    per depth row) — same role as :func:`cms_positions` but in the
    one hash family a SQL oracle can recompute bit-for-bit (the
    HLL-module trick applied to the CMS; xxhash64 is Spark-only)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(str(d)), key)), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(width),
            )
            for d in range(depth)
        ]
    )


def selfjoin_mass_estimate(
    keys: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """Upper-bound estimate of the equi-self-join mass Σ_k df(k)² —
    the pre-flight diagnostic for any inverted-index pair join (the
    candidate-pair count that decides whether a dedup self-join will
    detonate) — WITHOUT shuffling the key space: from the md5-family
    CMS cell table, ``est = min_d Σ_c cnt[d][c]²``.  Each depth row's
    Σc² equals the true F₂ plus non-negative collision cross terms,
    so every row is ≥ the truth and the min is the tightest upper
    bound the sketch offers (the classic CMS inner-product estimate
    of a relation with itself).

    Returns one row (width, depth, est_mass, exact_mass,
    overestimate_ppm); the exact column is the audit the production
    caller skips.  Integer-exact throughout."""
    cells = (
        keys.select(
            F.posexplode(
                cms_positions_md5(F.col(key_col), width, depth)
            ).alias("d", "col")
        )
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    est = (
        cells.groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("m"))
        .agg(F.min("m").alias("est_mass"))
    )
    exact = (
        keys.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * F.col("df")).alias("exact_mass"))
    )
    return est.crossJoin(exact).select(
        F.lit(width).cast("int").alias("width"),
        F.lit(depth).cast("int").alias("depth"),
        F.col("est_mass").cast("bigint").alias("est_mass"),
        F.col("exact_mass").cast("bigint").alias("exact_mass"),
        F.expr("(est_mass * 1000000) div exact_mass").alias(
            "overestimate_ppm"
        ),
    )


def ams_f2_estimate(
    keys: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """UNBIASED F₂ (self-join mass) estimate by AMS / CountSketch —
    the two-sided companion to :func:`selfjoin_mass_estimate`'s CMS
    upper bound: each key also draws a ±1 sign per depth row, cells
    accumulate SIGNED counts, and Σ_c val² per row is an unbiased F₂
    estimator (collision cross terms cancel in expectation); the
    MEDIAN over depth rows controls variance.  The median is taken
    relationally (rank the depth sums, pick the middle row — integer,
    deterministic) so the whole estimate is oracle-checkable in the
    md5 hash family.

    Same bounded-state shape as every sketch here: the corpus reduces
    to depth×width cells through partial aggregation; nothing else
    scales with the key space.

    Split as :func:`ams_cells` (the streaming-safe groupBy-sum) +
    :func:`ams_estimate_from_cells` (the estimator tail) so the
    streaming twin reuses both verbatim."""
    return ams_estimate_from_cells(
        ams_cells(keys, key_col, width, depth), keys, key_col, width, depth
    )


def ams_cells(
    keys: DataFrame, key_col: str, width: int = 8192, depth: int = 5
) -> DataFrame:
    """The signed AMS cell relation (d, col, val) — one
    groupBy().sum() over md5-derived cells and ±1 signs: the
    incrementally-maintainable aggregate shape (state bounded at
    depth × width cells), shared verbatim by the batch estimator and
    the Structured Streaming twin."""
    pos = cms_positions_md5(F.col(key_col), width, depth)
    sign = F.array(
        *[
            F.when(
                F.instr(
                    F.lit("01234567"),
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit(f"s{d}"), F.col(key_col)
                            )
                        ),
                        1,
                        1,
                    ),
                )
                > 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            for d in range(depth)
        ]
    )
    cells = (
        keys.select(
            F.posexplode(pos).alias("d", "col"), sign.alias("__s")
        )
        .select("d", "col", F.expr("element_at(__s, d + 1)").alias("sgn"))
        .groupBy("d", "col")
        .agg(F.sum("sgn").alias("val"))
    )
    return cells


def ams_estimate_from_cells(
    cells: DataFrame,
    exact_keys: DataFrame,
    key_col: str,
    width: int = 8192,
    depth: int = 5,
) -> DataFrame:
    """Estimator tail over an (already-built) signed cell relation:
    per-row Σ val², relational median across rows, plus the exact-F₂
    audit column from ``exact_keys`` (the pass production callers
    skip)."""
    per_row = cells.groupBy("d").agg(
        F.sum(F.col("val") * F.col("val")).alias("m")
    )
    w = Window.orderBy("m", "d")
    med = (
        per_row.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == (depth + 1) // 2)
        .select(F.col("m").alias("ams_f2"))
    )
    exact = (
        exact_keys.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * F.col("df")).alias("exact_mass"))
    )
    return med.crossJoin(exact).select(
        F.lit(width).cast("int").alias("width"),
        F.lit(depth).cast("int").alias("depth"),
        F.col("ams_f2").cast("bigint").alias("ams_f2"),
        F.col("exact_mass").cast("bigint").alias("exact_mass"),
        F.expr("(ams_f2 * 1000000) div exact_mass").alias("ratio_ppm"),
    )
