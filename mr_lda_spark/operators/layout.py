"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for min/max data skipping, the lakehouse table-layout operator
(Delta/Iceberg ``OPTIMIZE ZORDER BY`` shape; no counterpart in the
reference, lintool/Mr.LDA).

Why it matters at 100 TB: parquet scan pruning works off per-file
min/max column statistics.  A table sorted by ONE key gives perfect
extents on that key and full-range extents on every other — a filter
on the second key prunes nothing.  Interleaving the bits of both keys
(the Morton curve) bounds every file's extent in EVERY interleaved
dimension, so a selective filter on either key (or both) skips most
files.

Everything here is integer-exact and engine-portable by construction:

- quantization ``xq = (x · 2^qbits) div (max_x + 1)`` — integer floor
  division, never a float;
- the Morton key is Σ bit_i(xq)·2^(2i+1) + bit_i(yq)·2^(2i) — shifts
  and masks only;
- a "file" (cell) is the key's top ``2·levels`` bits, i.e. a quadtree
  cell — computed by ONE shift, no global sort and no row_number over
  an unpartitioned window (the classic z-order-by-sort needs a range
  partitioner; the quadtree-cell form is embarrassingly parallel and
  equivalent for skipping statistics);
- the skip decision per cell is the standard min/max interval
  disjointness test against a probe box given in integer percent of
  each dimension's max, so the same literal box works at every SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_key", "zorder_cell_extents"]


def morton_key(xq: Column, yq: Column, qbits: int) -> Column:
    """Interleave the low ``qbits`` bits of two quantized ints:
    x's bit i lands at position 2i+1, y's at 2i (x is the
    higher-order dimension).  Pure shift/mask arithmetic — identical
    in any engine with integer semantics."""
    key = F.lit(0).cast("long")
    for i in range(qbits):
        xb = F.shiftright(xq, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(yq, i).bitwiseAND(F.lit(1))
        key = (
            key
            + xb.cast("long") * F.lit(1 << (2 * i + 1))
            + yb.cast("long") * F.lit(1 << (2 * i))
        )
    return key


def zorder_cell_extents(
    df: DataFrame,
    x_col: str,
    y_col: str,
    qbits: int = 10,
    levels: int = 5,
    probe_pct: tuple[tuple[int, int], tuple[int, int]] = (
        (25, 30),
        (40, 60),
    ),
) -> DataFrame:
    """Per-cell layout statistics after z-order clustering on
    (``x_col``, ``y_col``): one row per occupied quadtree cell (the
    Morton key's top ``2·levels`` bits) with row count, the raw
    min/max extents of both dimensions — exactly the parquet footer
    stats a scan would prune on — and ``hits_probe``: whether the
    cell's extents intersect the probe box (given in integer percent
    of each dimension's observed max).  ``sum(n) where hits_probe``
    over this relation ÷ total = the fraction of the table a probe
    scan must read.

    The max() quantization bounds come from a 1-row aggregate joined
    back by a broadcast cross join — no driver collect in the plan.
    Coordinates must be non-negative (Morton interleave is defined on
    unsigned ints); shift/mask of a negative key would produce a
    meaningless curve position.
    """
    (x_lo_pct, x_hi_pct), (y_lo_pct, y_hi_pct) = probe_pct
    maxes = df.agg(
        F.max(F.col(x_col)).cast("long").alias("_xmax"),
        F.max(F.col(y_col)).cast("long").alias("_ymax"),
    )
    # quantize in BIGINT: with a 32-bit input column the raw multiply
    # can overflow int32 (ANSI error or wrapped garbage cells), and the
    # DuckDB oracle promotes — cast FIRST so both engines agree.
    scaled = df.crossJoin(F.broadcast(maxes)).select(
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.expr(
            f"(CAST({x_col} AS BIGINT) * {1 << qbits}) div (_xmax + 1)"
        ).alias("_xq"),
        F.expr(
            f"(CAST({y_col} AS BIGINT) * {1 << qbits}) div (_ymax + 1)"
        ).alias("_yq"),
        "_xmax",
        "_ymax",
    )
    cell = F.shiftright(
        morton_key(F.col("_xq"), F.col("_yq"), qbits),
        2 * (qbits - levels),
    )
    per_cell = (
        scaled.withColumn("cell", cell.cast("long"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
            F.first("_xmax").alias("_xmax"),
            F.first("_ymax").alias("_ymax"),
        )
    )
    x_lo = F.expr(f"(_xmax * {x_lo_pct}) div 100")
    x_hi = F.expr(f"(_xmax * {x_hi_pct}) div 100")
    y_lo = F.expr(f"(_ymax * {y_lo_pct}) div 100")
    y_hi = F.expr(f"(_ymax * {y_hi_pct}) div 100")
    hits = ~(
        (F.col("x_max") < x_lo)
        | (F.col("x_min") > x_hi)
        | (F.col("y_max") < y_lo)
        | (F.col("y_min") > y_hi)
    )
    return per_cell.select(
        "cell",
        "n_rows",
        "x_min",
        "x_max",
        "y_min",
        "y_max",
        hits.alias("hits_probe"),
    )
