"""Time-series operators: range-interval rolling aggregates and
gap-fill over per-group time spines — the hypertable / continuous-
aggregate family (no counterpart in the reference; part of the
training-data-pipeline extension surface, like `asof.py`).

All three operators are pure DataFrame compositions (SURVEY.md 'custom
operators' rule (a)): no UDF, no driver loop, no collect.

Scale notes (100 TB):
- ``rolling_range_agg`` is ONE shuffle on the partition key followed by
  a sort-within-partition and a streaming range frame — identical cost
  to any window aggregation; skew follows the key's own skew (salt the
  key upstream if one user owns the stream).
- ``time_spine`` derives each group's [min, max] bucket from a partial
  aggregation and EXPLODES the spine executor-side via
  ``sequence(min, max, interval)`` — the spine never exists on the
  driver, so a million groups × a year of hours is just another
  distributed relation.  Spark caps a single ``sequence()`` at
  ~2.5M elements per row — far beyond any sane bucket count per group
  (a decade of seconds per group is the wrong data model anyway).
- ``gap_fill`` left-joins real buckets onto the spine (shuffle on
  (group, bucket) — co-partitioned with the spine's own explode) and
  forward-fills with ``last(ignorenulls)`` over an unbounded-preceding
  frame: one more window pass, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_agg(
    df: DataFrame,
    by: str,
    ts_col: str,
    window_us: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Per-``by``-key rolling aggregates over a trailing TIME window:
    for every row, aggregate all rows of the same key with
    ``ts ∈ [row.ts - window_us, row.ts]`` (both ends inclusive —
    matching SQL ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``).

    ``aggs`` maps output column name → aggregate Column (e.g.
    ``{"cents_24h": F.sum("cents")}``).  The frame is a RANGE frame
    over ``unix_micros(ts)``, so rows with equal timestamps are peers
    and see each other regardless of tie order — the result is
    deterministic without a tiebreak column.
    """
    w = (
        Window.partitionBy(by)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_us, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def time_spine(
    buckets: DataFrame,
    by: list[str],
    bucket_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-group contiguous time spine: one row per ``step`` between
    each group's min and max bucket (inclusive).  ``buckets`` is an
    already-bucketed relation (e.g. an hourly aggregate); the spine is
    generated executor-side with ``sequence()`` — no driver collect.
    """
    bounds = buckets.groupBy(*by).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    return bounds.select(
        *by,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )


def gap_fill(
    buckets: DataFrame,
    by: list[str],
    bucket_col: str,
    value_cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """Fill holes in a bucketed time series: left-join the real buckets
    onto the per-group spine, mark gaps, and forward-fill each value
    column with the most recent real value (``<col>_ff``; the raw
    column keeps its null so both gap-aware and carried readings are
    available).  The first buckets of a group are never gaps (the
    spine starts at the group's min), so every ``_ff`` is non-null.
    """
    spine = time_spine(buckets, by, bucket_col, step)
    joined = spine.join(buckets, [*by, bucket_col], "left")
    w = (
        Window.partitionBy(*by)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "was_gap", F.col(value_cols[0]).isNull()
    )
    for c in value_cols:
        out = out.withColumn(f"{c}_ff", F.last(c, ignorenulls=True).over(w))
    return out
