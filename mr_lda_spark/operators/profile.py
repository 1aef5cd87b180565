"""Table profiling: per-column statistics in ONE scan.

The data-quality audit a pipeline runs before ingesting a new source:
null counts, exact distinct cardinality, lexicographic/numeric min-max.
All columns are profiled in a single ``agg`` — Catalyst plans the
multi-distinct via one Expand + partial aggregation, so the input scans
once no matter how many columns are profiled (vs the naive
one-query-per-column loop).  Output is tall (one row per column) so the
profile of a 1000-column table is still a tiny result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Return (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) per profiled column; min/max rendered as strings so
    mixed-type tables stack into one relation."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__dist_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")
