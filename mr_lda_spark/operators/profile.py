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


def pearson_correlations(
    df: DataFrame, int_cols: list[str]
) -> DataFrame:
    """Pairwise Pearson correlations between INTEGER-VALUED columns
    (callers pre-scale money/ratio columns to cents/basis points) —
    one relation (var_a, var_b, n, r).

    Cross-engine determinism design: the sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) aggregate EXACTLY in ONE scan (a
    single global agg — map-side combined, no shuffle beyond the
    1-row merge).  Products are exact per-row in int64; their SUMS
    are not (Σ(price_cents²) overflowed int64 at sf0.1 — DuckDB
    raised, Spark would have wrapped silently), so sums accumulate as
    decimal(38,0) (exact to 10³⁸; DuckDB's INT128 on the oracle
    side).  The final r converts the exact integers to doubles and
    applies a fixed expression of correctly-rounded IEEE ops
    (·, −, /, sqrt are all exactly specified), so two engines
    computing from the same integers produce the same double;
    round(·, 6) is cosmetic, not load-bearing.  Zero-variance
    columns yield null r."""
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in int_cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast(dec)).alias(f"ss_{c}")
        )
    for i, a in enumerate(int_cols):
        for b in int_cols[i + 1:]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast(dec)).alias(f"sp_{a}_{b}")
            )
    wide = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(int_cols):
        for b in int_cols[i + 1:]:
            nd = F.col("n").cast("double")
            sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
            ssa, ssb = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
            sp = F.col(f"sp_{a}_{b}").cast("double")
            num = nd * sp - sa * sb
            den = F.sqrt((nd * ssa - sa * sa) * (nd * ssb - sb * sb))
            pairs.append(
                F.struct(
                    F.lit(a).alias("var_a"),
                    F.lit(b).alias("var_b"),
                    F.col("n").alias("n"),
                    F.round(
                        F.when(den > 0, num / den), 6
                    ).alias("r"),
                )
            )
    return wide.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
