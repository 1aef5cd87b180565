"""Interval (range-overlap) join — with no equi-key, Spark plans an
interval predicate as a CartesianProduct / BroadcastNestedLoopJoin;
this operator manufactures the equi-key by TIME-BINNING (SURVEY.md
'custom operators' rule (a): composition of existing ops, no UDF) —
the standard bin-bucketed range-join used by Databricks' range-join
hints and spatial binning.

Every interval explodes to the fixed-width buckets it spans; two
intervals overlap only if they share ≥ 1 bucket, so a bucket
equi-join generates a complete candidate set, dedup drops
multi-bucket repeats, and the exact inclusive predicate
``start_b ≤ end_a AND start_a ≤ end_b`` refines.  Cost: fan-out is
interval_length / bucket per row (pick bucket ≈ typical interval
length), the join shuffles on bucket (AQE-splittable), and the only
quadratic term is per-bucket candidate pairs — which is output-bound
for overlap analytics (the concurrency you're asking about IS the
pair count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    df: DataFrame,
    keys: list[str],
    start: str,
    end: str,
    bucket: int,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All pairs of rows whose [start, end] intervals overlap
    (inclusive endpoints: touching intervals count, overlap 0), each
    pair once with the lexicographically-smaller ``keys`` tuple on the
    ``_a`` side.  Appends ``overlap`` = the shared span length.

    ``start``/``end`` are numeric (e.g. epoch seconds); ``bucket`` is
    the bin width in the same unit.
    """
    sa, sb = suffixes
    cols = [*keys, start, end]
    binned = df.select(
        *cols,
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket),
                F.floor(F.col(end) / bucket),
            )
        ).alias("__bk"),
    )
    left = binned.select(
        "__bk", *[F.col(c).alias(f"{c}{sa}") for c in cols]
    )
    right = binned.select(
        "__bk", *[F.col(c).alias(f"{c}{sb}") for c in cols]
    )
    ka = F.struct(*[F.col(f"{k}{sa}") for k in keys])
    kb = F.struct(*[F.col(f"{k}{sb}") for k in keys])
    return (
        left.join(right, "__bk")
        .filter(ka < kb)
        .drop("__bk")
        .distinct()  # a pair can share several buckets
        .filter(
            (F.col(f"{start}{sb}") <= F.col(f"{end}{sa}"))
            & (F.col(f"{start}{sa}") <= F.col(f"{end}{sb}"))
        )
        .withColumn(
            "overlap",
            F.least(F.col(f"{end}{sa}"), F.col(f"{end}{sb}"))
            - F.greatest(F.col(f"{start}{sa}"), F.col(f"{start}{sb}")),
        )
    )
