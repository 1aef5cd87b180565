"""As-of (most-recent-match) join — an operator Spark's DataFrame API
lacks, composed from union + partitioned window (SURVEY.md 'custom
operators' rule (a): composition of existing ops, no UDF).

Semantics: for every left row, attach the right row with the greatest
``right_ts`` ≤ ``left_ts`` within the same ``by`` key (the classic
point-in-time/backward as-of join; DuckDB/kdb ``ASOF JOIN``).

Plan shape: union the two sides, one shuffle on ``by``, one
sort-within-partition by (ts, side), carry the right payload forward
with ``last(..., ignorenulls)`` over an unbounded-preceding frame, then
keep left rows.  Cost ≡ one window aggregation over left+right — no
range-explosion, no per-row probing; scales with AQE like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_payload: list,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join.  Right payload columns are appended with
    ``suffix``; left rows with no prior right row get nulls.

    Ties (right_ts == left_ts) match, mirroring DuckDB ASOF JOIN's
    ``l.ts >= r.ts``.
    """
    l_tag = left.select(
        F.col(by).alias("__by"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r_tag = right.select(
        F.col(by).alias("__by"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tag.schema["__left"].dataType
        ).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = l_tag.unionByName(r_tag)
    # Right rows sort before left rows at equal ts so ties match.
    w = (
        Window.partitionBy("__by")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in right_payload
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__left.*"),
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
