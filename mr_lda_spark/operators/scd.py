"""Slowly-changing-dimension (Type 2) construction — collapse an
observation stream into versioned validity intervals.

The warehouse-side operator every curation pipeline eventually needs:
given per-entity observations over time (here: a key, one or more
tracked attributes, a deterministic ordering), emit one row per
CONSECUTIVE RUN of identical attribute values with
``[valid_from, valid_to)`` interval columns, a per-entity version
number, and an ``is_current`` flag for the open run.  (No counterpart
in the reference, lintool/Mr.LDA — LLM-data-pipeline suite.)

Plan shape (100 TB): everything is keyed by the entity — one shuffle
on the key feeds a streaming lag window, a running-sum window, the
run groupBy, and the lead window; no global sort, no driver state, no
UDF.  Entity skew is bounded by that entity's own observation count
(a window over one entity's rows is linear), and AQE handles the
residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2"]


def scd2(
    observations: DataFrame,
    key_col: str,
    attr_cols: list[str],
    order_cols: list[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Type-2 SCD rows from an observation stream.

    ``order_cols`` must be a TOTAL order within each key (include a
    unique id as tie-break) or run boundaries are nondeterministic.
    ``ts_col`` (default: first of ``order_cols``) supplies the
    interval endpoints: ``valid_from`` = first observation of the run,
    ``valid_to`` = next run's valid_from (null ⇒ current).

    Change detection treats NULL attribute values as a distinct state
    (null → 'X' and 'X' → null both open a new version), via
    null-safe comparison.
    """
    ts_col = ts_col or order_cols[0]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1
    flagged = observations.withColumn(
        "_chg", (first | changed).cast("int")
    )
    run = flagged.withColumn(
        "version",
        F.sum("_chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    grp = run.groupBy(key_col, "version").agg(
        *[F.min(a).alias(a) for a in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return grp.select(
        key_col,
        "version",
        *attr_cols,
        "valid_from",
        valid_to.alias("valid_to"),
        "n_obs",
        valid_to.isNull().alias("is_current"),
    )
