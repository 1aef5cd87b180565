"""Relational MERGE (SCD1 upsert): apply a batch of updates/inserts to
a base table without a transactional table format.

A lakehouse engine gets MERGE from its table format (Delta/Iceberg/
Hudi rewrite matching files).  The relational core those formats run
underneath is exactly this plan: tag both sides with a priority, union,
and keep the highest-priority row per key — one hash shuffle on the
merge key, fully parallel, no driver involvement.  At 100 TB the union
reads both sides once and the only exchange is the per-key dedup; with
base and updates bucketed on the key it is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """SCD1 semantics: a key present in ``updates`` replaces the base
    row (whole-row update); a key absent from ``base`` inserts.
    ``updates`` must carry the base schema and at most one row per key
    (enforce upstream; ties here would be nondeterministic).
    """
    cols = base.columns
    tagged = (
        updates.select(*cols)
        .withColumn("_src", F.lit(1))
        .unionByName(base.select(*cols).withColumn("_src", F.lit(0)))
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("_src"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def merge_delete(
    base: DataFrame, tombstones: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE ... WHEN MATCHED THEN DELETE: anti-join the tombstone key
    set out of the base.  Broadcast when the tombstone batch is small
    (the common case), so the base never shuffles."""
    t = tombstones.select(*keys).distinct()
    return base.join(F.broadcast(t), keys, "left_anti")
