"""Skew mitigation for hot-key joins (SURVEY.md 'salting for skew').

AQE's skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting remains the tool when one build-side key is so hot that even
split sub-partitions won't fit, or when AQE is unavailable (streaming
joins).  Shape: explode the small side N ways, scatter the big side's
hot keys across the N salts, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side's rows
    scattered across ``n_salts`` sub-keys and the small side replicated
    once per salt.  Result equals a plain join; the shuffle for any
    single key spreads over ``n_salts`` reducers.

    Columns: all of big's + all of small's (minus its join key).
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
