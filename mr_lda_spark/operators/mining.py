"""Association mining — frequent item pairs with support and lift
(the first two levels of A-priori, the market-basket workload).
No counterpart in the reference (LLM-data-pipeline / analytics
extension, like ``graph.py``).

Scale shape (100 TB): item marginals are one groupBy; candidate pairs
explode per basket as C(k, 2) — bounded by basket size, not corpus
size — and reduce through map-side partial aggregation; the support
threshold prunes BEFORE the marginals join (anti-monotonicity: a pair
cannot be frequent if its count is below threshold, so the join input
is answer-sized).  Lift is emitted in INTEGER parts-per-million via
floor division — cross-engine exact, no float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["copurchase_lift", "item_similarity_topk"]


def item_similarity_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    min_support: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Item-item collaborative filtering: top-``k`` most similar items
    per item by co-occurrence cosine ``n_ab / sqrt(n_a · n_b)`` over
    baskets — (item, rank, neighbor, sim).

    Built on the same support-pruned pair relation as
    :func:`copurchase_lift` (anti-monotone threshold before the
    marginal joins), symmetrized, then a per-item rank window
    (sim desc, neighbor asc — deterministic under ties).  The cosine
    is sqrt-of-exact-integers then one division — correctly-rounded
    IEEE ops, so engines agree bit-for-bit before the cosmetic
    round."""
    pairs = copurchase_lift(
        baskets, basket_col, item_col, min_support
    ).select("item_a", "item_b", "n_pair", "n_a", "n_b")
    sym = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_pair",
            F.col("n_b").alias("n_a"),
            F.col("n_a").alias("n_b"),
        )
    )
    sim = F.col("n_pair").cast("double") / F.sqrt(
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("item_a").orderBy(
        sim.desc(), F.col("item_b").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("item_a").alias("item"),
            F.col("rank").cast("int").alias("rank"),
            F.col("item_b").alias("neighbor"),
            F.round(sim, round_to).alias("sim"),
        )
    )


def copurchase_lift(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent item pairs over (basket, item) rows →
    (item_a, item_b, n_pair, n_a, n_b, n_baskets, lift_ppm) for every
    unordered pair co-occurring in ≥ ``min_support`` baskets.

    lift = P(ab) / (P(a)·P(b)) = (n_ab · N) / (n_a · n_b), emitted as
    ``(n_ab · N · 10⁶) div (n_a · n_b)`` — exact integers throughout:
    the products run in decimal(38,0) (n_ab·N·10⁶ would wrap int64
    silently past ~3M baskets in non-ANSI Spark), and the quotient is
    division-shrunk back under int64 before the BIGINT cast."""
    b = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = b.select("__b").distinct().count()
    marg = b.groupBy("__i").agg(F.count(F.lit(1)).alias("n_item"))
    left = b.select("__b", F.col("__i").alias("item_a"))
    right = b.select("__b", F.col("__i").alias("item_b"))
    pair_counts = (
        left.join(right, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )
    ma = marg.select(
        F.col("__i").alias("item_a"), F.col("n_item").alias("n_a")
    )
    mb = marg.select(
        F.col("__i").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair_counts.join(ma, "item_a")
        .join(mb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            F.lit(n_baskets).cast("bigint").alias("n_baskets"),
            # decimal(38,0) sufficient products (the standing rule from
            # pearson_correlations): n_pair·N·10⁶ wraps int64 silently
            # in non-ANSI Spark past ~3M baskets while the DuckDB
            # oracle raises — exact decimals on both engines instead
            # (ADVICE r9 #3).  lift_ppm itself is division-shrunk, so
            # the final BIGINT cast is lossless.
            F.expr(
                f"CAST((CAST(n_pair AS DECIMAL(38,0)) * {n_baskets}"
                f" * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
                f" AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
