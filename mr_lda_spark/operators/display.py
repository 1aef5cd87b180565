"""DisplayTopic / DisplayDocument equivalents (SURVEY.md §3.3, ops O3/O5).

The reference scans beta row-by-row in the driver keeping a bounded
TreeMap per topic (DisplayTopic.java:119-127); here it's a rank window
partitioned by topic — fully distributed, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_terms_per_topic(
    beta: DataFrame,
    term_dict: DataFrame | None = None,
    k: int = 10,
) -> DataFrame:
    """O3: top-k terms per topic by log_beta (DisplayTopic.java:33-34,
    119-138; default k=10 per -topdisplay, DisplayTopic.java:75-77).

    The window is partitioned by topic so it scales with K regardless of
    vocabulary size; the dictionary join broadcasts (J-small-dim).
    """
    w = Window.partitionBy("topic").orderBy(
        F.col("log_beta").desc(), F.col("term_id").asc()
    )
    top = (
        beta.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if term_dict is not None:
        top = top.join(
            F.broadcast(term_dict.select("term_id", "term")), "term_id", "left"
        )
        return top.select("topic", "rank", "term_id", "term", "log_beta")
    return top.select("topic", "rank", "term_id", "log_beta")


def display_document(gamma: DataFrame, doc_ids=None, flat: bool = False) -> DataFrame:
    """DisplayDocument: dump per-doc topic posteriors
    (DisplayDocument.java:83-100) — normalized to a distribution.

    ``flat=True`` explodes the distribution to one ``(doc_id, topic,
    weight)`` row per topic — a plain relational shape any downstream
    consumer (or row-hash comparator) can sort and digest.
    """
    out = gamma
    if doc_ids is not None:
        out = out.filter(F.col("doc_id").isin(list(doc_ids)))
    total = F.aggregate("gamma", F.lit(0.0), lambda a, x: a + x)
    dist = out.select(
        "doc_id",
        F.transform("gamma", lambda x: x / total).alias("topic_distribution"),
    )
    if not flat:
        return dist
    return dist.select(
        "doc_id",
        F.posexplode("topic_distribution").alias("topic", "weight"),
    )
