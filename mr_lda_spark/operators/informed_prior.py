"""Informed prior η (InformedPrior.java / U4, F5, J5).

The reference tool dictionary-encodes per-topic seed-word lists (one
line per topic, words whitespace-separated, InformedPrior.java:139-170)
into `SequenceFile<topic, termIds>`; at M-step time seed words get
prior weight log(1000) and non-seed words log(0.001)
(InformedPrior.java:43-44, TermReducer.java:162-167); with no prior
file every term gets log(1e-12) (Settings.java:58).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_lda_spark.operators.localrel import local_df

from mr_lda_spark.schemas import ETA

LOG_ETA_SEED = np.log(1000.0)  # InformedPrior.java:43
LOG_ETA_OTHER = np.log(0.001)  # InformedPrior.java:44
LOG_ETA_UNINFORMED = np.log(1e-12)  # Settings.java:58


def parse_informed_prior(
    spark: SparkSession, path: str, dictionary: DataFrame
) -> DataFrame:
    """Seed-list file → η table (topic, term_id).

    Line *i* (0-based topic id) holds topic i's seed words; words not
    in the dictionary are dropped (the reference precondition-fails,
    InformedPrior.java:155-158 — dropping is the forgiving choice and
    is logged by the count difference).
    """
    lines = spark.read.text(path).collect()  # model-sized: driver-side
    rows = []
    for topic, line in enumerate(lines):
        for w in line["value"].split():
            rows.append((topic, w))
    seeds = local_df(spark, rows, "topic int, term string")
    return (
        seeds.join(F.broadcast(dictionary.select("term", "term_id")), "term")
        .select("topic", "term_id")
        .distinct()
    )


def eta_from_rows(eta: DataFrame, num_terms: int, num_topics: int) -> np.ndarray:
    """η table → dense (V+1, K) log-prior matrix for the M-step
    (seed → log 1000, others → log 0.001)."""
    mat = np.full((num_terms + 1, num_topics), LOG_ETA_OTHER)
    for r in eta.collect():  # model-sized
        if 0 <= r["topic"] < num_topics and 0 < r["term_id"] <= num_terms:
            mat[r["term_id"], r["topic"]] = LOG_ETA_SEED
    return mat
