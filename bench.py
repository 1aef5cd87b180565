#!/usr/bin/env python3
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is forced with a cheap count() action (results are small;
the work is the scan/shuffle/compute, which count() cannot skip since
every query aggregates or ranks first).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "events_hourly",
    "events_sessionize",
    "events_cube",
    "orders_running_total",
    "parse_term_dict",
    "parse_encoded_corpus",
    "top_terms_per_lang",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_jaccard_pairs",
    "text_quality",
    "text_language_id",
    "similarity_cosine_topk",
    "events_asof_join",
    "text_npmi_coherence",
    "curation_pipeline",
    "lda_train_topics",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from mr_lda_spark.session import get_spark
    from mr_lda_spark import queries_registry

    spark = get_spark("mr-lda-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/catalyst on the tiny sf so first-query JIT cost
    # doesn't land on a headline number.
    queries_registry.QUERIES["q1_pricing_summary"](
        spark, "/root/testdata/sf0.001"
    ).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries_registry.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    # Engine-reported LDA throughput (BASELINE.md instrumentation
    # mirror: sec/iteration at fixed K and sweep count).
    lda_metrics = _lda_per_iteration(spark, sf_dir)
    per_query.update(lda_metrics)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


def _lda_per_iteration(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F  # noqa: F401

    from mr_lda_spark.operators import parse
    from mr_lda_spark.plans import lda

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tokens = parse.tokenize(docs)
    dictionary = parse.build_dictionary(parse.term_stats(tokens), docs.count())
    corpus_doc = parse.corpus_to_doc_form(parse.encode_corpus(tokens, dictionary))
    num_terms = dictionary.count()
    t0 = time.perf_counter()
    iters = 3
    lda.train(
        spark,
        corpus_doc,
        num_terms=num_terms,
        num_topics=8,
        max_iterations=iters,
        max_gamma_iter=25,
        converge=0.0,
        seed=1,
    )
    dt = time.perf_counter() - t0
    return {"lda_sec_per_iteration_k8": round(dt / iters, 3)}


if __name__ == "__main__":
    main()
