#!/usr/bin/env python3
"""Isolated mono LDA broadcast-vs-join probe at the 500k-doc tier with
a per-phase breakdown of the join iteration (VERDICT r6 item #3: the
1.59x drift).  One measurement per mode per process — run the script
N times for isolated medians.

Phases of the join iteration (materialization boundaries forced here,
matching where actions land inside train_beta_join):
  join_regroup  corpus ⋈ β + groupBy(doc_id)  (docs.count proxy)
  estep_out     full E-step pipeline to the persisted `out` relation
                (includes its own join+regroup — the real stage)
  mstep_lse     φ explode + per-(term,topic) logsumexp + η + norms
  beta_next     digamma kernel + β' regroup + repartition/checkpoint
  driver_pulls  α stats + ELBO + γ checkpoint off the persisted out

Prints ONE JSON line.  Usage: python tools/profile_join_500k.py
[factor] (default 10 → ~500k docs at sf0.1).
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np
    from pyspark.sql import functions as F

    from mr_lda_spark.operators import parse
    from mr_lda_spark.plans import lda, lda_join
    from mr_lda_spark.session import get_spark, read_table

    sys.path.insert(0, _REPO)
    from scale_probe import synth_union

    spark = get_spark("profile-join-500k")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_union(
        read_table(spark, sf_dir, "documents").persist(), factor
    ).persist()
    n_docs_input = docs.count()

    tokens = parse.tokenize(docs)
    dictionary = parse.build_dictionary(parse.term_stats(tokens), n_docs_input)
    tall_raw = parse.encode_corpus(tokens, dictionary)
    num_terms = dictionary.count()
    out: dict = {
        "metric": "profile_join_500k",
        "factor": factor,
        "docs": n_docs_input,
        "num_terms": num_terms,
    }

    # --- broadcast one-iteration (protocol-matched to scale_probe) ---
    corpus_doc = parse.corpus_to_doc_form(tall_raw)
    t0 = time.perf_counter()
    lda.train(
        spark, corpus_doc, num_terms=num_terms, num_topics=8,
        max_iterations=1, max_gamma_iter=25, converge=0.0, seed=1,
    )
    out["broadcast_iter_sec"] = round(time.perf_counter() - t0, 3)

    # --- join one-iteration, phase-instrumented, forced shuffle join ---
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    K = 8
    par = spark.sparkContext.defaultParallelism
    t0 = time.perf_counter()
    tall = tall_raw.repartition(par, "term_id").localCheckpoint()
    num_docs = tall.select("doc_id").distinct().count()
    out["prep_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    beta_df = lda_join.beta_init_dataframe(
        spark, num_terms, K, seed=1
    ).repartition(par, "term_id").localCheckpoint()
    out["beta_init_sec"] = round(time.perf_counter() - t0, 3)

    alpha = np.full(K, 1.0 / K)
    joined = tall.join(beta_df, "term_id")
    docs_g = joined.groupBy("doc_id").agg(
        F.collect_list("term_id").alias("term_ids"),
        F.collect_list("term_count").alias("term_counts"),
        F.collect_list("beta").alias("betas"),
    )
    t0 = time.perf_counter()
    docs_g.count()
    out["join_regroup_sec"] = round(time.perf_counter() - t0, 3)

    kernel = lda_join._join_estep_kernel(alpha, 25)
    est = docs_g.mapInPandas(
        kernel, schema=lda_join._JOIN_ESTEP_SCHEMA
    ).persist()
    t0 = time.perf_counter()
    est.count()
    out["estep_out_sec"] = round(time.perf_counter() - t0, 3)

    from mr_lda_spark.functions.logmath import logsumexp_agg
    from mr_lda_spark.plans.lda import DEFAULT_LOG_ETA

    phi = est.filter(F.col("kind") == "phi").select(
        F.col("id").cast("int").alias("term_id"),
        F.posexplode("vec").alias("topic", "log_phi"),
    )
    lam = logsumexp_agg(phi, ["term_id", "topic"], "log_phi", "lse").select(
        "term_id",
        "topic",
        F.greatest(F.col("lse"), F.lit(DEFAULT_LOG_ETA)).alias("hi"),
        F.least(F.col("lse"), F.lit(DEFAULT_LOG_ETA)).alias("lo"),
    ).select(
        "term_id",
        "topic",
        (F.col("hi") + F.log1p(F.exp(F.col("lo") - F.col("hi"))))
        .alias("log_lambda"),
    ).persist()
    t0 = time.perf_counter()
    lam.count()
    out["mstep_lse_sec"] = round(time.perf_counter() - t0, 3)

    import pandas as pd

    from mr_lda_spark.functions.special import digamma

    digamma_udf = F.pandas_udf(
        lambda s: pd.Series(digamma(s.to_numpy())), "double"
    )
    norms = logsumexp_agg(lam, ["topic"], "log_lambda", "log_norm")
    beta_next = (
        lam.join(F.broadcast(norms), "topic")
        .select(
            "term_id", "topic",
            (digamma_udf(F.exp("log_lambda"))
             - digamma_udf(F.exp("log_norm"))).alias("elog"),
        )
        .groupBy("term_id")
        .agg(F.array_sort(F.collect_list(F.struct("topic", "elog"))).alias("p"))
        .select("term_id", F.col("p.elog").alias("beta"))
    )
    t0 = time.perf_counter()
    beta_next.repartition(par, "term_id").localCheckpoint()
    out["beta_next_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    est.filter(F.col("kind") == "alpha").select(
        F.posexplode("vec").alias("k", "v")
    ).groupBy("k").agg(F.sum("v").alias("s")).collect()
    est.filter(F.col("kind") == "doc").agg(F.sum("ll")).collect()
    est.filter(F.col("kind") == "doc").select(
        F.col("id").alias("doc_id"), F.col("vec").alias("gamma")
    ).localCheckpoint()
    out["driver_pulls_sec"] = round(time.perf_counter() - t0, 3)

    join_total = sum(
        out[k]
        for k in ("beta_init_sec", "estep_out_sec", "mstep_lse_sec",
                  "beta_next_sec", "driver_pulls_sec")
    )
    out["join_iter_sec"] = round(join_total, 3)
    out["join_vs_broadcast"] = round(
        join_total / out["broadcast_iter_sec"], 3
    )
    # num_docs pulled late so prep cost stays visible but unused
    out["num_docs"] = num_docs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
