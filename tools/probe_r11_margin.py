#!/usr/bin/env python3
"""Paired 1x/10x growth probe for the r11-new corpus×corpus
margin-mining row (growth-at-birth rule).

similarity_margin_mining_lsh: queries FIXED (the label-0 slice),
corpus cloned ×10 with offset vec_ids.  The banding has a fixed
bucket space (2^n_planes per band × n_bands), so ×10 corpus means
×10 per-bucket occupancy → the cross-set candidate relation grows
~linearly in corpus size per query (never quadratically — the query
side is not cloned), and the scoring tail is candidate-bound.
Expected growth: ~linear or below (fixed overheads amortize).

Forcing: the row ends in the per-query margin aggregate — count()
computes bucketing, candidate join, rehydration, rank window, margin.

Usage: python tools/probe_r11_margin.py [out_json]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r11_margin.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import similarity
    from mr_lda_spark.queries_registry import (
        MARGIN_QUERY_CAP,
        MARGIN_THRESHOLD,
        SIM_K,
    )
    from mr_lda_spark.session import get_spark

    spark = get_spark("probe-r11-margin")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).localCheckpoint()
    queries = emb.filter(
        (F.col("label") == 0) & (F.col("vec_id") < MARGIN_QUERY_CAP)
    ).localCheckpoint()
    corpus_1x = emb.filter(F.col("label") == 1).localCheckpoint()

    def clone(corpus, factor):
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        return corpus.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") + F.col("__rep") * F.lit(100_000_000)).alias(
                "vec_id"
            ),
            "label",
            "embedding",
        )

    out: dict = {
        "metric": "scale_probe_r11_margin",
        "sf_dir": sf_dir,
        "protocol": (
            "one process; query slice fixed (label-0, vec_id < "
            f"{MARGIN_QUERY_CAP}), corpus (label-1) cloned x10 with "
            "offset vec_ids, both sides localCheckpointed before "
            "timing; min of 2 timed runs per scale; forced with "
            "count() (the row ends in the per-query margin aggregate)"
        ),
        "ops": {},
    }

    res = {}
    # the sf0.1 label-1 slice is only ~180 vectors, so ×10 is still
    # overhead-dominated — probe to ×100 (18k vectors, ~1.1k per
    # band-bucket) where the candidate join actually carries weight.
    for factor in (1, 10, 100):
        corpus = (
            corpus_1x
            if factor == 1
            else clone(corpus_1x, factor).localCheckpoint()
        )
        n = corpus.count()
        best = None
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = similarity.margin_mining_lsh(
                queries, corpus, k=SIM_K, threshold=MARGIN_THRESHOLD
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        res[f"x{factor}"] = {
            "corpus_rows": n,
            "sec_min_of_2": round(best, 3),
            "result_rows": rows,
        }
        print(f"x{factor}: corpus {n}, {best:.2f}s, {rows} rows", flush=True)
    res["growth_x10"] = round(
        res["x10"]["sec_min_of_2"] / res["x1"]["sec_min_of_2"], 2
    )
    res["growth_x100"] = round(
        res["x100"]["sec_min_of_2"] / res["x1"]["sec_min_of_2"], 2
    )
    out["ops"]["similarity_margin_mining_lsh"] = res

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    raise SystemExit(main())
