#!/usr/bin/env python3
"""Measured price of ``corpus_checkpoint="reliable"`` — the tier this
round turned from DEPLOY.md prose into trainer behavior.

DEPLOY.md's rule ("stable executors → local; churn-prone → reliable")
states a tradeoff whose cost side was asserted, not measured.  This
probe pins it: per-iteration wall of the mono and join-mode LDA
trainers under both tiers at ×1/×10 corpus scale, from each run's own
``state.iter_seconds`` instrument, plus the checkpoint store's
footprint after each reliable run (rdd-* directory count and bytes —
the ReliableCheckpointSweeper's live-generation bound, observed at
scale rather than only in the unit test).

Honest caveats, recorded in the JSON: the checkpoint dir here is the
local filesystem of a single node (page-cache-warm), so the measured
reliable overhead is a LOWER bound on what HDFS/object-store I/O
costs on a real cluster; and local[32] has no executor churn, so the
benefit side (surviving preemption) is structurally unverifiable in
this sandbox — the probe prices the insurance, it cannot demonstrate
the payout.

Usage: python tools/probe_r14_reliable.py [out_json]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

K = 4
ITERS = 3
GAMMA_ITER = 15
# override with e.g. PROBE_FACTORS=1,10,100 — x100 is the decade where
# the reliable write becomes corpus-scale I/O
FACTORS = tuple(
    int(f) for f in os.environ.get("PROBE_FACTORS", "1,10").split(",")
)


def _dir_stats(root: str) -> dict:
    n_dirs, n_bytes = 0, 0
    for dirpath, dirnames, filenames in os.walk(root):
        n_dirs += sum(1 for d in dirnames if d.startswith("rdd-"))
        for f in filenames:
            try:
                n_bytes += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return {"rdd_dirs": n_dirs, "bytes": n_bytes}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r14_reliable.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import parse
    from mr_lda_spark.plans import lda, lda_join
    from mr_lda_spark.session import get_spark

    spark = get_spark("probe-r14-reliable")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    tokens = parse.tokenize(docs)
    dictionary = parse.build_dictionary(parse.term_stats(tokens), n_docs)
    num_terms = dictionary.count()
    tall_1x = parse.encode_corpus(tokens, dictionary).localCheckpoint()

    def clone_tall(tall, factor):
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        return tall.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
            .alias("doc_id"),
            "term_id",
            "term_count",
        )

    out: dict = {
        "metric": "scale_probe_r14_reliable_tier",
        "sf_dir": sf_dir,
        "protocol": (
            "one process; encoded tall corpus localCheckpointed before "
            "timing; clones = doc-cloned (ids offset), same dictionary; "
            f"K={K}, {ITERS} fixed EM iterations, {GAMMA_ITER} gamma "
            "sweeps, converge=0; per-iteration walls from each run's "
            "state.iter_seconds; steady = median of iterations 2+; "
            "checkpoint dir stats walked after training, before "
            "teardown (the sweeper's live-generation bound)"
        ),
        "caveats": (
            "checkpoint dir is single-node local filesystem -> the "
            "reliable overhead measured here is a LOWER bound on "
            "HDFS/object-store cost; local[32] has no executor churn, "
            "so only the tier's price is measurable, not its payout"
        ),
        "corpus": {
            "num_terms": int(num_terms),
            "tall_rows_x1": int(tall_1x.count()),
        },
        "runs": {},
    }

    kw = dict(
        num_terms=num_terms, num_topics=K, max_iterations=ITERS,
        max_gamma_iter=GAMMA_ITER, converge=0.0, seed=11,
    )

    for factor in FACTORS:
        tall = (
            tall_1x
            if factor == 1
            else clone_tall(tall_1x, factor).localCheckpoint()
        )
        corpus_doc = parse.corpus_to_doc_form(tall).localCheckpoint()

        for mode_name, run in (
            ("mono", lambda tier: lda.train(
                spark, corpus_doc, corpus_checkpoint=tier, **kw)),
            ("join", lambda tier: lda_join.train_beta_join(
                spark, tall, corpus_checkpoint=tier, **kw)),
        ):
            for tier in ("local", "reliable"):
                ckpt_root = tempfile.mkdtemp(prefix="probe_reliable_")
                spark.sparkContext.setCheckpointDir(ckpt_root)
                t0 = time.perf_counter()
                _, state = run(tier)
                wall = round(time.perf_counter() - t0, 2)
                iters = list(state.iter_seconds)
                key = f"{mode_name}_x{factor}_{tier}"
                out["runs"][key] = {
                    "wall_s": wall,
                    "iter_seconds": iters,
                    "sec_per_iter_steady": round(
                        statistics.median(iters[1:]), 3
                    ) if len(iters) > 1 else iters[0],
                    "ckpt": _dir_stats(ckpt_root),
                }
                print(key, out["runs"][key], flush=True)

    for factor in FACTORS:
        for mode_name in ("mono", "join"):
            loc = out["runs"][f"{mode_name}_x{factor}_local"]
            rel = out["runs"][f"{mode_name}_x{factor}_reliable"]
            out["runs"][f"{mode_name}_x{factor}_reliable"][
                "steady_ratio_vs_local"
            ] = round(
                rel["sec_per_iter_steady"]
                / max(loc["sec_per_iter_steady"], 1e-9), 3,
            )

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
