#!/usr/bin/env python3
"""Paired 1x/10x growth probe for the FLAGSHIP LDA train kernel
(VERDICT r10 "Next round" #3): the per-iteration E+M wall time for
BOTH execution geometries — broadcast-β (plans/lda.train) and
distributed-β shuffle-join (plans/lda_join.train_beta_join) — on the
sf0.1 corpus and a ×10 doc-cloned twin, in one process.

Protocol (the SCALING_r10_ops rules):
- the encoded tall corpus is localCheckpointed BEFORE timing, so the
  probe times the EM loop, not tokenization;
- the ×10 clone offsets doc_ids (10M·rep) and keeps the dictionary —
  docs grow, vocabulary saturates, which is the 100 TB shape (V grows
  ~log-ish, D grows linearly);
- same K/iterations/sweep counts in all four runs; converge=0 so no
  early exit hides an iteration.

Also recorded:
- γ-carry lineage boundedness: broadcast mode's own per-iteration
  instrumentation (state.iter_seconds) must stay flat across
  iterations at BOTH scales — a growing tail means the carried γ
  lineage (or the β refresh) compounds, the one way an EM loop rots
  at iteration 50 even when iteration 1 scales;
- the β mode-switch threshold: broadcast ships the dense (V+1)×K
  float64 E[log β] to every executor every iteration (the reference's
  acknowledged wall — its DocumentMapper loads the full β per task),
  so the switch rule is sized from measured V, not guessed.

Usage: python tools/probe_r11_lda.py [out_json]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

K = 8
ITERS = 3
GAMMA_ITER = 25
# Broadcast refresh is 8·(V+1)·K bytes to EVERY executor, EVERY
# iteration.  1 GiB per refresh is the documented comfort ceiling
# (past it, re-broadcast time rivals the E-step and executor memory
# headroom shrinks) — the join path removes the wall entirely.
SWITCH_BYTES = 1 << 30


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r11_lda.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import parse
    from mr_lda_spark.plans import lda, lda_join
    from mr_lda_spark.session import get_spark

    spark = get_spark("probe-r11-lda")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    tokens = parse.tokenize(docs)
    dictionary = parse.build_dictionary(parse.term_stats(tokens), n_docs)
    num_terms = dictionary.count()
    tall_1x = parse.encode_corpus(tokens, dictionary).localCheckpoint()

    def clone_docs(tall, factor):
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        return tall.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            "term_id",
            "term_count",
        )

    out: dict = {
        "metric": "scale_probe_r11_lda",
        "sf_dir": sf_dir,
        "protocol": (
            "one process; encoded tall corpus localCheckpointed before "
            "timing; x10 = doc-cloned (ids offset), same dictionary; "
            f"K={K}, {ITERS} fixed EM iterations, {GAMMA_ITER} gamma "
            "sweeps, converge=0; broadcast iteration times from "
            "state.iter_seconds, join mode timed per full train / "
            "iterations"
        ),
        "corpus": {"n_docs": n_docs, "V": int(num_terms)},
        "modes": {},
    }

    for factor in (1, 10):
        tall = (
            tall_1x
            if factor == 1
            else clone_docs(tall_1x, factor).localCheckpoint()
        )
        corpus_doc = parse.corpus_to_doc_form(tall).localCheckpoint()

        # --- broadcast-β mode ---
        t0 = time.perf_counter()
        _, state = lda.train(
            spark,
            corpus_doc,
            num_terms=num_terms,
            num_topics=K,
            max_iterations=ITERS,
            max_gamma_iter=GAMMA_ITER,
            converge=0.0,
            seed=1,
        )
        bt = time.perf_counter() - t0
        out["modes"].setdefault("broadcast", {})[f"x{factor}"] = {
            "total_sec": round(bt, 3),
            "iter_seconds": list(state.iter_seconds),
            "sec_per_iter_median": round(
                statistics.median(state.iter_seconds), 3
            ),
            # lineage-boundedness witness: last iteration vs first
            "iter_tail_ratio": round(
                state.iter_seconds[-1] / state.iter_seconds[0], 3
            ),
        }

        # --- distributed-β join mode ---
        t0 = time.perf_counter()
        _, jstate = lda_join.train_beta_join(
            spark,
            tall,
            num_terms,
            K,
            max_iterations=ITERS,
            max_gamma_iter=GAMMA_ITER,
            converge=0.0,
            seed=1,
        )
        jt = time.perf_counter() - t0
        out["modes"].setdefault("join", {})[f"x{factor}"] = {
            "total_sec": round(jt, 3),
            "sec_per_iter": round(jt / ITERS, 3),
            "iter_seconds": list(jstate.iter_seconds),
            "iter_tail_ratio": round(
                jstate.iter_seconds[-1] / jstate.iter_seconds[0], 3
            )
            if jstate.iter_seconds
            else None,
        }
        print(
            f"x{factor}: broadcast {bt:.1f}s "
            f"(iters {state.iter_seconds}), join {jt:.1f}s",
            flush=True,
        )

    b = out["modes"]["broadcast"]
    j = out["modes"]["join"]
    out["growth_x10"] = {
        "broadcast_sec_per_iter": round(
            b["x10"]["sec_per_iter_median"] / b["x1"]["sec_per_iter_median"],
            2,
        ),
        "join_sec_per_iter": round(
            j["x10"]["sec_per_iter"] / j["x1"]["sec_per_iter"], 2
        ),
    }

    beta_bytes = 8 * (num_terms + 1) * K
    out["mode_switch"] = {
        "beta_bytes_at_probe": int(beta_bytes),
        "rule": (
            "broadcast ships the dense 8*(V+1)*K-byte E[log beta] to "
            "every executor every iteration; switch to "
            "train_beta_join when that exceeds ~1 GiB per refresh"
        ),
        "switch_bytes": SWITCH_BYTES,
        "V_switch_at_K8": int(SWITCH_BYTES // (8 * K)),
        "K_switch_at_probe_V": int(SWITCH_BYTES // (8 * (num_terms + 1))),
    }

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    raise SystemExit(main())
