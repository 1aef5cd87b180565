#!/usr/bin/env python3
"""×1/×10/×100 growth probe for the POLYLINGUAL LDA train kernel —
VERDICT r13 "Next round" #5: SCALING_r12_polylda stopped at ×10
(broadcast 1.07×, join 1.38× sec/iter) while the mono curve has ×100
coverage; this run pins the join-mode slope AT the scale where the
mode actually matters (the packed-key join path exists precisely for
corpora too large for per-iteration β broadcast).

Protocol is tools/probe_r12_polylda.py verbatim, extended one decade:

- the encoded polylingual tall corpus is localCheckpointed BEFORE
  timing, so the probe times the EM loop, not tokenization;
- clones offset doc_ids (10M·rep) and keep the per-language
  dictionaries — docs grow, vocabularies saturate (the 100 TB shape);
- same K / iterations / sweep counts in all runs; converge=0 so no
  early exit hides an iteration;
- per-iteration walls come from each mode's own state.iter_seconds
  instrument, so lineage boundedness (iter_tail_ratio) is read
  directly at every factor.

Usage: python tools/probe_r14_polylda.py [out_json]
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

K = 4
ITERS = 3
GAMMA_ITER = 15
LANGS = ("en", "es", "fr", "de")
POLY_MOD = 1000
FACTORS = (1, 10, 100)
SWITCH_BYTES = 1 << 30


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r14_polylda.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import parse
    from mr_lda_spark.plans import polylda, polylda_join
    from mr_lda_spark.session import get_spark

    spark = get_spark("probe-r14-polylda")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("lang").isin(list(LANGS)))
        .withColumn("poly_doc_id", F.col("doc_id") % POLY_MOD)
    )
    tokens = parse.tokenize(docs, doc_id_col="poly_doc_id").join(
        docs.select(
            F.col("poly_doc_id").alias("doc_id"), "lang"
        ).distinct(),
        "doc_id",
    )
    lang_expr = F.lit(None).cast("int")
    for i, lang in enumerate(LANGS):
        lang_expr = F.when(
            F.col("lang") == lang, F.lit(i)
        ).otherwise(lang_expr)
    tokens = tokens.withColumn("lang", lang_expr)
    dicts = parse.build_dictionary_per_lang(tokens)
    tall_1x = (
        tokens.groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("term_count"))
        .join(
            F.broadcast(dicts.select("lang", "term", "term_id")),
            ["lang", "term"],
        )
        .select(
            "doc_id", "lang", "term_id",
            F.col("term_count").cast("int").alias("term_count"),
        )
        .localCheckpoint()
    )
    num_terms = [
        dicts.filter(F.col("lang") == i).count()
        for i in range(len(LANGS))
    ]
    n_poly_docs = tall_1x.select("doc_id").distinct().count()

    def clone_tall(tall, factor):
        reps = spark.range(factor).select(F.col("id").alias("__rep"))
        return tall.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
            .alias("doc_id"),
            "lang",
            "term_id",
            "term_count",
        )

    out: dict = {
        "metric": "scale_probe_r14_polylda",
        "sf_dir": sf_dir,
        "protocol": (
            "tools/probe_r12_polylda.py protocol extended to x100: "
            "one process; encoded polylingual tall corpus "
            "localCheckpointed before timing; clones = doc-cloned "
            "(ids offset), same per-language dictionaries; "
            f"langs={list(LANGS)}, poly docs = doc_id % {POLY_MOD}, "
            f"K={K}, {ITERS} fixed EM iterations, {GAMMA_ITER} gamma "
            "sweeps, converge=0; per-iteration walls from each "
            "mode's state.iter_seconds instrument"
        ),
        "corpus": {
            "n_poly_docs": int(n_poly_docs),
            "V_per_lang": [int(v) for v in num_terms],
            "tall_rows_x1": int(tall_1x.count()),
        },
        "modes": {},
    }

    for factor in FACTORS:
        tall = (
            tall_1x
            if factor == 1
            else clone_tall(tall_1x, factor).localCheckpoint()
        )
        corpus_doc = polylda.poly_corpus_from_tall(
            tall, len(LANGS)
        ).localCheckpoint()

        t0 = time.perf_counter()
        _, state = polylda.train_poly(
            spark,
            corpus_doc,
            num_terms_per_lang=num_terms,
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
            "iter_tail_ratio": round(
                state.iter_seconds[-1] / state.iter_seconds[0], 3
            ),
        }

        t0 = time.perf_counter()
        _, jstate = polylda_join.train_poly_join(
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
            "iter_seconds": list(jstate.iter_seconds),
            "sec_per_iter_median": round(
                statistics.median(jstate.iter_seconds), 3
            ),
            "iter_tail_ratio": round(
                jstate.iter_seconds[-1] / jstate.iter_seconds[0], 3
            )
            if jstate.iter_seconds
            else None,
        }
        print(
            f"x{factor}: broadcast {bt:.1f}s "
            f"(iters {state.iter_seconds}), join {jt:.1f}s "
            f"(iters {jstate.iter_seconds})",
            flush=True,
        )
        # release the per-factor checkpoints' references promptly
        if factor != 1:
            del tall
        del corpus_doc

    b = out["modes"]["broadcast"]
    j = out["modes"]["join"]
    out["growth"] = {
        f"x{hi}_over_x{lo}": {
            "broadcast_sec_per_iter": round(
                b[f"x{hi}"]["sec_per_iter_median"]
                / b[f"x{lo}"]["sec_per_iter_median"],
                2,
            ),
            "join_sec_per_iter": round(
                j[f"x{hi}"]["sec_per_iter_median"]
                / j[f"x{lo}"]["sec_per_iter_median"],
                2,
            ),
        }
        for lo, hi in ((1, 10), (10, 100), (1, 100))
    }

    beta_bytes = sum(8 * (v + 1) * K for v in num_terms)
    out["mode_switch"] = {
        "beta_bytes_at_probe": int(beta_bytes),
        "rule": (
            "broadcast ships sum_l 8*(V_l+1)*K bytes of per-language "
            "E[log beta] to every executor every iteration; switch "
            "to train_poly_join when the TOTAL exceeds ~1 GiB per "
            "refresh (the mono rule summed over languages — the "
            "packed (lang<<32)|term_id key makes the join path one "
            "corpus-partitioned equi-join regardless of L)"
        ),
        "switch_bytes": SWITCH_BYTES,
        "sum_V_switch_at_K4": int(SWITCH_BYTES // (8 * K)),
        "K_switch_at_probe_V": int(
            SWITCH_BYTES // (8 * (sum(num_terms) + len(num_terms)))
        ),
    }

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    raise SystemExit(main())
