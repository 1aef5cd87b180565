#!/usr/bin/env python3
"""Scale probes for the r11-continuation rows, paired 1x-vs-10x in one
process (growth-at-birth rule).  The corpus clone replicates every doc
with offset ids and UNCHANGED text/source, which buys bit-exact
self-checks alongside the wall ratios:

- char_entropy_stateless (pure projection): clone docs carry the same
  text, so their per-doc entropies must be IDENTICAL; growth must
  track the scan (no shuffle exists to misbehave).
- text_char_entropy_by_source aggregate: integer sums must scale by
  EXACTLY the clone factor; min/max entropies must be bit-equal.
- source_divergence: per-source unigram distributions are unchanged by
  cloning, so the full (js_q, n_shared_terms) table must be bit-equal.
- lexical_diversity: vocab bit-equal, n_tokens exactly 10x.
- KMV sketch + pair set ops: clones add no new distinct shingles, so
  the sketch AND the pair estimates must be bit-equal; only the scan
  grows.
- weighted_sample (tickets): new ids compete, so no value invariant —
  growth + k-row output only.

Usage: python tools/probe_r11b_ops.py [out_json]
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

FACTOR = 10


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r11b_ops.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import kmv, textops
    from mr_lda_spark.operators.curation import weighted_sample
    from mr_lda_spark.session import get_spark, read_table

    spark = get_spark("probe-r11b-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "metric": "scale_probe_r11b_ops",
        "sf_dir": sf_dir,
        "factor": FACTOR,
        "ops": {},
    }

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        return r, round(time.perf_counter() - t0, 3)

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    ).localCheckpoint()
    reps = spark.range(FACTOR).select(F.col("id").alias("__rep"))
    docs_n = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)).alias(
            "doc_id"
        ),
        "text", "lang", "source", "n_chars",
    ).localCheckpoint()

    # ---- stateless entropy projection -----------------------------
    def run_stateless(d):
        return (
            textops.char_entropy_stateless(d)
            .groupBy()
            .agg(
                F.sum("clogc_q").alias("s"),
                F.min("entropy_bits").alias("mn"),
                F.max("entropy_bits").alias("mx"),
            )
            .collect()[0]
        )

    r1, s1 = timed(lambda: run_stateless(docs))
    rn, sn = timed(lambda: run_stateless(docs_n))
    out["ops"]["char_entropy_stateless"] = {
        "sec_1x": s1, "sec_Nx": sn, "growth": round(sn / s1, 2),
        "sum_ratio_exact": rn["s"] == FACTOR * r1["s"],
        "minmax_bit_equal": (r1["mn"], r1["mx"]) == (rn["mn"], rn["mx"]),
    }
    print("char_entropy_stateless:",
          out["ops"]["char_entropy_stateless"], flush=True)

    # ---- by-source aggregate (groupBy variant) --------------------
    def run_by_source(d):
        ent = textops.char_entropy(d, keep_cols=("source",))
        return sorted(
            tuple(r)
            for r in ent.filter(F.col("n_chars") > 0)
            .groupBy("source")
            .agg(
                F.sum("clogc_q").alias("s"),
                F.min("entropy_bits").alias("mn"),
                F.max("entropy_bits").alias("mx"),
            )
            .collect()
        )

    r1, s1 = timed(lambda: run_by_source(docs))
    rn, sn = timed(lambda: run_by_source(docs_n))
    out["ops"]["char_entropy_by_source"] = {
        "sec_1x": s1, "sec_Nx": sn, "growth": round(sn / s1, 2),
        "sums_scale_exact": all(
            a[0] == b[0] and b[1] == FACTOR * a[1]
            and a[2:] == b[2:]
            for a, b in zip(r1, rn)
        ),
    }
    print("char_entropy_by_source:",
          out["ops"]["char_entropy_by_source"], flush=True)

    # ---- source JS divergence -------------------------------------
    def run_js(d):
        return sorted(
            (r["source_a"], r["source_b"], r["n_shared_terms"],
             r["js_q"], r["js_bits"])
            for r in textops.source_divergence(d).collect()
        )

    r1, s1 = timed(lambda: run_js(docs))
    rn, sn = timed(lambda: run_js(docs_n))
    out["ops"]["source_js_divergence"] = {
        "sec_1x": s1, "sec_Nx": sn, "growth": round(sn / s1, 2),
        "table_bit_equal": r1 == rn,
    }
    print("source_js_divergence:",
          out["ops"]["source_js_divergence"], flush=True)

    # ---- lexical diversity ----------------------------------------
    def run_div(d):
        return sorted(
            (r["source"], r["n_tokens"], r["vocab"])
            for r in textops.lexical_diversity(d).collect()
        )

    r1, s1 = timed(lambda: run_div(docs))
    rn, sn = timed(lambda: run_div(docs_n))
    out["ops"]["lexical_diversity"] = {
        "sec_1x": s1, "sec_Nx": sn, "growth": round(sn / s1, 2),
        "vocab_equal_tokens_scale": all(
            a[0] == b[0] and b[1] == FACTOR * a[1] and a[2] == b[2]
            for a, b in zip(r1, rn)
        ),
    }
    print("lexical_diversity:", out["ops"]["lexical_diversity"],
          flush=True)

    # ---- KMV sketch + pair set ops --------------------------------
    def run_kmv(d):
        keys = textops.shingles(d, "text", 3).join(
            d.select("doc_id", "source"), "doc_id"
        )
        sk = kmv.kmv_sketch(keys, "shingle", ["source"], k=256)
        return sorted(
            tuple(r)
            for r in kmv.kmv_pair_set_ops(sk, "source", k=256).collect()
        )

    r1, s1 = timed(lambda: run_kmv(docs))
    rn, sn = timed(lambda: run_kmv(docs_n))
    out["ops"]["kmv_source_overlap"] = {
        "sec_1x": s1, "sec_Nx": sn, "growth": round(sn / s1, 2),
        "pair_table_bit_equal": r1 == rn,
    }
    print("kmv_source_overlap:", out["ops"]["kmv_source_overlap"],
          flush=True)

    # ---- weighted ticket sample -----------------------------------
    def run_ws(d):
        return weighted_sample(d, "n_chars", k=20).collect()

    r1, s1 = timed(lambda: run_ws(docs))
    rn, sn = timed(lambda: run_ws(docs_n))
    out["ops"]["weighted_sample_tickets"] = {
        "sec_1x": s1, "sec_Nx": sn, "growth": round(sn / s1, 2),
        "k_rows": (len(r1), len(rn)),
    }
    print("weighted_sample_tickets:",
          out["ops"]["weighted_sample_tickets"], flush=True)

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
