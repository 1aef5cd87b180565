#!/usr/bin/env python3
"""Targeted 100x probe for the r8 sketch-prefilter ops, PAIRED in one
process against their plain siblings at each tier:

- decontaminate vs decontaminate_bloom (eval split doc_id % 43 == 0)
- exact heavy hitters (groupBy+HAVING) vs heavy_hitters_cms

The heavy-hitter threshold scales with the tier (5 at 1x -> 5*factor
at Nx): cloning multiplies every count by ~factor, so a fixed
threshold would flip the whole key space into hitters at Nx and the
comparison would measure output blowup, not the operators.

Forcing: noop-sink writes for the decontamination pair (both end in a
docs ⟕ unique-keyed overlap join that count() eliminates); count()
for the heavy-hitter pair (aggregate top — count() computes it).

Usage: python tools/probe_sketch_100x.py [factor]   (default 100)
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
    args = [a for a in sys.argv[1:] if a != "--keyspace-only"]
    keyspace_only = "--keyspace-only" in sys.argv[1:]
    factor = int(args[0]) if args else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from scale_probe import synth_union
    from mr_lda_spark.session import get_spark, read_table
    from mr_lda_spark.operators import sketch, textops

    spark = get_spark("probe-sketch")
    spark.sparkContext.setLogLevel("ERROR")

    base = read_table(spark, sf_dir, "documents").persist()
    base.count()
    big = synth_union(base, factor).persist()
    big.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {
        "metric": "scale_probe_sketch",
        "factor": factor,
        "sec_1x": {},
        "sec_Nx": {},
        "sf_dir": sf_dir,
    }

    tiers = (("sec_1x", base, 5), ("sec_Nx", big, 5 * factor))
    if keyspace_only:
        tiers = ()
    for tier, docs, thresh in tiers:
        ev = docs.filter(F.col("doc_id") % 43 == 0)
        tr = docs.filter(F.col("doc_id") % 43 != 0)
        t0 = time.perf_counter()
        noop(textops.decontaminate(tr, ev, n=5))
        out[tier]["decontaminate_plain"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        noop(textops.decontaminate_bloom(tr, ev, n=5))
        out[tier]["decontaminate_bloom"] = round(time.perf_counter() - t0, 3)

        occ = textops.shingles(docs, "text", 3).select("shingle")
        t0 = time.perf_counter()
        (
            occ.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= thresh)
            .count()
        )
        out[tier]["heavy_hitters_exact"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        sketch.heavy_hitters_cms(
            occ, "shingle", threshold=thresh, width=65536, depth=5
        ).count()
        out[tier]["heavy_hitters_cms"] = round(time.perf_counter() - t0, 3)

    out["ratio_Nx_vs_1x"] = {
        k: round(out["sec_Nx"][k] / out["sec_1x"][k], 2)
        for k in out["sec_1x"]
        if out["sec_1x"][k] > 0
    }
    if out["sec_Nx"]:
        out["paired_sketch_vs_plain_Nx"] = {
            "decontaminate": round(
                out["sec_Nx"]["decontaminate_bloom"]
                / out["sec_Nx"]["decontaminate_plain"],
                2,
            ),
            "heavy_hitters": round(
                out["sec_Nx"]["heavy_hitters_cms"]
                / out["sec_Nx"]["heavy_hitters_exact"],
                2,
            ),
        }

    # ---- key-space tier ------------------------------------------------
    # synth_union clones the same TEXT, so the tiers above multiply
    # counts but hold the distinct-key space constant (~tens of k) —
    # the regime where the exact groupBy stays trivially cheap and the
    # CMS's extra pass can only lose.  The CMS exists for the opposite
    # regime: distinct keys scaling with the corpus.  This tier rebuilds
    # the Nx corpus as hot clones ∪ token-rewritten clones (every token
    # suffixed with its clone index, so EVERY shingle of the cold half
    # is unique per clone): counts still ×factor on the hot half,
    # distinct keys ×~factor/2 overall.  Runs the exact HAVING against
    # the CMS at the r8 default width (65,536 — expected SATURATED: avg
    # cell load exceeds the threshold, the prefilter passes everything)
    # and at a width sized to the key space (load factor << threshold).
    uniq = big.withColumn(
        "text",
        F.regexp_replace(
            F.col("text"), r"(\S+)",
            F.concat(F.lit(r"$1_"), (F.col("doc_id") / 10_000_000)
                     .cast("long").cast("string")),
        ),
    )
    mixed = big.unionByName(uniq).persist()
    mixed.count()
    occ = textops.shingles(mixed, "text", 3).select("shingle")
    stats = occ.agg(
        F.count(F.lit(1)).alias("occ"),
        F.approx_count_distinct("shingle").alias("keys"),
    ).collect()[0]
    ks: dict = {
        "occurrences": int(stats["occ"]),
        "approx_distinct_keys": int(stats["keys"]),
        "threshold": 5 * factor,
        "sec": {},
    }
    t0 = time.perf_counter()
    (
        occ.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5 * factor)
        .count()
    )
    ks["sec"]["exact"] = round(time.perf_counter() - t0, 3)
    for width in (65_536, 1 << 20):
        ks[f"avg_cell_load_w{width}"] = round(ks["occurrences"] / width, 1)
        t0 = time.perf_counter()
        sketch.heavy_hitters_cms(
            occ, "shingle", threshold=5 * factor, width=width, depth=5
        ).count()
        ks["sec"][f"cms_w{width}"] = round(time.perf_counter() - t0, 3)
        # untimed: how many occurrences the prefilter lets through —
        # the saturation law made visible (load >= threshold -> the
        # min-estimate clears the bar everywhere and nothing prunes)
        passed = sketch.cms_candidates(
            occ, "shingle", threshold=5 * factor, width=width, depth=5
        ).count()
        ks[f"prefilter_pass_frac_w{width}"] = round(
            passed / ks["occurrences"], 4
        )
    ks["paired_cms_vs_exact"] = {
        k: round(v / ks["sec"]["exact"], 2)
        for k, v in ks["sec"].items() if k != "exact"
    }
    out["keyspace_Nx"] = ks

    # decontamination on the key-space-scaled corpus: unlike the clone
    # tiers (where the DISTINCT eval n-grams are constant and the
    # plain broadcast never grows), here the eval split of `mixed`
    # carries ~factor/2 × more distinct n-grams — the broadcast-cliff
    # regime the bloom gate exists for (r8).  Paired in this process.
    ev = mixed.filter(F.col("doc_id") % 43 == 0)
    tr = mixed.filter(F.col("doc_id") % 43 != 0)
    dk: dict = {"sec": {}}
    dk["distinct_eval_grams"] = int(
        textops.shingles(ev, "text", 5)
        .agg(F.approx_count_distinct("shingle")).collect()[0][0]
    )
    t0 = time.perf_counter()
    noop(textops.decontaminate(tr, ev, n=5))
    dk["sec"]["plain"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    noop(textops.decontaminate_bloom(tr, ev, n=5))
    dk["sec"]["bloom"] = round(time.perf_counter() - t0, 3)
    dk["paired_bloom_vs_plain"] = round(
        dk["sec"]["bloom"] / dk["sec"]["plain"], 2
    )
    out["keyspace_decontaminate_Nx"] = dk
    print(json.dumps(out))


if __name__ == "__main__":
    main()
