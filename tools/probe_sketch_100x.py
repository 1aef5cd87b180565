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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
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

    for tier, docs, thresh in (("sec_1x", base, 5), ("sec_Nx", big, 5 * factor)):
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
