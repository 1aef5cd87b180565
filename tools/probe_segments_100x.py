#!/usr/bin/env python3
"""Targeted 100x scale probe for the r8 segment/exact-substring dedup
tiers, added to scale_probe.py after SCALING_r08.json was recorded.

Runs ONLY the three new ops (segments_corpus, segments_intradoc,
exact_substring) at 1x and Nx using scale_probe's synth_union corpus
and noop-sink forcing, so the full (expensive) probe doesn't need a
re-run.  Results land in SCALING_r08_segments.json; PERF_NOTES_r08 §4
carries the interpretation.

Usage: python tools/probe_segments_100x.py [factor]   (default 100)
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

    from scale_probe import synth_union
    from mr_lda_spark.session import get_spark, read_table
    from mr_lda_spark.operators import dedup

    spark = get_spark("probe-segments")
    spark.sparkContext.setLogLevel("ERROR")

    base = read_table(spark, sf_dir, "documents").persist()
    n_base = base.count()
    big = synth_union(base, factor).persist()
    n_big = big.count()

    ops = {
        "segments_corpus": lambda d: dedup.segment_dedup(
            d, width=8, scope="corpus"
        ),
        "segments_intradoc": lambda d: dedup.segment_dedup(
            d, width=4, scope="doc"
        ),
        "exact_substring": lambda d: dedup.exact_substring_dedup(d, n=10),
    }

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    sec_1x, sec_nx = {}, {}
    for name, fn in ops.items():
        t0 = time.perf_counter()
        force(fn(base))
        sec_1x[name] = round(time.perf_counter() - t0, 3)
    for name, fn in ops.items():
        t0 = time.perf_counter()
        force(fn(big))
        sec_nx[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "scale_probe_segments",
        "factor": factor,
        "docs_1x": n_base,
        "docs_Nx": n_big,
        "action": "noop-sink write (count() eliminates the rebuild join)",
        "sec_1x": sec_1x,
        "sec_Nx": sec_nx,
        "ratio": {
            k: round(sec_nx[k] / sec_1x[k], 2) if sec_1x[k] > 0 else None
            for k in sec_1x
        },
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
