#!/usr/bin/env python3
"""Same-session interleaved A/B of curate()'s scoring-spine assembly
(r15 change): OLD shape (docs.select(doc_id) ⋈ language_id ⋈
quality_scores) vs NEW fused shape (quality spine + hit-count attach),
timed as scored.count() with caches cleared between reps — isolates
the assembly the change touched from the rest of curation_pipeline.

Usage: python tools/probe_r15_spine.py [reps] [sf_dir]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from mr_lda_spark.session import get_spark, read_table
    from mr_lda_spark.operators import textops

    spark = get_spark("probe-spine")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")

    def old_scored():
        lang = textops.language_id(docs).select("doc_id", "pred_lang")
        quality = textops.quality_scores(docs).select(
            "doc_id", "quality_score"
        )
        return (
            docs.select("doc_id").join(lang, "doc_id").join(quality, "doc_id")
        )

    def new_scored():
        spine = textops.quality_scores(docs).select(
            "doc_id", "quality_score"
        )
        return textops._attach_pred_lang(
            spine, textops._language_hits_agg(docs)
        ).select("doc_id", "pred_lang", "quality_score")

    # Warm both shapes once.
    old_scored().count()
    new_scored().count()

    out = {"old": [], "new": []}
    for _ in range(reps):
        for tag, build in (("old", old_scored), ("new", new_scored)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = build().count()
            out[tag].append(round(time.perf_counter() - t0, 3))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(json.dumps({
        "rows": n, "reps": reps,
        "old": out["old"], "new": out["new"],
        "old_median": med(out["old"]), "new_median": med(out["new"]),
    }))


if __name__ == "__main__":
    main()
