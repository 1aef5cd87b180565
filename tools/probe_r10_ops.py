#!/usr/bin/env python3
"""Scale probes for the r10 operator rows, paired 1x-vs-Nx in one
process (growth-at-birth rule):

- funnel_dropoff (over the 6h windowed feasibility closure), users
  x100: events cloned with offset user ids — same per-user density,
  100x the users.  The closure's range joins are user-keyed, so
  growth must stay ~linear (the r9 funnel probe read 4.7x at 100x;
  the dropoff adds one global aggregate + a k-row explode).
- events_distinct_users_hll SKETCH PATH (hll_distinct alone — the
  production claim; the registered row carries an exact audit that
  deliberately pays the full distinct shuffle), users x100: register
  relation stays groups x 256 rows regardless, growth should be
  scan-bound.
- documents_stream_ams sketch path (stream drain -> estimator, no
  exact audit), corpus x10 via a cloned parquet directory under /tmp:
  state is depth x width signed cells regardless of stream length, so
  growth must track the scan, not the key space.

Forcing: dropoff/HLL end in aggregates count() cannot skip; the
stream drain is eager.

Usage: python tools/probe_r10_ops.py [out_json]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r10_ops.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import hll, textops
    from mr_lda_spark.operators.funnel import (
        funnel_dropoff,
        funnel_steps_windowed,
    )
    from mr_lda_spark.session import get_spark, read_table

    spark = get_spark("probe-r10-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_probe_r10_ops", "sf_dir": sf_dir,
                 "ops": {}}

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        return r, round(time.perf_counter() - t0, 3)

    events = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).localCheckpoint()

    def clone_users(df, factor):
        reps = spark.range(factor).select(
            F.col("id").alias("__rep")
        )
        return df.crossJoin(F.broadcast(reps)).select(
            (F.col("user_id") + F.col("__rep") * F.lit(10_000_000)).alias(
                "user_id"
            ),
            "event_type",
            "ts",
        )

    # ---- funnel_dropoff, users x100 -------------------------------
    steps = ["view", "click", "purchase"]
    gap = 6 * 3600 * 1_000_000

    def run_dropoff(ev):
        return funnel_dropoff(
            funnel_steps_windowed(ev, steps, max_gap_us=gap), steps
        ).collect()

    r1, s1 = timed(lambda: run_dropoff(events))
    rn, sn = timed(lambda: run_dropoff(clone_users(events, 100)))
    out["ops"]["funnel_dropoff"] = {
        "factor": 100, "sec_1x": s1, "sec_Nx": sn,
        "growth": round(sn / s1, 2),
        "reached_1x": [int(r["reached"]) for r in sorted(r1, key=lambda x: x["step"])],
        "reached_Nx": [int(r["reached"]) for r in sorted(rn, key=lambda x: x["step"])],
    }
    print("funnel_dropoff:", out["ops"]["funnel_dropoff"], flush=True)

    # ---- hll_distinct sketch path, users x100 ---------------------
    def run_hll(ev):
        return hll.hll_distinct(
            ev.select(
                "event_type",
                F.col("user_id").cast("string").alias("k"),
            ),
            "k",
            ["event_type"],
            p=8,
        ).collect()

    r1, s1 = timed(lambda: run_hll(events))
    rn, sn = timed(lambda: run_hll(clone_users(events, 100)))
    out["ops"]["events_hll_sketch_path"] = {
        "factor": 100, "sec_1x": s1, "sec_Nx": sn,
        "growth": round(sn / s1, 2),
        "est_1x": sorted(int(r["est_distinct"]) for r in r1),
        "est_Nx": sorted(int(r["est_distinct"]) for r in rn),
    }
    print("events_hll:", out["ops"]["events_hll_sketch_path"], flush=True)

    # ---- streaming AMS sketch path, corpus x10 --------------------
    from mr_lda_spark.operators.sketch import ams_cells
    from mr_lda_spark.streaming.dedup_stream import read_documents_stream
    from mr_lda_spark.streaming.hll_stream import ams_cells_from_stream

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # read_documents_stream glob-matches files literally named
    # documents.parquet in sf_dir, so the clone must land as ONE file
    # with that exact name (same shape as the testdata layout).
    tmp = f"/tmp/probe_r10_ams_{uuid.uuid4().hex[:8]}"
    stage = os.path.join(tmp, "_stage")
    reps = spark.range(10).select(F.col("id").alias("__rep"))
    docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)).alias(
            "doc_id"
        ),
        "text", "lang", "source",
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.rename(os.path.join(stage, part), os.path.join(tmp, "documents.parquet"))
    shutil.rmtree(stage, ignore_errors=True)

    def run_stream_ams(src_dir, tag):
        cells = ams_cells_from_stream(
            spark,
            textops.shingles(
                read_documents_stream(spark, src_dir), "text", 3
            ).select("shingle"),
            "shingle",
            f"probe_ams_{tag}_{uuid.uuid4().hex[:6]}",
            width=65536,
            depth=5,
            timeout_sec=400,
        )
        per = cells.groupBy("d").agg(
            F.sum(F.col("val") * F.col("val")).alias("m")
        )
        return sorted(int(r["m"]) for r in per.collect())

    r1, s1 = timed(lambda: run_stream_ams(sf_dir, "1x"))
    rn, sn = timed(lambda: run_stream_ams(tmp, "10x"))
    shutil.rmtree(tmp, ignore_errors=True)
    assert r1 and rn, "a probe leg read zero rows — glob/layout mismatch"
    out["ops"]["documents_stream_ams_sketch_path"] = {
        "factor": 10, "sec_1x": s1, "sec_Nx": sn,
        "growth": round(sn / s1, 2),
        # x10 clones every doc verbatim: every per-row sum of signed
        # cell values scales by 10, so each F2 row term scales by 100
        # exactly — a built-in correctness check on the probe itself.
        "per_row_f2_1x": r1,
        "per_row_f2_Nx": rn,
        "f2_ratio_check": [round(b / a, 4) for a, b in zip(r1, rn)],
    }
    print("stream_ams:", out["ops"]["documents_stream_ams_sketch_path"],
          flush=True)

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
