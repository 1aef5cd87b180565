#!/usr/bin/env python3
"""Hot-key probe for the trailing RANGE window family (VERDICT r8
"Next round" #6): ``rolling_range_agg`` partitions by the raw key, so
one hot user is ONE window partition that AQE cannot split; the r9
``rolling_range_sum_salted`` decomposition re-partitions every heavy
step by (key, time-bucket).  This probe measures where the plain
window bends and whether the salted plan holds, PAIRED in one process
at each tier.

Construction: sf0.1 purchase events (~20k rows, ~1.5k users) cloned
Nx with doc-id-shifted users, then an engineered hot key — ``skew``
fraction of all rows are remapped to user 0 with their timestamps
JITTERED uniformly over the clone index so the hot key's history
spans many window-lengths (the regime the salted plan is built for;
without jitter every clone stacks on the same 30-day span and both
plans degenerate to ties).  Both plans are forced with a noop sink
(count() prunes a window to a filtered scan — bench.py NOOP_FORCE
audit) and checksummed once for equality at the 1x tier.

Usage: python tools/probe_rolling_skew_100x.py [factor] [skew]
       (defaults: 100 0.9)
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

WINDOW_US = 86_400_000_000  # 24h, same as the registered queries


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import timeseries
    from mr_lda_spark.session import get_spark, read_table

    spark = get_spark("probe-rolling-skew")
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )

    def build(n: int):
        """n clones; `skew` of rows remapped to hot user 0, spread
        over n days of jitter so the hot history spans many windows."""
        clones = base.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
        )
        # deterministic pseudo-random in [0,1) from the row identity
        h = (F.abs(F.xxhash64("user_id", "ts", "__i")) % 1_000_000) / 1_000_000.0
        return clones.select(
            F.when(h < skew, F.lit(0))
            .otherwise(F.col("user_id") + F.col("__i") * 10_000_000)
            .alias("user_id"),
            F.timestamp_micros(
                F.unix_micros("ts") + F.col("__i") * WINDOW_US
            ).alias("ts"),
            "cents",
        ).persist()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {
        "metric": "scale_probe_rolling_skew",
        "factor": factor, "skew": skew, "window_us": WINDOW_US,
        "sf_dir": sf_dir, "sec_1x": {}, "sec_Nx": {},
    }

    for tier, n in (("sec_1x", 1), ("sec_Nx", factor)):
        docs = build(n)
        docs.count()
        t0 = time.perf_counter()
        noop(timeseries.rolling_range_agg(
            docs, "user_id", "ts", WINDOW_US,
            {"s": F.sum("cents"), "n": F.count(F.lit(1))}))
        out[tier]["plain_window"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        noop(timeseries.rolling_range_sum_salted(
            docs, "user_id", "ts", WINDOW_US,
            {"s": "cents", "n": None}))
        out[tier]["salted"] = round(time.perf_counter() - t0, 3)
        if tier == "sec_1x":
            chk = lambda df: df.agg(  # noqa: E731
                F.sum(F.col("s") * F.col("cents")).alias("c"),
                F.sum("n").alias("n")).collect()[0]
            a = chk(timeseries.rolling_range_agg(
                docs, "user_id", "ts", WINDOW_US,
                {"s": F.sum("cents"), "n": F.count(F.lit(1))}))
            b = chk(timeseries.rolling_range_sum_salted(
                docs, "user_id", "ts", WINDOW_US,
                {"s": "cents", "n": None}))
            out["checksum_equal"] = (a["c"] == b["c"] and a["n"] == b["n"])
        docs.unpersist()

    out["ratio_Nx_vs_1x"] = {
        k: round(out["sec_Nx"][k] / out["sec_1x"][k], 2)
        for k in out["sec_1x"] if out["sec_1x"][k] > 0
    }
    out["paired_salted_vs_plain_Nx"] = round(
        out["sec_Nx"]["salted"] / out["sec_Nx"]["plain_window"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
