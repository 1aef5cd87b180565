#!/usr/bin/env python3
"""Scale probes for the r9 operator families, paired 1x-vs-Nx in one
process (the r8 lesson: a new op family without a recorded growth
curve is an open verdict finding).

- exact_quantiles: lineitem prices cloned Nx (same distribution, Nx
  rows) — round count is distribution-bound, so growth should track
  the scan, strongly sub-linear in rounds.  factor 100.
- pagerank: the customer<->supplier graph cloned Nx with shifted node
  ids (Nx nodes & edges, same topology) — join-per-iteration should
  grow ~linearly.  factor 10 (3 iterations x 20M edge rows).
- interval_overlap_pairs: sessions cloned Nx, each clone time-shifted
  to its own disjoint range — concurrency (and thus per-bucket pair
  fan-out) is constant, output grows Nx, runtime should track output.
  factor 10.
- edit_distance_pairs: originals + (N-1) token-rewritten clones
  (unique shingles -> no new bands shared): candidate set stays
  1x-sized, so growth measures the signature scan.  factor 10.

Forcing per bench.py decisions: count() everywhere (each op ends in
an agg/filter-bearing join/topk that count() cannot skip; quantiles
are eager at construction).

Usage: python tools/probe_r9_ops_100x.py
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import dedup, graph
    from mr_lda_spark.operators.intervals import interval_overlap_pairs
    from mr_lda_spark.operators.quantile import exact_quantiles
    from mr_lda_spark.session import get_spark, read_table
    from mr_lda_spark.streaming.events import sessionize

    spark = get_spark("probe-r9-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_probe_r9_ops", "sf_dir": sf_dir,
                 "ops": {}}

    def run(op, factor, fn_1x, fn_nx):
        t0 = time.perf_counter()
        r1 = fn_1x()
        s1 = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rn = fn_nx()
        sn = round(time.perf_counter() - t0, 3)
        out["ops"][op] = {
            "factor": factor, "sec_1x": s1, "sec_Nx": sn,
            "growth": round(sn / s1, 2) if s1 > 0 else None,
            "rows_1x": r1, "rows_Nx": rn,
        }
        print(op, out["ops"][op], flush=True)

    # ---- exact quantiles, factor 100 --------------------------------
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    li100 = li.withColumn(
        "__i", F.explode(F.sequence(F.lit(0), F.lit(99)))
    ).drop("__i").persist()
    li100.count()
    li1 = li.persist()
    li1.count()
    run(
        "exact_quantiles", 100,
        lambda: exact_quantiles(
            li1, "l_extendedprice", [0.25, 0.5, 0.95]).count(),
        lambda: exact_quantiles(
            li100, "l_extendedprice", [0.25, 0.5, 0.95]).count(),
    )
    li100.unpersist(); li1.unpersist()

    # ---- pagerank, factor 10 ----------------------------------------
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    e0 = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct()
    )
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    def clones(n):
        return sym.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
        ).select(
            F.concat(F.col("__i").cast("string"), F.lit("_"), "src")
            .alias("src"),
            F.concat(F.col("__i").cast("string"), F.lit("_"), "dst")
            .alias("dst"),
        )

    run(
        "pagerank", 10,
        lambda: graph.pagerank(clones(1), 3).count(),
        lambda: graph.pagerank(clones(10), 3).count(),
    )

    # ---- interval overlap, factor 10 (disjoint time shifts) ---------
    sess = sessionize(read_table(spark, sf_dir, "events")).select(
        "user_id", "session_id",
        F.col("session_start_epoch").alias("s"),
        F.col("session_end_epoch").alias("e"),
    ).persist()
    span = sess.agg(
        (F.max("e") - F.min("s") + 10_000).alias("w")).collect()[0]["w"]

    def shifted(n):
        return sess.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
        ).select(
            (F.col("user_id") + F.col("__i") * 10_000_000)
            .alias("user_id"),
            "session_id",
            (F.col("s") + F.col("__i") * span).alias("s"),
            (F.col("e") + F.col("__i") * span).alias("e"),
        )

    run(
        "interval_overlap", 10,
        lambda: interval_overlap_pairs(
            shifted(1), ["user_id", "session_id"], "s", "e", 3600
        ).count(),
        lambda: interval_overlap_pairs(
            shifted(10), ["user_id", "session_id"], "s", "e", 3600
        ).count(),
    )
    sess.unpersist()

    # ---- edit distance, factor 10 (unique-text clones) --------------
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    def mixed(n):
        if n == 1:
            return docs
        uniq = docs.withColumn(
            "__i", F.explode(F.sequence(F.lit(1), F.lit(n - 1)))
        ).select(
            (F.col("doc_id") + F.col("__i") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), r"(\S+)",
                F.concat(F.lit(r"$1_"), F.col("__i").cast("string")),
            ).alias("text"),
        )
        return docs.unionByName(uniq)

    run(
        "edit_distance_pairs", 10,
        lambda: dedup.edit_distance_pairs(mixed(1)).count(),
        lambda: dedup.edit_distance_pairs(mixed(10)).count(),
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
