#!/usr/bin/env python3
"""Scale probes for the r9b operator families (HLL, triangles, SCD2,
z-order, attribution, sorted-neighborhood, anomalies, Markov), paired
1x-vs-Nx in one process — every new family records its growth curve AT
BIRTH (the r8 lesson, now standing rule).

Constructions (each targets the dimension that actually grows at
100 TB):

- hll_distinct, factor 100: shingle occurrences cloned with a
  per-clone token suffix -> DISTINCT keys x100 (the regime exact
  count(DISTINCT) fears).  Probes the sketch path only (registers +
  estimate), not the exact audit column.
- triangles, factor 10: the co-purchase edge relation cloned with
  shifted node ids -> 10 disjoint copies (nodes, edges, triangles
  x10); wedge fan-out per node constant.
- scd2, factor 100: orders cloned with shifted custkeys -> entities
  x100, per-entity history constant (the window stays small; growth
  tracks the shuffle).
- zorder_extents, factor 100: lineitem cloned in place -> same key
  domain, same 1024 cells, n_rows x100 (pure scan/agg growth).
- touch_attribution, factor 100: events cloned with shifted user ids
  -> window partitions x100, each the original size.
- sorted_neighborhood, factor 10: documents cloned VERBATIM with new
  ids -> every block becomes 10x hotter; candidates are capped at
  w*n by construction, so this is the skew test (an equi-join
  blocker would go quadratic here).
- anomalies, factor 100: hourly series cloned to x100 groups (same
  spine each).
- markov, factor 100: events cloned with shifted user ids.

Forcing: count() where the op ends in an aggregate/filter that
count() cannot skip (hll, triangles, markov, sorted_neighborhood);
noop-sink writes elsewhere, matching each op's bench.py decision.

Usage: python tools/probe_r9b_ops_100x.py [out_json]
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()
    return df.rdd.getNumPartitions()  # cheap; the write did the work


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r09b_ops.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import dedup, graph, hll, textops
    from mr_lda_spark.operators.funnel import (
        markov_transitions,
        touch_attribution,
    )
    from mr_lda_spark.operators.layout import zorder_cell_extents
    from mr_lda_spark.operators.scd import scd2
    from mr_lda_spark.operators.timeseries import rolling_count_anomalies
    from mr_lda_spark.session import get_spark, read_table

    spark = get_spark("probe-r9b-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_probe_r9b_ops", "sf_dir": sf_dir,
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

    docs = read_table(spark, sf_dir, "documents")
    events = read_table(spark, sf_dir, "events")
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")

    idx100 = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("__i")
    idx10 = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__i")

    # ---- HLL sketch, distinct keys x100 -----------------------------
    sh = textops.shingles(docs, n=5).select("shingle").persist()
    sh.count()
    sh100 = sh.select("shingle", idx100).select(
        F.concat_ws("#", "shingle", F.col("__i")).alias("shingle")
    ).persist()
    sh100.count()
    # noop-forced: under count() the optimizer keeps the md5 bucket
    # grouping but prunes max(rho) and every estimator column — the
    # write computes the full sketch (audited optimized plans, r9).
    run(
        "hll_distinct", 100,
        lambda: _noop(hll.hll_distinct(sh, "shingle", [], p=8)),
        lambda: _noop(hll.hll_distinct(sh100, "shingle", [], p=8)),
    )
    sh.unpersist(); sh100.unpersist()

    # ---- triangles, disjoint graph clones x10 -----------------------
    lif = li.filter(F.col("l_quantity") >= 30)
    a = lif.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = lif.select("l_orderkey", F.col("l_partkey").alias("b"))
    edges = (
        a.join(b, "l_orderkey").filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct().persist()
    )
    edges.count()
    shift = (F.col("__i").cast("long") * F.lit(1_000_000))
    edges10 = edges.select("a", "b", idx10).select(
        (F.col("a") + shift).alias("a"), (F.col("b") + shift).alias("b")
    ).persist()
    edges10.count()
    run(
        "triangles", 10,
        lambda: graph.triangle_participation(edges).count(),
        lambda: graph.triangle_participation(edges10).count(),
    )
    edges.unpersist(); edges10.unpersist()

    # ---- scd2, entities x100 ----------------------------------------
    obs = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ok"),
    ).persist()
    obs.count()
    obs100 = orders.select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey", idx100
    ).select(
        (F.col("o_custkey") + F.col("__i").cast("long") * 10_000_000)
        .alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ok"),
    ).persist()
    obs100.count()
    run(
        "scd2", 100,
        lambda: _noop(scd2(obs, "custkey", ["priority"], ["ts", "ok"], "ts")),
        lambda: _noop(
            scd2(obs100, "custkey", ["priority"], ["ts", "ok"], "ts")),
    )
    obs.unpersist(); obs100.unpersist()

    # ---- z-order extents, rows x100 (same cell grid) ----------------
    li1 = li.select("l_partkey", "l_suppkey").persist()
    li1.count()
    li100 = li1.select("l_partkey", "l_suppkey", idx100).drop("__i").persist()
    li100.count()
    run(
        "zorder_extents", 100,
        lambda: _noop(
            zorder_cell_extents(li1, "l_partkey", "l_suppkey", 10, 5)),
        lambda: _noop(
            zorder_cell_extents(li100, "l_partkey", "l_suppkey", 10, 5)),
    )
    li1.unpersist(); li100.unpersist()

    # ---- attribution / markov, users x100 ---------------------------
    ev = events.select(
        "event_id", "user_id", "event_type", "ts", "value"
    ).persist()
    ev.count()
    ev100 = events.select(
        "event_id", "user_id", "event_type", "ts", "value", idx100
    ).select(
        "event_id",
        (F.col("user_id") + F.col("__i").cast("long") * 10_000_000)
        .alias("user_id"),
        "event_type", "ts", "value",
    ).persist()
    ev100.count()
    run(
        "touch_attribution", 100,
        lambda: _noop(
            touch_attribution(ev, "purchase", ["view", "click", "signup"])),
        lambda: _noop(
            touch_attribution(
                ev100, "purchase", ["view", "click", "signup"])),
    )
    run(
        "markov_transitions", 100,
        lambda: markov_transitions(ev).count(),
        lambda: markov_transitions(ev100).count(),
    )

    # ---- anomalies, groups x100 -------------------------------------
    hourly = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n")).persist()
    hourly.count()
    hourly100 = hourly.select("event_type", "bucket", "n", idx100).select(
        F.concat_ws("#", "event_type", F.col("__i")).alias("event_type"),
        "bucket", "n",
    ).persist()
    hourly100.count()
    run(
        "anomalies", 100,
        lambda: _noop(rolling_count_anomalies(
            hourly, "event_type", "bucket", "n", 3600)),
        lambda: _noop(rolling_count_anomalies(
            hourly100, "event_type", "bucket", "n", 3600)),
    )
    hourly.unpersist(); hourly100.unpersist()
    ev.unpersist(); ev100.unpersist()

    # ---- sorted neighborhood, verbatim clones x10 (hot blocks) ------
    d1 = docs.select("doc_id", "text").persist()
    d1.count()
    d10 = docs.select("doc_id", "text", idx10).select(
        (F.col("doc_id") + F.col("__i").cast("long") * 10_000_000)
        .alias("doc_id"),
        "text",
    ).persist()
    d10.count()
    run(
        "sorted_neighborhood", 10,
        lambda: dedup.sorted_neighborhood_pairs(d1).count(),
        lambda: dedup.sorted_neighborhood_pairs(d10).count(),
    )
    d1.unpersist(); d10.unpersist()

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
