#!/usr/bin/env python3
"""Scale probes for the r9c operator families, paired 1x-vs-Nx in one
process (growth-at-birth rule):

- bloom_pruned_join, factor 100: the FACT side cloned x100 against the
  same selective dim — the regime the runtime filter exists for; also
  records the paired plain-join time at Nx (same process) so the
  pruning's value is measured, not asserted.
- hll_pairwise_sets, sources x10: register relation grows with labels
  (pairs x~100) while the corpus term stays constant — the probe
  clones the (source, shingle) keys with rewritten source labels.
- negative_samples, corpus x100: n and B scale together so bucket
  size stays ~constant — the join must grow ~linearly.

Forcing: all three end in aggregates/filter-bearing joins that
count() cannot skip (bloom join: grouped agg; pairwise: join of
grouped aggs; negatives: arg-min groupBy).

Usage: python tools/probe_r9c_ops_100x.py [out_json]
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "SCALING_r09c_ops.json"
    )

    from pyspark.sql import functions as F

    from mr_lda_spark.operators import hll, textops
    from mr_lda_spark.operators.bloom import bloom_pruned_join
    from mr_lda_spark.operators.curation import negative_samples
    from mr_lda_spark.session import get_spark, read_table

    spark = get_spark("probe-r9c-ops")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_probe_r9c_ops", "sf_dir": sf_dir,
                 "ops": {}}

    def run(op, factor, fn_1x, fn_nx, extra=None):
        t0 = time.perf_counter()
        r1 = fn_1x()
        s1 = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rn = fn_nx()
        sn = round(time.perf_counter() - t0, 3)
        rec = {
            "factor": factor, "sec_1x": s1, "sec_Nx": sn,
            "growth": round(sn / s1, 2) if s1 > 0 else None,
            "rows_1x": r1, "rows_Nx": rn,
        }
        if extra:
            rec.update(extra())
        out["ops"][op] = rec
        print(op, rec, flush=True)

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders")
    docs = read_table(spark, sf_dir, "documents")
    idx100 = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("__i")
    idx10 = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__i")

    # ---- bloom-pruned join, fact x100 -------------------------------
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 250000)
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate")
    dim = dim.persist(); dim.count()
    li1 = li.persist(); li1.count()
    li100 = li.select("*", idx100).drop("__i").persist(); li100.count()

    def agg(joined):
        return joined.groupBy(
            F.year("o_orderdate").alias("y")
        ).agg(F.count(F.lit(1)).alias("n")).count()

    plain_nx = {}

    def measure_plain():
        t0 = time.perf_counter()
        agg(li100.join(dim, "l_orderkey"))
        plain_nx["plain_join_sec_Nx"] = round(time.perf_counter() - t0, 3)
        return plain_nx

    run(
        "bloom_pruned_join", 100,
        lambda: agg(bloom_pruned_join(li1, dim, "l_orderkey")),
        lambda: agg(bloom_pruned_join(li100, dim, "l_orderkey")),
        extra=measure_plain,
    )
    li1.unpersist(); li100.unpersist(); dim.unpersist()

    # ---- hll pairwise sets, sources x10 ------------------------------
    keys = textops.shingles(docs, "text", 5).join(
        docs.select("doc_id", "source"), "doc_id"
    ).select("source", "shingle").persist()
    keys.count()
    keys10 = keys.select("*", idx10).select(
        F.concat_ws("#", "source", F.col("__i")).alias("source"),
        "shingle",
    ).persist()
    keys10.count()
    run(
        "hll_pairwise_sets", 10,
        lambda: hll.hll_pairwise_sets(
            hll.hll_registers(keys, "shingle", ["source"], p=8),
            "source", p=8).count(),
        lambda: hll.hll_pairwise_sets(
            hll.hll_registers(keys10, "shingle", ["source"], p=8),
            "source", p=8).count(),
    )
    keys.unpersist(); keys10.unpersist()

    # ---- negative samples, corpus x100 ------------------------------
    d1 = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    d1 = d1.persist(); d1.count()
    d100 = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       idx100).select(
        (F.col("doc_id") + F.col("__i").cast("long") * 10_000_000)
        .alias("doc_id")
    ).persist()
    d100.count()
    run(
        "negative_samples", 100,
        lambda: negative_samples(d1, k=4).count(),
        lambda: negative_samples(d100, k=4).count(),
    )

    # ---- windowed funnel, users x100 --------------------------------
    from mr_lda_spark.operators.funnel import funnel_steps_windowed
    from mr_lda_spark.operators.profile import pearson_correlations

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).persist()
    ev.count()
    ev100 = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", idx100
    ).select(
        "event_id",
        (F.col("user_id") + F.col("__i").cast("long") * 10_000_000)
        .alias("user_id"),
        "event_type", "ts",
    ).persist()
    ev100.count()
    gap = 7 * 86400 * 1_000_000

    def _noop_funnel(df):
        df.write.format("noop").mode("overwrite").save()
        return df.rdd.getNumPartitions()

    run(
        "funnel_windowed", 100,
        lambda: _noop_funnel(funnel_steps_windowed(
            ev, ["view", "click", "purchase"], gap)),
        lambda: _noop_funnel(funnel_steps_windowed(
            ev100, ["view", "click", "purchase"], gap)),
    )
    ev.unpersist(); ev100.unpersist()

    # ---- correlations, rows x100 (pure scan/agg) --------------------
    li2 = read_table(spark, sf_dir, "lineitem")
    s1 = li2.select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("price_cents"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_bp"),
    ).persist()
    s1.count()
    s100 = s1.select("*", idx100).drop("__i").persist()
    s100.count()

    def _noop_corr(df):
        df.write.format("noop").mode("overwrite").save()
        return df.rdd.getNumPartitions()

    run(
        "correlations", 100,
        lambda: _noop_corr(
            pearson_correlations(s1, ["qty", "price_cents", "disc_bp"])),
        lambda: _noop_corr(
            pearson_correlations(s100, ["qty", "price_cents", "disc_bp"])),
    )
    s1.unpersist(); s100.unpersist()

    # ---- co-purchase mining, disjoint basket clones x10 -------------
    from mr_lda_spark.operators.mining import (
        copurchase_lift,
        item_similarity_topk,
    )
    from mr_lda_spark.operators.sketch import (
        ams_f2_estimate,
        selfjoin_mass_estimate,
    )
    from mr_lda_spark.operators import textops

    lif = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 30
    ).select("l_orderkey", "l_partkey").persist()
    lif.count()
    lif10 = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 30
    ).select("l_orderkey", "l_partkey", idx10).select(
        (F.col("l_orderkey") + F.col("__i").cast("long") * 100_000_000)
        .alias("l_orderkey"),
        (F.col("l_partkey") + F.col("__i").cast("long") * 10_000_000)
        .alias("l_partkey"),
    ).persist()
    lif10.count()
    run(
        "copurchase_lift", 10,
        lambda: copurchase_lift(lif, "l_orderkey", "l_partkey", 2).count(),
        lambda: copurchase_lift(
            lif10, "l_orderkey", "l_partkey", 2).count(),
    )
    run(
        "item_similarity_topk", 10,
        lambda: item_similarity_topk(
            lif, "l_orderkey", "l_partkey", 5, 2).count(),
        lambda: item_similarity_topk(
            lif10, "l_orderkey", "l_partkey", 5, 2).count(),
    )
    lif.unpersist(); lif10.unpersist()

    # ---- self-join mass sketches, distinct keys x100 ----------------
    docs2 = read_table(spark, sf_dir, "documents")
    sh1 = textops.shingles(docs2, "text", 3).distinct().select(
        "shingle").persist()
    sh1.count()
    sh100b = sh1.select("shingle", idx100).select(
        F.concat_ws("#", "shingle", F.col("__i")).alias("shingle")
    ).persist()
    sh100b.count()
    run(
        "selfjoin_mass_cms", 100,
        lambda: selfjoin_mass_estimate(sh1, "shingle", 65536, 5).count(),
        lambda: selfjoin_mass_estimate(
            sh100b, "shingle", 65536, 5).count(),
    )
    run(
        "selfjoin_mass_ams", 100,
        lambda: ams_f2_estimate(sh1, "shingle", 65536, 5).count(),
        lambda: ams_f2_estimate(sh100b, "shingle", 65536, 5).count(),
    )
    sh1.unpersist(); sh100b.unpersist()

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
