#!/usr/bin/env python3
"""Per-query empirical profile for the optimization rounds (guide §1):
run registered queries in ONE session (bench-identical protocol: warm
at sf0.001, cold caches per query, noop-force per bench.NOOP_FORCE),
label each query as its own job group, then read the Spark UI REST API
for per-stage executor run time / shuffle bytes / task counts — the
"where is the time actually going" table the optimization guide says
to build before touching anything.

Usage:
    python tools/opt_profile.py out.json q1 q2 ...
    python tools/opt_profile.py out.json --top        # headline set
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    out_path = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]

    import bench
    from mr_lda_spark import queries_registry
    from mr_lda_spark.session import get_spark

    if "--top" in sys.argv:
        names = bench.HEADLINE + names

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "opt-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # bench-identical warm-up
    for warm in (
        "q1_pricing_summary", "q3_top_orders", "orders_running_total",
        "parse_term_dict", "dedup_jaccard_pairs", "lda_train_topics",
    ):
        queries_registry.QUERIES[warm](spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict] = {}
    for name in names:
        fn = queries_registry.QUERIES.get(name)
        if fn is None:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        queries_registry._PARSE_CACHE.clear()
        queries_registry._LDA_CACHE.clear()
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        if name in bench.NOOP_FORCE:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        results[name] = {
            "construct_s": round(t1 - t0, 3),
            "action_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
        }
        print(f"{name}: total {t2 - t0:.2f}s "
              f"(construct {t1 - t0:.2f}, action {t2 - t1:.2f})")

    # ---- REST scrape: map job groups -> stages -> metrics ----------
    base = "http://localhost:4050/api/v1"
    app_id = sc.applicationId

    def rest(p):
        with urllib.request.urlopen(f"{base}/applications/{app_id}{p}") as r:
            return json.load(r)

    jobs = rest("/jobs?status=succeeded") + rest("/jobs?status=failed")
    stages = {s["stageId"]: s for s in rest("/stages")}
    for j in jobs:
        grp = j.get("jobGroup")
        if grp not in results:
            continue
        q = results[grp]
        q.setdefault("jobs", 0)
        q["jobs"] += 1
        q.setdefault("stages", [])
        for sid in j.get("stageIds", []):
            s = stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            q["stages"].append({
                "stage": sid,
                "name": s.get("name", "")[:80],
                "tasks": s.get("numCompleteTasks"),
                "executorRunTime_ms": s.get("executorRunTime"),
                "executorCpuTime_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "shuffleRead_b": s.get("shuffleReadBytes"),
                "shuffleWrite_b": s.get("shuffleWriteBytes"),
                "input_b": s.get("inputBytes"),
                "duration_ms": (
                    s.get("completionTime") and s.get("firstTaskLaunchedTime")
                    and None
                ),
            })
    for q in results.values():
        if "stages" in q:
            q["stages"].sort(key=lambda s: -(s["executorRunTime_ms"] or 0))
            q["sum_executorRunTime_ms"] = sum(
                s["executorRunTime_ms"] or 0 for s in q["stages"])
            q["sum_shuffleWrite_b"] = sum(
                s["shuffleWrite_b"] or 0 for s in q["stages"])
            q["n_stages"] = len(q["stages"])

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
