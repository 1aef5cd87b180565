#!/usr/bin/env python3
"""Run a single registered query in a fresh Spark session and print its
wall time — used to isolate bench numbers from full-session effects
(cached state from earlier queries, GC pressure, registry warm-up).

Usage: python tools/bench_isolate.py <query_name> [sf_dir] [--warm] [--noop|--count]
  --warm   run the query once at sf0.001 first (JIT/codegen warm-up,
           matching bench.py's warm loop).
  --noop   force with a noop-sink write instead of count() — required for
           queries whose top shape is an outer join against a unique-keyed
           rebuild (Catalyst eliminates the join under count(1), timing a
           filtered scan instead of the operator). Default for queries in
           bench.NOOP_FORCE; --count overrides back to count() so the two
           actions can be compared on the same query.
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
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "/root/testdata/sf0.1"
    warm = "--warm" in sys.argv

    from mr_lda_spark.session import get_spark
    from mr_lda_spark import queries_registry
    import bench

    spark = get_spark("bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    fn = queries_registry.QUERIES[name]
    noop = name in bench.NOOP_FORCE or "--noop" in sys.argv
    if "--count" in sys.argv:
        noop = False

    def force(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    if warm:
        force(fn(spark, "/root/testdata/sf0.001"))
    t0 = time.perf_counter()
    force(fn(spark, sf_dir))
    dt = time.perf_counter() - t0
    print(json.dumps({"query": name, "sec": round(dt, 3), "warm": warm,
                      "action": "noop" if noop else "count"}))


if __name__ == "__main__":
    main()
