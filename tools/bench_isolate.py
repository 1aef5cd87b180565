#!/usr/bin/env python3
"""Run a single registered query in a fresh Spark session and print its
wall time — used to isolate bench numbers from full-session effects
(cached state from earlier queries, GC pressure, registry warm-up).

Usage: python tools/bench_isolate.py <query_name> [sf_dir] [--warm]
  --warm  run the query once at sf0.001 first (JIT/codegen warm-up,
          matching bench.py's warm loop).
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

    spark = get_spark("bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    fn = queries_registry.QUERIES[name]
    if warm:
        fn(spark, "/root/testdata/sf0.001").count()
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    print(json.dumps({"query": name, "sec": round(dt, 3), "warm": warm}))


if __name__ == "__main__":
    main()
