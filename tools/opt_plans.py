#!/usr/bin/env python3
"""Dump .explain('formatted') for named registered queries into
plans/<round dir>/<query>_<tag>.txt — the before/after plan receipts
for the optimization rounds.  Round dir from $OPT_PLANS_DIR (default
r15).

Usage: python tools/opt_plans.py <tag> q1 q2 ...
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mr_lda_spark import queries_registry
    from mr_lda_spark.session import get_spark

    spark = get_spark("opt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_REPO, "plans", os.environ.get("OPT_PLANS_DIR", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = queries_registry.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
