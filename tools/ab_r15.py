#!/usr/bin/env python3
"""Interleaved isolated warm A/B across TREE SNAPSHOTS (round 15).

Each (query, tree) cell is one fresh-session `tools/bench_isolate.py`
run executed FROM that tree; reps interleave A/B/A/B… so host drift
hits both arms equally (the project host-noise protocol).  Prints a
median table and writes the raw JSON.

Usage: python tools/ab_r15.py out.json reps treeA treeB q1 q2 ...
"""
from __future__ import annotations

import json
import re
import subprocess
import sys


def run_one(tree: str, query: str) -> float | None:
    p = subprocess.run(
        [sys.executable, f"{tree}/tools/bench_isolate.py", query,
         "/root/testdata/sf0.1", "--warm"],
        capture_output=True, text=True, cwd=tree, timeout=900,
    )
    for line in (p.stdout or "").splitlines()[::-1]:
        try:
            d = json.loads(line)
            if "sec" in d:
                return d["sec"]
        except Exception:
            continue
    sys.stderr.write(f"FAILED {tree} {query}:\n{p.stdout[-500:]}\n{p.stderr[-2000:]}\n")
    return None


def main() -> None:
    out_path, reps = sys.argv[1], int(sys.argv[2])
    tree_a, tree_b = sys.argv[3], sys.argv[4]
    queries = sys.argv[5:]
    res: dict = {q: {"A": [], "B": []} for q in queries}
    for rep in range(reps):
        for q in queries:
            for arm, tree in (("A", tree_a), ("B", tree_b)):
                t = run_one(tree, q)
                res[q][arm].append(t)
                print(f"rep{rep} {q} {arm}({tree}): {t}", flush=True)
        with open(out_path, "w") as fh:
            json.dump({"tree_a": tree_a, "tree_b": tree_b, "runs": res}, fh, indent=1)
    med = lambda xs: sorted(x for x in xs if x is not None)[len([x for x in xs if x is not None]) // 2] if any(x is not None for x in xs) else None
    print(f"\n{'query':38s} {'A_med':>7s} {'B_med':>7s}  B/A")
    for q in queries:
        a, b = med(res[q]["A"]), med(res[q]["B"])
        r = f"{b/a:5.2f}" if a and b else "  n/a"
        print(f"{q:38s} {a or 0:7.2f} {b or 0:7.2f}  {r}")


if __name__ == "__main__":
    main()
