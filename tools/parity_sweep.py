"""sf0.1 oracle-parity sweep — the round-close gate (VERDICT r8 "Next
round" #4: registry frozen before the sweep, PARITY covers 100% of
ORACLES).

Runs every oracle-backed registry query on Spark (vanilla local[32]
session) AND DuckDB at 10x the driver's sf0.01 gate, compared with the
SHARED comparator (tools/parity.py): columns, row count, exact values,
and the driver-faithful typed-kind layer — so an oracle that would go
hash-red at the driver goes red here first.

Writes/merges ``PARITY_SF01_r{N}.json`` at the repo root.  Incremental
by design: ``--only name1,name2`` re-sweeps just those queries and
merges into the round file, so a query registered mid-round is swept
AT BIRTH and ``tests/test_registry_frozen.py`` stays green.  A full
run replaces the round file.

Usage:
    python tools/parity_sweep.py 9                 # full sweep -> _r09
    python tools/parity_sweep.py 9 --only q1,q2    # merge 2 rows
    python tools/parity_sweep.py 9 --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PROTOCOL = (
    "every oracle-backed registry query run on Spark (vanilla "
    "local[32] session) AND DuckDB at sf0.1 - 10x the driver's sf0.01 "
    "gate - compared with the shared comparator (tools/parity.py): "
    "columns, row count, exact values (floats at 1e-9), AND the "
    "driver-faithful typed-kind layer added in r9 after the two r8 "
    "hash-red rows (DuckDB sum(BIGINT)->HUGEINT surfaces as float64 "
    "in the driver's pandas path while Spark returns BIGINT; the old "
    "value-only comparator was blind to it).  Incremental rows merged "
    "by tools/parity_sweep.py --only are marked swept_incremental."
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names to merge")
    args = ap.parse_args()

    from mr_lda_spark import TABLES, queries_registry
    from mr_lda_spark.session import get_spark
    from tools import parity

    names = sorted(queries_registry.ORACLES)
    if args.only:
        only = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in only if n not in queries_registry.ORACLES]
        if missing:
            raise SystemExit(f"not oracle-backed: {missing}")
        names = only

    path = os.path.join(_REPO, f"PARITY_SF01_r{args.round:02d}.json")
    out = {"metric": "oracle_parity_sweep", "sf_dir": args.sf,
           "protocol": PROTOCOL, "results": {}}
    if args.only and os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)
        out.setdefault("results", {})

    spark = get_spark("parity-sweep")
    con = parity.duck_connect(args.sf, TABLES)
    t0 = time.time()
    for i, name in enumerate(names, 1):
        t = time.time()
        try:
            sdf = queries_registry.QUERIES[name](spark, args.sf)
            res = parity.compare(sdf, con, queries_registry.ORACLES[name])
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            res = {"ok": False, "why": f"{type(e).__name__}: {e}"[:300],
                   "rows": None, "oracle_rows": None}
        res["sec"] = round(time.time() - t, 2)
        if args.only:
            res["swept_incremental"] = True
        out["results"][name] = res
        print(f"[{i}/{len(names)}] {name}: "
              f"{'ok' if res['ok'] else 'FAIL ' + str(res['why'])} "
              f"({res['sec']}s)", flush=True)

    out["total"] = len(out["results"])
    out["failed"] = sorted(
        n for n, r in out["results"].items() if not r.get("ok"))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}: {out['total']} swept, "
          f"{len(out['failed'])} failed in {time.time() - t0:.0f}s")
    return 1 if out["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
