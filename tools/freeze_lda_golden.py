"""Freeze the golden-run LDA expectations (VERDICT r9 "Next round" #1).

Runs every golden LDA query in GOLDEN_NAMES below (broadcast train,
held-out infer, shuffle-join train, polylingual train broadcast and
join-mode, informed-prior train, streaming online-VB)
in TWO separate vanilla-session subprocesses with deliberately
different execution geometry (local[8]/200 shuffle partitions vs
local[3]/7) and writes ``mr_lda_spark/golden_lda.json`` only if both
produce identical rounded rows — the committed expectation is thereby
proven stable against the one axis a frozen seed cannot pin: float
combine order across partitionings (the driver runs its own session
with its own parallelism).

Usage:
    python tools/freeze_lda_golden.py            # validate + write
    python tools/freeze_lda_golden.py --check    # validate vs committed

The ``--collect`` mode is internal (one subprocess leg).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

GOLDEN_NAMES = [
    "lda_train_golden",
    "lda_doc_topics_golden",
    "lda_join_train_golden",
    "polylda_train_golden",
    "lda_informed_golden",
    "polylda_join_train_golden",
    "lda_online_golden",
    "text_bpe_merges_golden",
    "text_bpe_encode_golden",
    "lda_heldout_perplexity_golden",
    "lda_heldout_perplexity_join_golden",
    "polylda_heldout_perplexity_golden",
    "polylda_heldout_perplexity_join_golden",
]

# The held-out join rows score the SAME frozen state through the other
# E-step geometry, so beyond per-name stability the freeze also proves
# broadcast ≡ join at the audit-row level (the pytest parity suite pins
# the per-doc γ/ll equality these aggregates summarize).
CROSS_EQUAL = [
    ("lda_heldout_perplexity_golden", "lda_heldout_perplexity_join_golden"),
    (
        "polylda_heldout_perplexity_golden",
        "polylda_heldout_perplexity_join_golden",
    ),
]

_DUCK_TYPE = {
    "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INTEGER",
    "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
    "string": "VARCHAR", "boolean": "BOOLEAN",
}


def collect(master: str, shuffle: str, out_path: str) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .getOrCreate()
    )
    from mr_lda_spark import queries_registry as reg

    out = {}
    for name in GOLDEN_NAMES:
        df = reg.QUERIES[name](spark, reg.GOLDEN_SF_DIR)
        cols = df.columns
        types = [_DUCK_TYPE[t] for _, t in df.dtypes]
        rows = sorted(
            [list(r) for r in df.collect()],
            key=lambda r: tuple(str(x) for x in r),
        )
        out[name] = {"columns": cols, "duck_types": types, "rows": rows}
    with open(out_path, "w") as fh:
        json.dump(out, fh)
    spark.stop()


def _run_leg(master: str, shuffle: str) -> dict:
    fd, path = tempfile.mkstemp(suffix=".json")
    os.close(fd)
    try:
        env = dict(os.environ)
        # The legs must run even when the corpus pin in the committed
        # golden_lda.json no longer matches (that is exactly what a
        # re-freeze is FOR); the new pin is written below with the new
        # expectations (self-review r11).
        env["SPARK_GRAFT_GOLDEN_UNPINNED"] = "1"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--collect", path,
             "--master", master, "--shuffle", shuffle],
            check=True, cwd=_REPO, env=env,
        )
        with open(path) as fh:
            return json.load(fh)
    finally:
        os.unlink(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--collect", default=None, help="internal: one leg")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--shuffle", default="200")
    ap.add_argument("--check", action="store_true",
                    help="validate committed JSON instead of rewriting")
    args = ap.parse_args()

    if args.collect:
        collect(args.master, args.shuffle, args.collect)
        return 0

    print("leg A: local[8], 200 shuffle partitions ...", flush=True)
    a = _run_leg("local[8]", "200")
    print("leg B: local[3], 7 shuffle partitions ...", flush=True)
    b = _run_leg("local[3]", "7")
    for name in GOLDEN_NAMES:
        if a[name] != b[name]:
            ra = {tuple(map(str, r)) for r in a[name]["rows"]}
            rb = {tuple(map(str, r)) for r in b[name]["rows"]}
            diff = sorted(ra ^ rb)[:10]
            raise SystemExit(
                f"UNSTABLE across partitionings: {name} "
                f"({len(ra ^ rb)} differing rows, first {diff}) — "
                f"raise GOLDEN_ROUND or fix nondeterminism before "
                f"freezing"
            )
        print(f"  {name}: {len(a[name]['rows'])} rows stable")

    for lhs, rhs in CROSS_EQUAL:
        if a[lhs]["rows"] != a[rhs]["rows"]:
            raise SystemExit(
                f"broadcast/join divergence: {lhs} != {rhs} — the two "
                "E-step geometries no longer agree on the held-out "
                "audit row"
            )
        print(f"  cross-pin: {lhs} == {rhs}")

    target = os.path.join(_REPO, "mr_lda_spark", "golden_lda.json")
    from mr_lda_spark.queries_registry import _golden_corpus_md5

    a["_corpus_md5"] = _golden_corpus_md5()
    if args.check:
        with open(target) as fh:
            committed = json.load(fh)
        bad = [n for n in GOLDEN_NAMES if committed.get(n) != a[n]]
        if bad:
            raise SystemExit(f"live run no longer matches committed: {bad}")
        print("committed golden matches live run")
        return 0
    with open(target, "w") as fh:
        json.dump(a, fh, indent=1)
    print(f"wrote {target} (corpus md5 {a['_corpus_md5']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
