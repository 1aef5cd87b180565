"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (SURVEY.md §7.2 slice) at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for each (same column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver runs us from.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mr_lda_spark import queries_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse the sf0.001 document corpus and return the term
    dictionary's top-20 terms (the SURVEY.md §7.2 end-to-end slice:
    scan → tokenize → agg → df-filter → ranked dictionary → top-k)."""
    return queries_registry.flagship(spark, "/root/testdata/sf0.001")


def _priority_key(last_round, last_row, oracles, fp_now, snaps):
    """Build the bucket sort key for :func:`_coverage_order`.

    Pure function of its inputs (no repo/file access) so tests can
    drive it with synthetic CORRECTNESS/FINGERPRINTS fixtures instead
    of pinning the repo's mutable round state (ADVICE r7 #2).

    Priority buckets, most-urgent first:

      0. never sampled in any prior round;
      1. latest driver row was NOT green — an error, or any of
         rows/schema/hash mismatched even with ``err: null`` (a fix
         only clears with a new green row; VERDICT r8 "What's wrong"
         #2: hash-red rows with no err previously filed into bucket 4
         and were never re-prioritized);
      2. the query's source fingerprint CHANGED since the round of its
         last driver row — its green evidence describes code that no
         longer exists (VERDICT r6 "What's missing" #1).  Fingerprints
         are FUNCTION-level since r8 (registry fn source + the source
         of every package function/class its code transitively
         reaches, see ``tools/fingerprints.py``), snapshotted per
         round in ``FINGERPRINTS.json``; a query whose last row is
         from round R is compared against the round-R snapshot.
         ORACLE-BACKED queries only (r8): the changed bucket exists to
         refresh HASH evidence that described dead code; a no-oracle
         row can only ever re-produce a rows-only smoke result, so a
         changed no-oracle query queues by recency like everyone else
         instead of displacing a hash-checkable stale row from the
         fixed sample budget;
      3. latest driver row was ``no_oracle`` but the query NOW has an
         oracle (the oracle landed after the last sample);
      4. everything else, least-recently-sampled first; at equal
         staleness, oracle-backed before no-oracle (hash evidence is
         worth more than a rows-only row at the same age, and the
         tiebreak stays recency-first so no-oracle rows never starve).

    Without the recency tiebreak, once every query has been seen the
    sort degenerates to registration order and the driver re-checks
    the same head of the registry forever while the tail starves
    (VERDICT r4 "What's wrong" #1)."""

    def _changed(n: str) -> bool:
        """True iff n's code differs from what its last row sampled."""
        if not fp_now or not snaps:
            return False
        snap = snaps.get(str(last_round[n]), {})
        # missing snapshot entry = can't prove unchanged -> re-check
        return snap.get(n) != fp_now.get(n)

    def key(n):
        if n not in last_round:
            return (0, 0, 0)
        row = last_row.get(n, {})
        err = row.get("err")
        # Bucket 1 = ANY non-green latest row, not just errors: a
        # rows/schema/hash mismatch with err=null is a wrong answer
        # (or a wrong oracle) and must be re-sampled first even when
        # no code changed — e.g. nondeterminism, or an oracle-typing
        # defect fixed without touching the query fn (VERDICT r8
        # "What's wrong" #2).
        mismatched = any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )
        if err not in (None, "no_oracle") or mismatched:
            return (1, last_round[n], 0)
        if _changed(n) and n in oracles:
            return (2, last_round[n], 0)
        if err == "no_oracle" and n in oracles:
            return (3, last_round[n], 0)
        return (4, last_round[n], 0 if n in oracles else 1)

    return key


def _coverage_order(names, repo=None):
    """Order query names so the driver's fixed-size per-round sample
    reaches the rows that most need (re-)checking — see
    :func:`_priority_key` for the bucket semantics.  This wrapper
    gathers the live repo state (CORRECTNESS rows, fingerprint
    snapshots, current fingerprints) and sorts."""
    import glob
    import json
    import re

    repo = repo or _REPO
    # last_round[name] = newest round number whose CORRECTNESS file has
    # a row for `name`; last_row[name] = that row.
    last_round: dict[str, int] = {}
    last_row: dict[str, dict] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            if rnd >= last_round.get(name, -1):
                last_round[name] = rnd
                last_row[name] = row if isinstance(row, dict) else {}

    oracles = set(queries_registry.ORACLES)

    # change-awareness: current fingerprints vs the per-round
    # snapshots.  Never let fingerprinting break the driver contract.
    fp_now: dict[str, str] = {}
    snaps: dict[str, dict[str, str]] = {}
    try:
        from tools.fingerprints import compute_fingerprints

        fp_now = compute_fingerprints(repo)
        with open(os.path.join(repo, "FINGERPRINTS.json")) as fh:
            snaps = json.load(fh)
    except Exception:
        pass

    return sorted(
        names, key=_priority_key(last_round, last_row, oracles,
                                 fp_now, snaps))


def _snapshot_next_round(repo=None) -> None:
    """Write the CURRENT fingerprints into FINGERPRINTS.json under the
    round number the next CORRECTNESS file will get (max existing + 1).

    Called from :func:`queries` — i.e. at the driver's sample time —
    so the snapshot the changed-bucket comparison needs next round is
    recorded by construction, exactly for the tree being sampled.  The
    r7 failure mode (driver writes CORRECTNESS_r7 after the round's
    final commit, no r7 snapshot exists, every r7 row re-flags as
    changed and the builder's own guard test goes red) cannot recur:
    any earlier same-round write is overwritten by the last
    ``queries()`` call before the CORRECTNESS file lands, which is the
    driver's own.  Idempotent; same-tree rewrites are byte-identical."""
    import glob
    import json
    import re

    repo = repo or _REPO
    from tools.fingerprints import compute_fingerprints

    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    nxt = str(max(rounds, default=0) + 1)
    path = os.path.join(repo, "FINGERPRINTS.json")
    snaps = {}
    if os.path.exists(path):
        with open(path) as fh:
            snaps = json.load(fh)
    snaps[nxt] = compute_fingerprints(repo)
    with open(path, "w") as fh:
        json.dump(snaps, fh, indent=0, sort_keys=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = queries_registry.QUERIES
    order = _coverage_order(q)
    try:
        _snapshot_next_round()
    except Exception:
        pass  # never let bookkeeping break the driver contract
    return {name: q[name] for name in order}


def oracle_sql() -> dict[str, str]:
    return queries_registry.ORACLES
