"""Registry-freeze gate (VERDICT r8 "Next round" #4).

The only red findings of round 8 traced to one commit that registered
oracle rows AFTER the round's sf0.1 sweep — they reached the driver
with no local validation.  This test makes that impossible to do
silently: every oracle-backed registry entry must appear GREEN in the
newest ``PARITY_SF01_r*.json``.  Registering a query therefore demands
an immediate sweep of it::

    python tools/parity_sweep.py <round> --only <new_query>

which merges the row into the round's PARITY file — "swept at birth".
A query this test has never seen red-flags in plain ``pytest`` within
minutes of being registered, not at judge time.
"""

import glob
import json
import os
import re

from mr_lda_spark import queries_registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_parity():
    paths = glob.glob(os.path.join(_REPO, "PARITY_SF01_r*.json"))
    assert paths, "no PARITY_SF01_r*.json at the repo root"
    best = max(
        paths,
        key=lambda p: int(
            re.search(r"_r(\d+)", os.path.basename(p)).group(1)),
    )
    with open(best) as fh:
        return best, json.load(fh)


def test_every_oracle_is_swept_and_green():
    path, parity = _newest_parity()
    results = parity.get("results", {})
    unswept = sorted(set(queries_registry.ORACLES) - set(results))
    assert not unswept, (
        f"oracle-backed queries missing from {os.path.basename(path)} "
        f"(register -> sweep at birth): {unswept}"
    )
    red = sorted(
        n for n in queries_registry.ORACLES
        if not results[n].get("ok")
    )
    assert not red, f"sweep-red queries in {os.path.basename(path)}: {red}"


def test_parity_file_has_no_orphan_rows():
    """A PARITY row for a query that no longer exists means the file
    was hand-edited or the registry shrank without a re-sweep — both
    worth a loud flag (stale green rows must not mask a rename)."""
    path, parity = _newest_parity()
    orphans = sorted(
        set(parity.get("results", {})) - set(queries_registry.ORACLES))
    assert not orphans, (
        f"{os.path.basename(path)} has rows for unregistered queries: "
        f"{orphans}"
    )


def test_nooracle_ledger_matches_registry():
    """NOORACLE.md (VERDICT r12 "Next round" #2) is the consolidated
    justification ledger for every registry row WITHOUT an oracle_sql
    entry.  It must stay in lockstep with the registry: a no-oracle
    row missing from the ledger means an unjustified weaker check
    reached the driver; a ledger row no longer in the registry (or
    now oracle-backed) is stale documentation masquerading as
    evidence."""
    ledger_path = os.path.join(_REPO, "NOORACLE.md")
    assert os.path.exists(ledger_path), "NOORACLE.md missing"
    with open(ledger_path) as fh:
        text = fh.read()
    documented = set(
        re.findall(r"^\| `([a-z0-9_]+)` \|", text, flags=re.M)
    )
    actual = set(queries_registry.QUERIES) - set(queries_registry.ORACLES)
    missing = sorted(actual - documented)
    stale = sorted(documented - actual)
    assert not missing, (
        "no-oracle registry rows absent from NOORACLE.md (add a table "
        f"row with reason + pinning evidence): {missing}"
    )
    assert not stale, (
        "NOORACLE.md documents rows that are no longer no-oracle "
        f"registry rows: {stale}"
    )


def test_nooracle_pinning_evidence_resolves():
    """Every golden/frozen sibling row named in a NOORACLE.md pin must
    itself be an ORACLE-BACKED registry row, and every named test file
    must exist — the ledger's evidence must be followable, not
    decorative."""
    with open(os.path.join(_REPO, "NOORACLE.md")) as fh:
        text = fh.read()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \| \w+ .*? \| (.*) \|$",
                      text, flags=re.M)
    assert rows, "NOORACLE.md table parse failed"
    no_oracle = set(queries_registry.QUERIES) - set(queries_registry.ORACLES)
    for name, pin in rows:
        for sibling in re.findall(r"`([a-z0-9_]+)`", pin):
            if sibling in queries_registry.QUERIES:
                assert sibling in queries_registry.ORACLES or (
                    sibling in no_oracle and sibling != name
                ), (
                    f"{name}: pinning row `{sibling}` is neither "
                    "oracle-backed nor a cross-referenced ledger row"
                )
        for path in re.findall(r"`(tests/[a-z0-9_]+\.py)", pin):
            assert os.path.exists(os.path.join(_REPO, path)), (
                f"{name}: pinning test file {path} does not exist"
            )
