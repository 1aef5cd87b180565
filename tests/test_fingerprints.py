"""Change-aware oracle re-sampling: the function-level fingerprint tool
and the `_coverage_order` bucket that consumes it.

Granularity and ordering are tested against SYNTHETIC fixtures (a
throwaway package built in tmp_path, hand-built CORRECTNESS/
FINGERPRINTS dicts) rather than the repo's mutable round state, so the
tests don't rot when a future round re-samples a query (ADVICE r7 #2).
"""
import importlib
import json
import linecache
import os
import shutil
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.fingerprints import (  # noqa: E402
    compute_fingerprints,
    fingerprint_queries,
)

# ---------------------------------------------------------------- live


@pytest.fixture(scope="module")
def fps():
    return compute_fingerprints(REPO)


def test_fingerprints_cover_every_query(fps):
    from mr_lda_spark import queries_registry

    assert set(fps) == set(queries_registry.QUERIES)
    assert all(len(v) == 16 for v in fps.values())


def test_fingerprints_deterministic(fps):
    assert compute_fingerprints(REPO) == fps


def test_snapshots_exist_for_all_sampled_rounds():
    """Every CORRECTNESS_r*.json round must have a FINGERPRINTS.json
    snapshot, else _coverage_order can't prove unchanged-ness."""
    import glob
    import re

    snaps = json.load(open(os.path.join(REPO, "FINGERPRINTS.json")))
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = re.search(r"r(\d+)", os.path.basename(p)).group(1)
        assert str(int(rnd)) in snaps, f"missing snapshot for round {rnd}"


# ---------------------------------------------------- synthetic package

_OPSA_V1 = '''\
def helper_a():
    return 1


def heavy(x):
    return helper_a() + x


def light(x):
    return x * 2
'''

_OPSA_V2 = _OPSA_V1.replace("return 1", "return 2")  # edit helper_a ONLY

_OPSB = '''\
def other(x):
    return x - 1
'''

_REGISTRY = '''\
from fpsynth import opsa
from fpsynth.opsb import other


def q_heavy(spark, sf):
    return opsa.heavy(1)


def q_light(spark, sf):
    return opsa.light(1)


def q_other(spark, sf):
    return other(1)


def q_late_import(spark, sf):
    from fpsynth import opsa as late

    return late.heavy(2)


def q_dunder(spark, sf):
    import os

    return os.path.basename(__file__)


QUERIES = {
    "q_heavy": q_heavy,
    "q_light": q_light,
    "q_other": q_other,
    "q_late_import": q_late_import,
    "q_dunder": q_dunder,
}
'''


def _build_pkg(root, opsa_src):
    pkg = os.path.join(root, "fpsynth")
    os.makedirs(pkg, exist_ok=True)
    for fname, src in [
        ("__init__.py", ""),
        ("opsa.py", opsa_src),
        ("opsb.py", _OPSB),
        ("registry.py", _REGISTRY),
    ]:
        with open(os.path.join(pkg, fname), "w") as fh:
            fh.write(textwrap.dedent(src))


def _fresh_fps(root):
    """(Re)import fpsynth from `root` and fingerprint its registry."""
    for mod in [m for m in sys.modules if m.split(".")[0] == "fpsynth"]:
        del sys.modules[mod]
    linecache.clearcache()
    sys.path.insert(0, str(root))
    try:
        reg = importlib.import_module("fpsynth.registry")
        return fingerprint_queries(reg.QUERIES, "fpsynth")
    finally:
        sys.path.remove(str(root))


def test_function_level_granularity(tmp_path):
    """Editing ONE operator function re-flags only the queries whose
    code reaches it — not everything importing the module.  This is
    the r8 fix for the r7 bucket saturation (95 flagged / 50 budget):
    a typical one-function diff flags a handful of queries, not the
    whole registry (VERDICT r7 'Next round' #2 done-bar)."""
    v1 = tmp_path / "v1"
    v2 = tmp_path / "v2"
    _build_pkg(str(v1), _OPSA_V1)
    _build_pkg(str(v2), _OPSA_V2)
    fp1 = _fresh_fps(v1)
    fp2 = _fresh_fps(v2)
    assert set(fp1) == set(fp2) == {
        "q_heavy", "q_light", "q_other", "q_late_import", "q_dunder"}
    # helper_a changed; heavy() calls it -> q_heavy and q_late_import
    # (which reaches heavy via an in-function import) must re-flag...
    assert fp1["q_heavy"] != fp2["q_heavy"]
    assert fp1["q_late_import"] != fp2["q_late_import"]
    # ...while queries in the SAME module that never reach helper_a
    # keep their fingerprints (the whole point of function-level).
    assert fp1["q_light"] == fp2["q_light"]
    assert fp1["q_other"] == fp2["q_other"]
    assert fp1["q_dunder"] == fp2["q_dunder"]


def test_fingerprints_path_independent(tmp_path):
    """The same source tree at two different absolute paths must
    fingerprint identically — __file__ and friends are skipped — else
    driver runs and git-archive backfills disagree and every query
    reads as changed."""
    a = tmp_path / "checkout_a"
    b = tmp_path / "deeply" / "nested" / "checkout_b"
    _build_pkg(str(a), _OPSA_V1)
    os.makedirs(str(b))
    _build_pkg(str(b), _OPSA_V1)
    assert _fresh_fps(a) == _fresh_fps(b)


def test_stable_fallback_for_sourceless_callables():
    """A registered callable without retrievable source (e.g. a
    functools.partial) must fingerprint stably across processes —
    never repr() with a memory address (ADVICE r7 #4)."""
    import functools

    from mr_lda_spark.operators import textops

    part = functools.partial(textops.quality_scores, min_len=3)
    fp1 = fingerprint_queries({"p": part}, "mr_lda_spark")
    part2 = functools.partial(textops.quality_scores, min_len=3)
    fp2 = fingerprint_queries({"p": part2}, "mr_lda_spark")
    assert fp1 == fp2


# ------------------------------------------------- coverage ordering


def test_coverage_order_buckets_synthetic():
    """Bucket semantics on hand-built state: never-sampled < errored <
    changed-fingerprint (oracle-backed only) < newly-oracled < stale
    (LRU first, oracled before no-oracle at equal age).  A CHANGED
    no-oracle query queues by recency — it can only re-produce a
    rows-only smoke row, so it must not displace hash-checkable stale
    rows from the fixed sample budget (r8)."""
    import __spark_entry__ as entry

    last_round = {
        "errored": 6, "changed": 6, "changed_no_oracle": 6,
        "newly_oracled": 5, "stale_old": 3,
        "stale_old_no_oracle": 3, "stale_new": 7,
    }
    last_row = {
        "errored": {"err": "boom"},
        "changed": {"err": None},
        "changed_no_oracle": {"err": "no_oracle"},
        "newly_oracled": {"err": "no_oracle"},
        "stale_old": {"err": None},
        "stale_old_no_oracle": {"err": "no_oracle"},
        "stale_new": {"err": None},
    }
    oracles = {"errored", "changed", "newly_oracled", "stale_old",
               "stale_new", "never"}
    fp_now = {n: "fp-now" for n in last_round}
    snaps = {
        "3": {"stale_old": "fp-now", "stale_old_no_oracle": "fp-now"},
        "5": {"newly_oracled": "fp-now"},
        "6": {"errored": "fp-now", "changed": "fp-OLD",
              "changed_no_oracle": "fp-OLD"},
        "7": {"stale_new": "fp-now"},
    }
    key = entry._priority_key(last_round, last_row, oracles, fp_now,
                              snaps)
    names = ["stale_new", "stale_old", "newly_oracled", "changed",
             "errored", "never", "changed_no_oracle",
             "stale_old_no_oracle"]
    assert sorted(names, key=key) == [
        "never", "errored", "changed", "newly_oracled",
        "stale_old",            # r3 oracled beats r3 no-oracle…
        "stale_old_no_oracle",  # …which still beats anything newer
        "changed_no_oracle",    # changed-but-no-oracle: plain recency
        "stale_new"]


def test_coverage_order_nongreen_row_is_urgent():
    """VERDICT r8 "What's wrong" #2: a latest row with ``err: null``
    but any of rows/schema/hash mismatched is a wrong answer and must
    land in bucket 1 (urgent) — even when the fingerprint is
    UNCHANGED — not in bucket 4 behind every stale-green row."""
    import __spark_entry__ as entry

    last_round = {"hash_red": 8, "rows_red": 8, "schema_red": 8,
                  "green": 3}
    last_row = {
        "hash_red": {"err": None, "rows_match": True,
                     "schema_match": True, "hash_match": False},
        "rows_red": {"err": None, "rows_match": False,
                     "schema_match": True, "hash_match": False},
        "schema_red": {"err": None, "rows_match": True,
                       "schema_match": False, "hash_match": True},
        "green": {"err": None, "rows_match": True,
                  "schema_match": True, "hash_match": True},
    }
    oracles = set(last_round)
    # every fingerprint provably unchanged -> nothing hides in bucket 2
    fp_now = {n: "fp" for n in last_round}
    snaps = {"8": {n: "fp" for n in last_round},
             "3": {n: "fp" for n in last_round}}
    key = entry._priority_key(last_round, last_row, oracles, fp_now,
                              snaps)
    order = sorted(["green", "hash_red", "rows_red", "schema_red"],
                   key=key)
    # the three non-green rows all outrank the (much staler) green row
    assert order[-1] == "green"
    assert {order[0], order[1], order[2]} == {
        "hash_red", "rows_red", "schema_red"}
    # and a legacy row without the match keys (old rounds) stays calm
    legacy_key = entry._priority_key(
        {"legacy": 2, "fresh_green": 8},
        {"legacy": {"err": None},
         "fresh_green": {"err": None, "rows_match": True,
                         "schema_match": True, "hash_match": True}},
        {"legacy", "fresh_green"}, fp_now={}, snaps={})
    assert sorted(["fresh_green", "legacy"], key=legacy_key) == [
        "legacy", "fresh_green"]


def test_coverage_order_missing_snapshot_means_changed():
    """A query whose last-row round has no snapshot entry can't be
    proven unchanged -> bucket 2, ahead of provably-unchanged rows."""
    import __spark_entry__ as entry

    key = entry._priority_key(
        last_round={"unproven": 4, "proven": 4},
        last_row={"unproven": {"err": None}, "proven": {"err": None}},
        oracles={"unproven", "proven"},
        fp_now={"unproven": "x", "proven": "y"},
        snaps={"4": {"proven": "y"}},
    )
    assert sorted(["proven", "unproven"], key=key) == [
        "unproven", "proven"]


def test_snapshot_next_round_writes_at_sample_time(tmp_path, monkeypatch):
    """queries()-time snapshotting (the r8 fix for the r7 sequencing
    gap): the snapshot lands under max(existing CORRECTNESS round)+1,
    merges into existing snapshots, and is idempotent — so the driver's
    own sample call always leaves a matching snapshot behind."""
    import __spark_entry__ as entry

    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r07.json").write_text("{}")
    (tmp_path / "FINGERPRINTS.json").write_text(
        json.dumps({"7": {"q": "old"}}))
    monkeypatch.setattr(
        "tools.fingerprints.compute_fingerprints",
        lambda repo: {"q": "fp-new"})
    entry._snapshot_next_round(repo=str(tmp_path))
    snaps = json.loads((tmp_path / "FINGERPRINTS.json").read_text())
    assert snaps == {"7": {"q": "old"}, "8": {"q": "fp-new"}}
    entry._snapshot_next_round(repo=str(tmp_path))  # idempotent
    assert json.loads(
        (tmp_path / "FINGERPRINTS.json").read_text()) == snaps


def test_coverage_order_live_smoke():
    """The live wrapper still returns a permutation of the registry."""
    import __spark_entry__ as entry
    from mr_lda_spark import queries_registry

    names = list(queries_registry.QUERIES)
    order = entry._coverage_order(names)
    assert sorted(order) == sorted(names)
