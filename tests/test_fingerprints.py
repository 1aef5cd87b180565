"""Change-aware oracle re-sampling (VERDICT r6 item #2): the
fingerprint tool and the `_coverage_order` bucket that consumes it."""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.fingerprints import compute_fingerprints  # noqa: E402


@pytest.fixture(scope="module")
def fps():
    return compute_fingerprints(REPO)


def test_fingerprints_cover_every_query(fps):
    from mr_lda_spark import queries_registry

    assert set(fps) == set(queries_registry.QUERIES)
    assert all(len(v) == 16 for v in fps.values())


def test_fingerprints_deterministic(fps):
    assert compute_fingerprints(REPO) == fps


def test_fingerprint_reaches_operator_modules(fps):
    """A query's fingerprint must incorporate the operator module it
    calls — not just its registry wrapper — otherwise operator edits
    would never trigger a re-check.  Verify by construction: the
    curation-module file hash participates in curation_quality_filter's
    fingerprint (flip a bit of the module bytes via the snapshot diff
    instead of mutating the file: the r6 snapshot, taken before the r7
    curation.py edit, differs from today's fingerprint)."""
    snaps = json.load(open(os.path.join(REPO, "FINGERPRINTS.json")))
    r6 = snaps["6"]
    # curation.py was edited in r7 (perplexity-filter persist); any
    # query reaching it must have a new fingerprint vs the r6 snapshot.
    assert fps["curation_perplexity_filter_lm"] != r6[
        "curation_perplexity_filter_lm"
    ]
    # a query not touching the edited modules keeps its fingerprint
    # (events_cube: pure registry SQL over events table).
    assert fps.get("events_cube") == r6.get("events_cube")


def test_snapshots_exist_for_all_sampled_rounds():
    """Every CORRECTNESS_r*.json round must have a FINGERPRINTS.json
    snapshot, else _coverage_order can't prove unchanged-ness."""
    import glob
    import re

    snaps = json.load(open(os.path.join(REPO, "FINGERPRINTS.json")))
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = re.search(r"r(\d+)", os.path.basename(p)).group(1)
        assert str(int(rnd)) in snaps, f"missing snapshot for round {rnd}"


def test_coverage_order_prioritizes_changed_queries():
    """Changed-since-last-green queries must sort before unchanged
    stale ones (bucket 2 vs 4)."""
    import __spark_entry__ as entry

    order = entry._coverage_order(
        list(__import__("mr_lda_spark.queries_registry", fromlist=["x"])
             .QUERIES)
    )
    pos = {n: i for i, n in enumerate(order)}
    # changed this round (curation.py edit) vs untouched-and-sampled-r6
    assert pos["curation_perplexity_filter_lm"] < pos["events_cube"]
