"""Golden-run LDA oracle contract (VERDICT r9 "Next round" #1).

The four golden rows freeze a seeded VB-EM configuration against a
committed expected table (mr_lda_spark/golden_lda.json, written by
tools/freeze_lda_golden.py after proving cross-partitioning
stability).  tests/test_oracle_parity.py replays them against the
literal-VALUES DuckDB oracle like every other row; this file pins the
surrounding contract — the JSON is complete and sane, and the queries
really ignore sf_dir (the frozen corpus is part of the configuration,
so the driver's sf0.01 run and the sweep's sf0.1 run must agree).
"""

import pytest

import math

from mr_lda_spark import queries_registry as reg

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


def test_heldout_golden_broadcast_equals_join():
    """The held-out join goldens score the SAME frozen state through
    the other E-step geometry — their committed audit rows must be
    identical (the freeze tool asserts this before writing; this pins
    the committed artifact without a Spark session)."""
    spec = reg._golden_expected()
    assert (
        spec["lda_heldout_perplexity_golden"]["rows"]
        == spec["lda_heldout_perplexity_join_golden"]["rows"]
    )
    assert (
        spec["polylda_heldout_perplexity_golden"]["rows"]
        == spec["polylda_heldout_perplexity_join_golden"]["rows"]
    )


def test_heldout_golden_row_shape():
    """One audit row each: positive counts, negative total_ll, finite
    perplexity > 1 (a uniform model over V terms tops out at V)."""
    spec = reg._golden_expected()
    for n in [
        "lda_heldout_perplexity_golden",
        "polylda_heldout_perplexity_golden",
    ]:
        rows = spec[n]["rows"]
        assert len(rows) == 1, n
        n_docs, n_tokens, total_ll, perplexity = rows[0]
        assert n_docs > 0 and n_tokens >= n_docs, n
        assert total_ll < 0, n
        assert 1.0 < perplexity < 1e6, n


def test_golden_json_complete_and_sane():
    spec = reg._golden_expected()
    missing = [n for n in GOLDEN_NAMES if n not in spec]
    assert not missing, f"golden JSON missing {missing} — run tools/freeze_lda_golden.py"
    for n in GOLDEN_NAMES:
        s = spec[n]
        assert s["rows"], f"{n}: empty expected table"
        assert len(s["columns"]) == len(s["duck_types"])
        for row in s["rows"]:
            assert len(row) == len(s["columns"]), f"{n}: ragged row {row}"
            for v in row:
                assert v is not None, f"{n}: NULL in golden row {row}"
                if isinstance(v, float):
                    assert math.isfinite(v), f"{n}: non-finite {row}"
        # every query is oracle-backed once frozen
        assert n in reg.ORACLES, f"{n} lost its oracle"


def test_golden_alpha_rows_present():
    """The α audit rows pin the Newton-Raphson path; K rows each."""
    spec = reg._golden_expected()
    for n in ["lda_train_golden", "lda_join_train_golden",
              "lda_informed_golden", "lda_online_golden"]:
        kinds = [r[0] for r in spec[n]["rows"]]
        assert kinds.count("alpha") == reg.GOLDEN_K, n
    for n in ["polylda_train_golden", "polylda_join_train_golden"]:
        poly = [r[0] for r in spec[n]["rows"]]
        assert poly.count("alpha") == reg.GOLDEN_K, n


def test_bpe_golden_equals_pure_python_fixture():
    """The registry's committed BPE expectation and the independent
    pure-Python reference fixture (which test_bpe.py pins the live
    trainer against) must be the same table — a drift in either
    artifact goes red here without a Spark session."""
    import json
    import os

    spec = reg._golden_expected()["text_bpe_merges_golden"]
    fx = json.load(
        open(
            os.path.join(
                os.path.dirname(__file__), "fixtures_bpe_sf0001_golden.json"
            )
        )
    )
    assert sorted(spec["rows"]) == sorted(
        [list(r) for r in fx["merges"]]
    )


@pytest.mark.slow
def test_golden_ignores_sf_dir(spark):
    """The driver calls with sf0.01, the sweep with sf0.1 — the golden
    rows must return the frozen-corpus result for ANY sf_dir."""
    spec = reg._golden_expected()["lda_train_golden"]
    df = reg.QUERIES["lda_train_golden"](spark, "/nonexistent/sf_dir")
    got = sorted(
        [list(r) for r in df.collect()],
        key=lambda r: tuple(str(x) for x in r),
    )
    assert got == spec["rows"]


def test_freeze_tool_covers_every_golden_row():
    """tools/freeze_lda_golden.py and the registry must agree on what
    'the golden family' is: every *_golden registry row appears in the
    tool's GOLDEN_NAMES (else re-freezing silently drops a row), every
    GOLDEN_NAMES entry is registered, and the committed JSON carries
    exactly that set."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "freeze_lda_golden",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "freeze_lda_golden.py"
        ),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    registry_golden = {n for n in reg.QUERIES if n.endswith("_golden")}
    assert set(tool.GOLDEN_NAMES) == registry_golden
    # underscore keys are freeze metadata (the corpus md5 pin), not rows
    committed = {k for k in reg._golden_expected() if not k.startswith("_")}
    assert committed == registry_golden
    for lhs, rhs in tool.CROSS_EQUAL:
        assert lhs in registry_golden and rhs in registry_golden
