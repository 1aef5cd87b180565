"""Polylingual CLI end-to-end on a raw 2-language corpus."""

import json
import os
import subprocess
import sys

import duckdb
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_train_poly(tmp_path):
    rows = duckdb.sql(
        "SELECT doc_id, text, lang FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE lang IN ('en','es') ORDER BY doc_id LIMIT 120"
    ).fetchall()
    groups: dict = {}
    for d, t, l in rows:
        groups.setdefault(d % 30, {})[l] = t
    corpus = tmp_path / "poly.txt"
    corpus.write_text(
        "".join(
            f"doc{g}\t{langs.get('en', 'null')}\t{langs.get('es', 'null')}\n"
            for g, langs in sorted(groups.items())
        )
    )
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [
            sys.executable, "-m", "mr_lda_spark.cli", "train-poly",
            "--input", "poly.txt", "--output", "./pmodel",
            "--language", "2", "--topic", "2",
            "--iteration", "2", "--gamma-iteration", "5",
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["languages"] == 2 and res["iterations"] == 2
    for artifact in ["term", "title", "gamma-2", "beta-lang0-2", "beta-lang1-2"]:
        assert (tmp_path / "pmodel" / artifact).exists(), artifact

    # Held-out mode (the reference's -test flag): score the same
    # corpus under the just-trained model through the beta join.
    out = subprocess.run(
        [
            sys.executable, "-m", "mr_lda_spark.cli", "train-poly",
            "--input", "poly.txt", "--output", "./pheldout",
            "--language", "2", "--topic", "2",
            "--gamma-iteration", "5", "--test", "./pmodel",
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["documents"] == 30 and res["total_log_likelihood"] < 0


def test_zero_vocab_language_does_not_crash():
    import numpy as np

    from mr_lda_spark.plans.lda import init_elog_beta

    eb = init_elog_beta(0, 4, seed=1)
    assert eb.shape == (1, 4) and np.all(np.isfinite(eb))
