"""End-to-end CLI test: the reference's five-entry-point workflow
(parse → informed-prior → train → display) on a raw text corpus."""

import json
import os
import subprocess
import sys

import duckdb
import pytest

# Driver-window gate: every CLI workflow is a spark-submit subprocess
# (28-104 s each); the whole module is builder-side `slow`.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "mr_lda_spark.cli", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


@pytest.mark.slow
def test_cli_full_workflow(tmp_path):
    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 100"
    ).fetchall()
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("".join(f"doc{d}\t{t}\n" for d, t in rows))
    (tmp_path / "stop.txt").write_text("the\na\n")
    (tmp_path / "prior.txt").write_text("spark query\njoin merge\n")

    out = _run(
        [
            "parse", "--input", "corpus.txt", "--output", "./out",
            "--format", "raw", "--stoplist", "stop.txt",
        ],
        tmp_path,
    )
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["documents"] == 100 and stats["vocabulary"] > 0

    _run(
        ["informed-prior", "--input", "prior.txt", "--output", "./eta",
         "--index", "./out/term"],
        tmp_path,
    )
    out = _run(
        ["train", "--input", "./out", "--output", "./model", "--topic", "2",
         "--iteration", "2", "--gamma-iteration", "5",
         "--informed-prior", "./eta"],
        tmp_path,
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert res["iterations"] == 2

    out = _run(
        ["display-topic", "--input", "./model/beta-2", "--index", "./out/term",
         "--top-display", "2"],
        tmp_path,
    )
    lines = [l for l in out.splitlines() if l.startswith("topic")]
    assert len(lines) == 4  # 2 topics x 2 terms

    out = _run(
        ["display-document", "--input", "./model/gamma-2", "--limit", "2"],
        tmp_path,
    )
    assert len([l for l in out.splitlines() if "\t" in l]) >= 2

    # Held-out inference through the β-join path (no driver β collect).
    out = _run(
        ["infer", "--input", "./out", "--beta", "./model/beta-2",
         "--alpha", "./model/alpha-2.json", "--output", "./heldout",
         "--gamma-iteration", "5"],
        tmp_path,
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert res["documents"] == 100 and res["total_log_likelihood"] < 0


def test_cli_curate(tmp_path):
    """`curate` runs the full pipeline off a documents parquet and
    reports the per-stage audit counts."""
    out_dir = str(tmp_path / "curated")
    stdout = _run(
        [
            "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out_dir,
            "--langs", "en",
            "--min-quality", "0.3",
        ],
        cwd=str(tmp_path),
    )
    audit = json.loads(stdout.strip().splitlines()[-1])
    assert audit["total_docs"] > 0
    assert 0 < audit["final_docs"] <= audit["after_lang_filter"] <= audit["total_docs"]
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM '{out_dir}/*.parquet'").fetchone()[0]
    assert n == audit["final_docs"]


def test_cli_dedup_exact_and_containment(tmp_path):
    """`dedup` writes survivors + audit for both a grouping method
    (exact) and a pair method (containment via connected components);
    survivor count equals input minus removed and the parquet on disk
    agrees."""
    src = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    n_in = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
    for method, extra in [
        ("exact", []),
        ("containment", ["--threshold", "0.8", "--max-shingle-df", "100"]),
    ]:
        out_dir = str(tmp_path / f"dedup_{method}")
        stdout = _run(
            ["dedup", "--input", src, "--output", out_dir,
             "--method", method, *extra],
            cwd=str(tmp_path),
        )
        audit = json.loads(stdout.strip().splitlines()[-1])
        assert audit["method"] == method
        assert audit["input_docs"] == n_in
        assert audit["surviving_docs"] == n_in - audit["removed"]
        assert 0 < audit["surviving_docs"] <= n_in
        n_disk = con.execute(
            f"SELECT count(*) FROM '{out_dir}/*.parquet'"
        ).fetchone()[0]
        assert n_disk == audit["surviving_docs"]


def test_cli_train_join_mode(tmp_path):
    """cli train --beta-mode join: distributed-beta EM end-to-end with
    an informed prior, writing the same artifact set as broadcast."""
    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 80"
    ).fetchall()
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("".join(f"doc{d}\t{t}\n" for d, t in rows))
    (tmp_path / "prior.txt").write_text("spark query\njoin merge\n")
    _run(["parse", "--input", "corpus.txt", "--output", "./out",
          "--format", "raw"], tmp_path)
    _run(["informed-prior", "--input", "prior.txt", "--output", "./eta",
          "--index", "./out/term"], tmp_path)
    out = _run(
        ["train", "--input", "./out", "--output", "./jmodel", "--topic", "2",
         "--iteration", "2", "--gamma-iteration", "5",
         "--beta-mode", "join", "--informed-prior", "./eta"],
        tmp_path,
    )
    res = json.loads(out.strip().splitlines()[-1])
    assert res["iterations"] == 2
    for artifact in ["beta-2", "gamma-2", "alpha-2.json"]:
        assert (tmp_path / "jmodel" / artifact).exists(), artifact


def test_cli_decontaminate_both_modes(tmp_path):
    """`decontaminate` drops flagged docs (flag mode) or cuts only the
    contaminated spans (spans mode), with consistent audits."""
    src = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    # eval corpus: every 43rd doc (the registry's decontam split)
    ev_dir = str(tmp_path / "eval.parquet")
    con.execute(
        f"COPY (SELECT * FROM '{src}' WHERE doc_id % 43 = 0) TO '{ev_dir}' "
        "(FORMAT PARQUET, PER_THREAD_OUTPUT FALSE)"
    )
    tr_dir = str(tmp_path / "train.parquet")
    con.execute(
        f"COPY (SELECT * FROM '{src}' WHERE doc_id % 43 <> 0) TO '{tr_dir}' "
        "(FORMAT PARQUET, PER_THREAD_OUTPUT FALSE)"
    )
    n_in = con.execute(f"SELECT count(*) FROM '{tr_dir}'").fetchone()[0]

    out = _run(
        ["decontaminate", "--input", tr_dir, "--eval", ev_dir,
         "--output", str(tmp_path / "flagged"), "--mode", "flag"],
        cwd=str(tmp_path),
    )
    audit = json.loads(out.strip().splitlines()[-1])
    assert audit["input_docs"] == n_in
    assert audit["surviving_docs"] == n_in - audit["removed_docs"]

    out = _run(
        ["decontaminate", "--input", tr_dir, "--eval", ev_dir,
         "--output", str(tmp_path / "cut"), "--mode", "spans"],
        cwd=str(tmp_path),
    )
    audit = json.loads(out.strip().splitlines()[-1])
    assert audit["input_docs"] == n_in and audit["tokens_removed"] >= 0
    n_disk = con.execute(
        f"SELECT count(*) FROM '{tmp_path}/cut/*.parquet'"
    ).fetchone()[0]
    assert n_disk == n_in  # spans mode keeps every doc


def test_cli_dedup_quality_policy(tmp_path):
    """`dedup --survivor-policy quality` keeps one member per near-dup
    component (count matches the min-id policy) but picks by quality:
    the two runs agree on CARDINALITY and differ at most in WHICH
    member survives."""
    src = "/root/testdata/sf0.001/documents.parquet"
    outs = {}
    for policy in ("min-id", "quality"):
        out_dir = str(tmp_path / f"dedup_{policy.replace('-', '_')}")
        stdout = _run(
            ["dedup", "--input", src, "--output", out_dir,
             "--method", "jaccard", "--threshold", "0.2",
             "--survivor-policy", policy],
            cwd=str(tmp_path),
        )
        audit = json.loads(stdout.strip().splitlines()[-1])
        outs[policy] = (out_dir, audit)
    import duckdb as _dd

    con = _dd.connect()
    n_min = con.execute(
        f"SELECT count(*) FROM '{outs['min-id'][0]}/*.parquet'"
    ).fetchone()[0]
    n_q = con.execute(
        f"SELECT count(*) FROM '{outs['quality'][0]}/*.parquet'"
    ).fetchone()[0]
    assert n_min == n_q == outs["quality"][1]["surviving_docs"]


def test_cli_curate_entropy_gate(tmp_path):
    """`curate --min-entropy` adds the char-entropy floor as an extra
    stage: survivors are a subset of the ungated run and every
    survivor clears the gate."""
    gated_dir = str(tmp_path / "curated_gated")
    stdout = _run(
        [
            "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", gated_dir,
            "--langs", "en",
            "--min-quality", "0.3",
            "--min-entropy", "4.0",
        ],
        cwd=str(tmp_path),
    )
    audit = json.loads(stdout.strip().splitlines()[-1])
    assert audit["min_entropy"] == 4.0
    assert 0 < audit["final_docs"] <= audit["after_lang_filter"]
    con = duckdb.connect()
    # Every survivor's recomputed entropy clears the floor.
    low = con.execute(f"""
        WITH surv AS (
          SELECT d.doc_id, d.text
          FROM '/root/testdata/sf0.001/documents.parquet' d
          JOIN '{gated_dir}/*.parquet' s ON s.doc_id = d.doc_id
        ), ch AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch FROM surv
        ), per AS (
          SELECT doc_id, ch, count(*) AS c FROM ch
          WHERE ch <> '' GROUP BY 1, 2
        ), doc AS (
          SELECT doc_id, sum(c) AS n,
                 sum(CAST(round(c * log2(c) * 1000000) AS BIGINT)) AS s
          FROM per GROUP BY 1
        )
        SELECT count(*) FROM doc
        WHERE round(log2(n) - s / (n * 1000000.0), 4) < 4.0
    """).fetchone()[0]
    assert low == 0


def test_cli_sample_weighted(tmp_path):
    """`sample` writes exactly k full rows with a rank column and the
    draw is deterministic across runs."""
    src = "/root/testdata/sf0.001/documents.parquet"
    outs = []
    for run in ("a", "b"):
        out_dir = str(tmp_path / f"sampled_{run}")
        stdout = _run(
            ["sample", "--input", src, "--output", out_dir,
             "--k", "15", "--weight-col", "n_chars"],
            cwd=str(tmp_path),
        )
        audit = json.loads(stdout.strip().splitlines()[-1])
        assert audit["sampled_docs"] == 15
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT doc_id, rank FROM '{out_dir}/*.parquet' ORDER BY rank"
        ).fetchall()
        assert len(rows) == 15
        assert [r[1] for r in rows] == list(range(1, 16))
        outs.append(rows)
    assert outs[0] == outs[1]


def test_cli_media_ops(tmp_path):
    """`media` runs a real-codec feature op end-to-end: dhash rows for
    every image-kind doc, and the near-dup op emits the banded pair
    relation."""
    src = "/root/testdata/sf0.001/documents.parquet"
    out_dhash = str(tmp_path / "media_dhash")
    stdout = _run(
        ["media", "--input", src, "--output", out_dhash,
         "--op", "png-dhash"],
        cwd=str(tmp_path),
    )
    audit = json.loads(stdout.strip().splitlines()[-1])
    con = duckdb.connect()
    n_img = con.execute(
        f"SELECT count(*) FROM '{src}' WHERE doc_id % 3 = 0"
    ).fetchone()[0]
    assert audit["output_rows"] == n_img
    n = con.execute(
        f"SELECT count(*), count(DISTINCT dhash) FROM '{out_dhash}/*.parquet'"
    ).fetchone()
    assert n[0] == n_img and n[1] > 1

    out_pairs = str(tmp_path / "media_pairs")
    stdout = _run(
        ["media", "--input", src, "--output", out_pairs,
         "--op", "image-near-dupes", "--max-hamming", "6"],
        cwd=str(tmp_path),
    )
    audit = json.loads(stdout.strip().splitlines()[-1])
    assert audit["op"] == "image-near-dupes"
    assert audit["output_rows"] >= 0


def test_cli_stats_reports(tmp_path):
    """`stats` writes each analysis report with consistent shapes."""
    src = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(DISTINCT source) FROM '{src}'"
    ).fetchone()[0]
    for op, expect_rows in [
        ("entropy", n_src),
        ("diversity", n_src),
        ("js-divergence", n_src * (n_src - 1) // 2),
    ]:
        out_dir = str(tmp_path / f"stats_{op}")
        stdout = _run(
            ["stats", "--input", src, "--output", out_dir, "--op", op],
            cwd=str(tmp_path),
        )
        audit = json.loads(stdout.strip().splitlines()[-1])
        assert audit["output_rows"] == expect_rows, op


@pytest.mark.slow
def test_cli_train_reliable_tier(tmp_path):
    """--corpus-checkpoint reliable end-to-end exactly as a
    spark-submit user would run it: the checkpoint dir arrives via the
    public ``spark.checkpoint.dir`` conf (PYSPARK_SUBMIT_ARGS here),
    training succeeds, checkpoint files land in that dir, and the
    sweeper leaves only the live generation behind."""
    import glob

    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "'/root/testdata/sf0.001/documents.parquet' LIMIT 60"
    ).fetchall()
    (tmp_path / "corpus.txt").write_text(
        "".join(f"doc{d}\t{t}\n" for d, t in rows)
    )
    _run(
        ["parse", "--input", "corpus.txt", "--output", "./out",
         "--format", "raw"],
        tmp_path,
    )

    ckpt = tmp_path / "ckpt"
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        SPARK_GRAFT_CPUS="4",
        PYSPARK_SUBMIT_ARGS=(
            f"--conf spark.checkpoint.dir={ckpt} pyspark-shell"
        ),
    )
    out = subprocess.run(
        [sys.executable, "-m", "mr_lda_spark.cli",
         "train", "--input", "./out", "--output", "./model",
         "--topic", "2", "--iteration", "3", "--gamma-iteration", "5",
         "--corpus-checkpoint", "reliable"],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["iterations"] == 3
    # reliable cuts really went to the conf'd dir, and the sweeper
    # left only the live generation (corpus base + final gamma)
    rdd_dirs = glob.glob(str(ckpt / "**" / "rdd-*"), recursive=True)
    assert len(rdd_dirs) == 2, rdd_dirs
