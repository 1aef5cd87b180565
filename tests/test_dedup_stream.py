"""Streaming dedup ≡ batch dedup; exactly-once parquet sink."""
import pytest

from pyspark.sql import functions as F

from mr_lda_spark.operators import dedup
from mr_lda_spark.session import read_table
from mr_lda_spark.streaming import dedup_stream as ds

SF = "/root/testdata/sf0.001"


def test_stream_dedup_matches_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = ds.dedup_stream(ds.read_documents_stream(spark, SF))
    ds.run_to_parquet(stream, out, ckpt)

    result = spark.read.parquet(out)
    batch = dedup.exact_duplicates(read_table(spark, SF, "documents"))
    assert result.count() == batch.count()
    got = sorted(r["text_hash"] for r in result.select("text_hash").collect())
    want = sorted(r["text_hash"] for r in batch.select("text_hash").collect())
    assert got == want

    # Exactly-once: re-running against the same checkpoint+sink with no
    # new input must not duplicate rows.
    stream2 = ds.dedup_stream(ds.read_documents_stream(spark, SF))
    ds.run_to_parquet(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == batch.count()


@pytest.mark.slow
def test_near_dedup_stream_two_batches(spark, tmp_path):
    """Streaming near-dup: batch 2's near-copy of a batch-1 doc is
    rejected against HISTORY (cross-batch LSH index probe), its fresh
    doc admitted, and a within-batch dup pair collapses to its
    canonical id.  A replayed batch_id is a no-op."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = spark.createDataFrame(
        [(1, base + " one"), (2, "totally different text about rivers and stones flow")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (10, base + " two"),       # near-dup of doc 1 (history)
            (11, "fresh unique content words nothing shared with others here"),
            (12, "fresh unique content words nothing shared with others here"),
            # ^ 11/12 exact dup within batch -> canonical 11 survives
        ],
        "doc_id long, text string",
    )
    sink = ds.NearDedupSink(str(tmp_path / "near"), threshold=0.5)
    sink(b1, 0)
    sink(b2, 1)
    got = sorted(
        r["doc_id"] for r in sink.survivors(spark).select("doc_id").collect()
    )
    assert got == [1, 2, 11]
    # replay absorption
    sink(b2, 1)
    assert sink.replays_skipped == 1
    assert sorted(
        r["doc_id"] for r in sink.survivors(spark).select("doc_id").collect()
    ) == [1, 2, 11]


@pytest.mark.slow
def test_near_dedup_stream_empty_batch_does_not_poison_sink(spark, tmp_path):
    """An empty micro-batch must not break the sink: no marker-with-no-
    data (which used to make every later survivors()/history read raise
    PATH_NOT_FOUND), and subsequent non-empty batches still dedup
    against the pre-gap history (ADVICE r4)."""
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota one")],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    b3 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta iota two"),
            (11, "fresh unique content words nothing shared with others"),
        ],
        "doc_id long, text string",
    )
    sink = ds.NearDedupSink(str(tmp_path / "near"), threshold=0.5)
    sink(b1, 0)
    sink(empty, 1)
    # survivors() works right after the empty batch…
    assert sorted(
        r["doc_id"] for r in sink.survivors(spark).select("doc_id").collect()
    ) == [1]
    # …and the next batch still probes history across the gap.
    sink(b3, 2)
    assert sorted(
        r["doc_id"] for r in sink.survivors(spark).select("doc_id").collect()
    ) == [1, 11]
    # Replaying the empty batch is a harmless no-op (no marker written).
    sink(empty, 1)
    assert sorted(
        r["doc_id"] for r in sink.survivors(spark).select("doc_id").collect()
    ) == [1, 11]


@pytest.mark.slow
def test_near_dedup_history_hot_bucket_capped(spark, tmp_path):
    """A degenerate band_key shared by many history docs must not fan
    out quadratically: with max_bucket_size below the bucket's size the
    history probe skips it, so the new near-copy is ADMITTED (recall
    trade, bounded work — same contract as lsh_candidate_pairs)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    hist = spark.createDataFrame(
        [(i, f"{shared} tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, f"{shared} tail999")], "doc_id long, text string"
    )
    # Uncapped: the near-copy is rejected against history.
    strict = ds.NearDedupSink(str(tmp_path / "strict"), threshold=0.3)
    strict(spark.createDataFrame([(0, f"{shared} tail0")], "doc_id long, text string"), 0)
    strict(probe, 1)
    assert sorted(
        r["doc_id"] for r in strict.survivors(spark).select("doc_id").collect()
    ) == [0]
    # Capped below the hot bucket's size: the probe skips the bucket.
    capped = ds.NearDedupSink(
        str(tmp_path / "capped"), threshold=0.3, max_bucket_size=1
    )
    capped(hist, 0)
    n_hist = capped.survivors(spark).count()
    capped(probe, 1)
    got = sorted(
        r["doc_id"] for r in capped.survivors(spark).select("doc_id").collect()
    )
    assert 100 in got and len(got) == n_hist + 1


@pytest.mark.slow
def test_stream_drains_leave_no_sink_tables(spark):
    """r10 self-review regression: every memory-sink drain helper
    (HLL / CMS / AMS / run_stream_to_batch) must detach from its
    uuid-named sink table (localCheckpoint + dropTempView), else each
    invocation leaks one in-memory table for the session lifetime."""
    import uuid

    from pyspark.sql import functions as F

    from mr_lda_spark.operators.hll import hll_registers
    from mr_lda_spark.streaming import events as se
    from mr_lda_spark.streaming.hll_stream import (
        ams_cells_from_stream,
        cms_table_from_stream,
        hll_estimate_stream,
    )

    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    sf = "/root/testdata/sf0.001"
    keys = ds.read_documents_stream(spark, sf).select(
        F.md5("text").alias("shingle")
    )
    hll_estimate_stream(
        spark,
        hll_registers(keys, "shingle", []),
        [],
        f"t_hll_{uuid.uuid4().hex[:6]}",
    ).collect()
    cms_table_from_stream(
        spark, keys, "shingle", f"t_cms_{uuid.uuid4().hex[:6]}",
        width=1024, depth=3,
    )
    ams_cells_from_stream(
        spark, keys, "shingle", f"t_ams_{uuid.uuid4().hex[:6]}",
        width=1024, depth=3,
    ).collect()
    se.run_stream_to_batch(
        ds.read_documents_stream(spark, sf).groupBy("lang").count(),
        f"t_evt_{uuid.uuid4().hex[:6]}",
    ).collect()
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert after - before == set(), f"leaked sink tables: {after - before}"
