"""Streaming dedup ≡ batch dedup; exactly-once parquet sink."""

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
