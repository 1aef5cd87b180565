"""MinHash signatures cross-validated against a pure-python
implementation of the exact same md5-derived hash family."""

import hashlib

from mr_lda_spark.operators import dedup


def _py_hash(seed: int, shingle: str) -> int:
    h = hashlib.md5(f"{seed}:{shingle}".encode()).hexdigest()
    return int(h[:15], 16)


def _py_shingles(text: str, n: int = 3):
    toks = [t for t in text.split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_minhash_signatures_match_python(spark):
    texts = [
        "a b c d e f g",
        "a b c d e f g",  # exact dup → identical signature
        "x y z w v u t s",
        "a b c q r s t u v",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in dedup.minhash_signatures(df, num_hashes=4).collect():
        got[(r["doc_id"], r["seed"])] = r["minhash"]

    for i, text in enumerate(texts):
        sh = _py_shingles(text)
        for seed in range(4):
            want = min(_py_hash(seed, s) for s in sh)
            assert got[(i, seed)] == want, (i, seed)

    # Exact duplicates share the full signature.
    assert all(got[(0, s)] == got[(1, s)] for s in range(4))


def test_partitioned_write(spark, documents, tmp_path):
    from pyspark.sql import functions as F

    from mr_lda_spark.sources.corpus import write_table

    out = str(tmp_path / "by_lang")
    write_table(documents, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == documents.count()
    # Partition pruning: a lang filter must prune at scan time.
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    assert pruned.count() == documents.filter(F.col("lang") == "en").count()
