#!/usr/bin/env python3
"""r15 VERDICT #7 audit: dump the LAZY internal plans for the eager
2-5 s dedup/similarity band rows (their declared plans are post-cut
Scan ExistingRDD stubs), so exchange schemas can be checked for
synthesized payloads / full text crossing a shuffle.

Writes plans/r15/<name>_lazyaudit.txt and prints an Exchange-schema
summary per plan.
"""
from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def dump(name, df, out_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    path = os.path.join(out_dir, f"{name}_lazyaudit.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"== {name}: {path}")
    # Exchange summary: the Arguments line of every Exchange node.
    ids = re.findall(r"\((\d+)\) Exchange", txt)
    for i in ids:
        m = re.search(
            rf"\({i}\) Exchange\nInput \[(\d+)\]: (\[[^\n]*\])", txt
        )
        if m:
            print(f"   Exchange({i}) width={m.group(1)}: {m.group(2)[:200]}")
    print(f"   total Exchange nodes: {len(ids)}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mr_lda_spark.operators import dedup, similarity
    from mr_lda_spark.queries_registry import (
        JACCARD_MAX_SHINGLE_DF,
        SIM_K,
        SIM_QUERIES,
        _t,
    )
    from mr_lda_spark.session import get_spark

    spark = get_spark("r15-band-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    docs = _t(spark, sf_dir, "documents")

    dump(
        "dedup_simhash_pairs",
        dedup.simhash_near_dupes(docs, max_hamming=6, materialize=False),
        out_dir,
    )
    split = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    dump(
        "dedup_incremental_pairs",
        dedup.jaccard_near_dupes_exact(
            docs,
            threshold=0.2,
            max_shingle_df=JACCARD_MAX_SHINGLE_DF,
            new_from=split,
        ),
        out_dir,
    )
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < SIM_QUERIES)
    dump(
        "similarity_ivfpq_topk",
        similarity.ivfpq_topk(
            emb,
            queries,
            k=SIM_K,
            n_centroids=16,
            n_probe=4,
            n_subspaces=16,
            n_codes=32,
        ),
        out_dir,
    )


if __name__ == "__main__":
    main()
