"""Explicit StructTypes for every engine table (SURVEY.md §1.1–1.3).

The reference's data model is hand-serialized Hadoop Writables
(`Document.java:18-37`, `ParseCorpus.java:475-490`); here every table is
a columnar Parquet-backed DataFrame with an explicit schema.  All types
fit native Spark SQL — no UDTs (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Encoded corpus, tall form: one row per (doc, term) with its count.
# Mirrors the sparse bag-of-words `HMapII content` of Document.java:18-37.
CORPUS_TALL = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term_id", T.IntegerType(), False),
        T.StructField("term_count", T.IntegerType(), False),
    ]
)

# Encoded corpus, document form: arrays aligned by position (term_ids
# sorted ascending), plus the carried per-doc topic posterior gamma —
# the Spark equivalent of the gamma embedded in the Document record
# (DocumentMapper.java:341-346).
CORPUS_DOC = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term_ids", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("term_counts", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("gamma", T.ArrayType(T.DoubleType(), False), True),
    ]
)

# Term dictionary: ids 1..V by df desc, tf desc (ParseCorpus.java:475-490;
# index 0 reserved per README.md:61).
TERM_DICT = T.StructType(
    [
        T.StructField("term_id", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
    ]
)

# Title index (ParseCorpus.java:698-710).
TITLE_INDEX = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
    ]
)

# Topic–word matrix, tall/skinny: value is E[log beta_{k,v}] (already
# normalizer-subtracted, unlike the reference which stores digamma
# pieces separately — TermReducer.java:173,195,232-235).
BETA = T.StructType(
    [
        T.StructField("topic", T.IntegerType(), False),
        T.StructField("term_id", T.IntegerType(), False),
        T.StructField("log_beta", T.DoubleType(), False),
    ]
)

# Per-document topic posterior (gamma-<iter> output,
# VariationalInference.java:358-379).
GAMMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("gamma", T.ArrayType(T.DoubleType(), False), False),
    ]
)

# Informed prior eta: per-topic seed words (InformedPrior.java:126-127).
ETA = T.StructType(
    [
        T.StructField("topic", T.IntegerType(), False),
        T.StructField("term_id", T.IntegerType(), False),
    ]
)

# Polylingual corpus: one row per (doc, lang) — SURVEY.md §1.1 maps the
# reference's HMapII[] (polylda/Document.java:22-37) to a lang column.
POLY_CORPUS_TALL = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("lang", T.IntegerType(), False),
        T.StructField("term_id", T.IntegerType(), False),
        T.StructField("term_count", T.IntegerType(), False),
    ]
)
