"""mr_lda_spark — a from-scratch, PySpark-native analytics engine with the
query and data-processing capabilities of lintool/Mr.LDA (WWW 2012),
re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``schemas``    : explicit StructTypes for every table (SURVEY.md §1)
- ``sources``    : readers/writers (raw text corpus, parquet tables)
- ``operators``  : relational operators — parse/dictionary/encode pipeline,
  display (top-k), dedup, similarity search, text analysis, multimodal
- ``functions``  : scalar/numeric kernels — log-space math, Dirichlet
  special functions, Newton–Raphson alpha updates
- ``plans``      : multi-stage drivers — the variational-EM LDA loop
  (native path) and the MLlib-backed path
- ``streaming``  : Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
