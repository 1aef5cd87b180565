from mr_lda_spark.sources.corpus import (  # noqa: F401
    read_raw_corpus,
    read_raw_corpus_poly,
    write_table,
)
