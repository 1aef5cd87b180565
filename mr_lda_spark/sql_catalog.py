"""SQL-first surface: register the engine's tables as temp views so
users can drive everything through ``spark.sql`` (the declarative path
Catalyst optimizes end-to-end).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from mr_lda_spark import TABLES
from mr_lda_spark.session import read_table


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "") -> list:
    """Create (or replace) one temp view per testdata table.  Returns
    the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        read_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str):
    """Convenience: register views then run one ANSI-SQL query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
