"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (SURVEY.md §7.2 slice) at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for each (same column names).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver runs us from.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mr_lda_spark import queries_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse the sf0.001 document corpus and return the term
    dictionary's top-20 terms (the SURVEY.md §7.2 end-to-end slice:
    scan → tokenize → agg → df-filter → ranked dictionary → top-k)."""
    return queries_registry.flagship(spark, "/root/testdata/sf0.001")


def _coverage_order(names):
    """Order query names so the ones with no prior driver CORRECTNESS
    row come first.  The driver samples a fixed number of queries per
    round in `queries()` order; with >50 registered, sampling in
    registration order would leave a stable tail never exercised.
    Stable sort: relative order within the seen/unseen groups is
    preserved, so previously-checked queries still cycle through in
    their original order after the unchecked ones."""
    import glob
    import json

    seen: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                seen |= set(json.load(fh))
        except Exception:
            continue
    return sorted(names, key=lambda n: n in seen)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = queries_registry.QUERIES
    return {name: q[name] for name in _coverage_order(q)}


def oracle_sql() -> dict[str, str]:
    return queries_registry.ORACLES
