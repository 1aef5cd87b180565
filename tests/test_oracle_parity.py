"""Rehearsal of the driver's t2 correctness gate: every registered
query is run on Spark AND DuckDB at sf0.01 and compared
order-insensitively on row count, column names, exact values, AND
driver-visible column TYPES (the r9 addition — see tools/parity.py:
the driver's hash is typed, so DuckDB HUGEINT-vs-Spark BIGINT drift
must go red locally even when every value matches).
"""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark import TABLES, queries_registry
from tools import parity

# Driver-window gate: the per-query oracle replay duplicates the
# driver's own CORRECTNESS sample and the builder-side full sweep
# (tools/parity_sweep.py), so the whole module is builder-side `slow`.
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    return parity.duck_connect(SF_DIR, TABLES)


@pytest.mark.parametrize("name", sorted(queries_registry.ORACLES))
def test_query_matches_oracle(spark, duck, name):
    fn = queries_registry.QUERIES[name]
    sdf = fn(spark, SF_DIR)
    res = parity.compare(sdf, duck, queries_registry.ORACLES[name])
    assert res["ok"], f"{name}: {res['why']}"


def test_typed_comparator_catches_hugeint_oracle(duck):
    """Red-then-green proof for the r8 escape (VERDICT r8 "Next round"
    #2b): an oracle whose sum is left uncast types as HUGEINT in
    DuckDB — the driver's typed hash would diverge (float64 vs int64)
    even though every VALUE matches.  The typed layer must flag the
    uncast oracle (red) and pass the registry-convention CAST (green),
    with no Spark session in the loop (the schema is the contract)."""
    from pyspark.sql.types import LongType, StructField, StructType

    spark_schema = StructType([
        StructField("user_id", LongType()),
        StructField("cents", LongType()),
    ])
    bad = ("SELECT user_id, sum(CAST(round(value * 100) AS BIGINT))"
           " AS cents FROM events GROUP BY 1")
    good = ("SELECT user_id, CAST(sum(CAST(round(value * 100) AS"
            " BIGINT)) AS BIGINT) AS cents FROM events GROUP BY 1")
    red = parity.kind_mismatches(spark_schema, parity.duck_types(duck, bad))
    assert red == [("cents", "int", "float")]
    assert parity.kind_mismatches(
        spark_schema, parity.duck_types(duck, good)) == []


def test_typed_comparator_catches_bool_int_drift(duck):
    """Python `True == 1`, so the value layer is blind to a boolean
    column materializing as int on one side; the typed layer isn't."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType([StructField("flag", BooleanType())])
    assert parity.kind_mismatches(
        schema, parity.duck_types(duck, "SELECT 1 AS flag")
    ) == [("flag", "bool", "int")]
    assert parity.kind_mismatches(
        schema, parity.duck_types(duck, "SELECT true AS flag")) == []


def test_decimal_pandas_dtypes_diverge_between_engines(spark, duck):
    """Empirical proof of the r11 hash-red root cause, pinned as a
    regression test: the SAME exact value in a decimal(38,0) column
    materializes to pandas as object-dtype decimal.Decimal on Spark's
    driver path but float64 on DuckDB's — so the driver's typed hash
    diverges on every row even when values are identical.  The typed
    layer must therefore flag spark-decimal against duck-DECIMAL
    (they were wrongly equated as kind "float" before r12)."""
    from decimal import Decimal

    sdf = spark.range(1).select(
        F.lit(29).cast("decimal(38,0)").alias("s")
    )
    spd = sdf.toPandas()
    dpd = duck.execute("SELECT CAST(29 AS DECIMAL(38,0)) AS s").df()
    assert spd["s"].dtype == object
    assert isinstance(spd["s"].iloc[0], Decimal)
    assert str(dpd["s"].dtype) == "float64"
    # the kind model now sees the divergence the hash sees
    assert parity.spark_kind("decimal(38,0)") == "decimal"
    assert parity.duck_kind("DECIMAL(38,0)") == "float"
    mism = parity.kind_mismatches(
        sdf.schema,
        parity.duck_types(duck, "SELECT CAST(29 AS DECIMAL(38,0)) AS s"),
    )
    assert mism == [("s", "decimal", "float")]


def test_every_oracle_sql_is_decimal_free(duck):
    """The parity standing rule, enforced by construction (sibling of
    the HUGEINT sweep): exact wide arithmetic belongs INSIDE the
    plan; no oracle may DESCRIBE to a DECIMAL output column, because
    the paired Spark query would have to ship a DecimalType column to
    schema-match — and Spark decimal can never driver-hash-match
    DuckDB's float64 materialization (the 4 hash-red rows of r11)."""
    offenders = {}
    for name, sql in queries_registry.ORACLES.items():
        dec = [c for c, t in parity.duck_types(duck, sql).items()
               if t.upper().startswith("DECIMAL")]
        if dec:
            offenders[name] = dec
    assert not offenders, f"decimal-output oracles: {offenders}"


def test_every_oracle_sql_is_hugeint_free(duck):
    """Enforce the registry's integer-exact-oracle convention by
    construction: no oracle may DESCRIBE to a HUGEINT column (DuckDB's
    sum(int) widening) — the driver's pandas path turns it float64.
    This turns the r8 convention into a test, independent of whether
    the paired Spark query happens to agree."""
    offenders = {}
    for name, sql in queries_registry.ORACLES.items():
        huge = [c for c, t in parity.duck_types(duck, sql).items()
                if t.upper() in ("HUGEINT", "UHUGEINT")]
        if huge:
            offenders[name] = huge
    assert not offenders, f"uncast sum() oracles: {offenders}"


def test_every_query_has_rows(spark):
    """Smoke: every registered query returns a stable schema and >=0
    rows at sf0.001 (driver t1 analogue)."""
    for name, fn in queries_registry.QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()
