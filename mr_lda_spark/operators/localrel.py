"""Tiny driver-side relations WITHOUT the Python-RDD tax.

``spark.createDataFrame(local_rows)`` parallelizes the rows into a
pickled RDD with ``defaultParallelism`` slices — on ``local[32]`` that
is a 32-task job PER ACTION over the final plan, where every task
round-trips a Python worker to unpickle its (usually empty) slice.
Measured on this host (probe, r14 opt round): ~4 s aggregate task
time cold and ~0.45 s wall PER ACTION warm for a 20-row relation —
pure Python-worker wait (run ≫ cpu, zero I/O).  Queries that embed a
handful of scalar side-relations (quantile selection states, rank
offsets, audit rows, bloom bitsets) pay it on every evaluation.

``local_df`` builds the same relation as a LITERAL JVM plan instead:
one ``inline(array(named_struct(...), ...))`` expression over a
one-row range, rendered as a SINGLE SQL string and parsed JVM-side
(one py4j call — a per-cell ``F.lit`` chain costs ~1.5 ms of py4j
round-trip PER CELL, measured 26 s to construct an 18k-cell
relation).  Actions evaluate entirely inside the JVM: whole-stage
codegen, no Python workers, ~0.05 s warm per action vs ~0.45 s for
the 32-slice RDD.  Exactness:

- floats travel as ``CAST('<repr>' AS DOUBLE)`` — repr() is the
  shortest round-trip decimal and string→double cast is correctly
  rounded, so the bits are identical (verified incl. NaN/±Inf/-0.0/
  5e-324/1e300);
- strings travel base64 (``CAST(UNBASE64('..') AS STRING)``) — no
  escaping rules to get wrong;
- every cell is cast to the DDL schema's exact field type, and each
  output column is wrapped so its nullability matches
  ``createDataFrame``'s (always nullable) — the produced schema is
  indistinguishable from the old path's.

Scope guard: SQL parse time grows with expression size (~3 s at 500
KB), so relations beyond ``max_literal_cells`` — or with cell types
the renderer does not cover — fall back to a 1-slice
``parallelize`` (one warm Python task per action instead of 32).
"""

from __future__ import annotations

import base64
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["local_df"]

_INT64_MIN, _INT64_MAX = -(1 << 63), (1 << 63) - 1


class _Unrenderable(Exception):
    pass


def _render(v) -> str:
    """SQL literal text for one Python cell value (untyped; the caller
    wraps the result in a CAST to the schema field's exact type)."""
    if v is None:
        return "NULL"
    if type(v).__module__ == "numpy":  # np scalars: exact Python value
        v = v.item()
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        if not (_INT64_MIN <= v <= _INT64_MAX):
            raise _Unrenderable("int out of BIGINT range")
        return str(int(v))
    if isinstance(v, float):
        # normalize subclasses (np.float64 reprs as 'np.float64(x)');
        # cast('...' as double) is correctly rounded and accepts
        # 'nan'/'inf'/'-inf', so repr round-trips bit-exactly.
        return f"CAST('{float(v)!r}' AS DOUBLE)"
    if isinstance(v, str):
        b64 = base64.b64encode(v.encode("utf-8")).decode("ascii")
        return f"CAST(UNBASE64('{b64}') AS STRING)"
    if isinstance(v, (bytes, bytearray)):
        b64 = base64.b64encode(bytes(v)).decode("ascii")
        return f"UNBASE64('{b64}')"
    if isinstance(v, (list, tuple)):
        if not v:
            return "ARRAY()"
        return "ARRAY(" + ",".join(_render(x) for x in v) + ")"
    raise _Unrenderable(type(v).__name__)


def _parse_schema(spark: SparkSession, schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    # Public-API DDL parse (StructType.fromDDL is public since 3.5).
    return StructType.fromDDL(schema)


def local_df(
    spark: SparkSession,
    rows,
    schema,
    max_literal_cells: int = 4_000,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for TINY relations,
    built as a pure-JVM literal plan (no Python-RDD job per action).

    ``rows``: sequence of tuples/lists (one per output row);
    ``schema``: DDL string or StructType.  Cell values must be plain
    Python scalars / str / bytes / lists / None — exactly what the
    call sites pass to ``createDataFrame`` today; anything else (or a
    relation past the size rail) falls back to a 1-slice parallelize.
    """
    st = _parse_schema(spark, schema)
    rows = list(rows)
    one = spark.range(0, 1, 1, 1)  # single JVM partition, no Python
    if not rows:
        return one.select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in st.fields
            ]
        ).where(F.lit(False))
    n_cells = sum(
        sum(len(v) if isinstance(v, (list, tuple)) else 1 for v in r)
        if len(st.fields) > 0
        else 1
        for r in rows
    )

    def _fallback() -> DataFrame:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), st
        )

    if n_cells > max_literal_cells:
        return _fallback()
    try:
        field_sql = [
            (f.name, f.dataType.simpleString()) for f in st.fields
        ]
        for name, _ in field_sql:
            if "'" in name or "\\" in name:
                raise _Unrenderable("field name needs escaping")
        structs = [
            "named_struct("
            + ",".join(
                f"'{name}',CAST({_render(v)} AS {typ})"
                for v, (name, typ) in zip(r, field_sql)
            )
            + ")"
            for r in rows
        ]
    except _Unrenderable:
        # exotic cell types: defer to createDataFrame's own
        # conversion rules rather than guessing at them
        return spark.createDataFrame(rows, st)
    gen = "inline(array(" + ",".join(structs) + "))"
    # Unique guard column name: a schema field named "id" must not
    # collide with the range's own column.
    guard = "__localrel_id"
    while any(f.name == guard for f in st.fields):
        guard += "_"
    exploded = one.select(F.col("id").alias(guard), F.expr(gen))
    # Match createDataFrame's all-nullable schema exactly: a bare
    # literal column is non-nullable and the difference would leak
    # into unionByName partners and registered output schemas.  The
    # when-condition must be NON-FOLDABLE (the range id) — Spark 4
    # proves `when(lit(True), x)` non-nullable and folds the wrapper
    # right back out of the schema.
    return exploded.select(
        *[
            F.when(F.col(guard) >= 0, F.col(f.name)).alias(f.name)
            for f in st.fields
        ]
    )
