"""Shared Spark-vs-DuckDB oracle comparator — the ONE definition used
by both the pytest parity gate (``tests/test_oracle_parity.py``) and
the sf0.1 sweep (``tools/parity_sweep.py``).

Two layers, matching how the driver's correctness gate can diverge:

1. **Values** (`rows_equal`): order-insensitive exact comparison,
   floats at 1e-9 — unchanged since r2; all 161 oracle rows pass it.
2. **Driver-faithful types** (`kind_mismatches`): the driver hashes
   TYPED values materialized through Arrow/pandas, where DuckDB's
   ``sum(BIGINT) -> HUGEINT`` surfaces as float64 while Spark returns
   BIGINT — so ``15`` hashes differently from ``15.0`` even though a
   value comparison passes.  That exact gap shipped the only two red
   driver rows of round 8 (VERDICT r8 "What's wrong" #1:
   ``events_rolling_24h_spend`` / ``events_hourly_gapfill``).  This
   layer compares each column's *driver-visible numeric kind* —
   DuckDB's ``DESCRIBE`` type (no execution) vs the Spark schema —
   and fails on int-vs-float/bool drift that layer 1 is blind to
   (Python ``15 == 15.0`` and ``True == 1``).

Kinds are deliberately coarse: int widths never drift the driver hash
(both engines materialize int64), and DuckDB DECIMAL/HUGEINT surface
as float64 in pandas, so they normalize to ``float``.  Non-numeric,
non-bool columns ("other": timestamps, dates, arrays, structs) are
left to the value layer — their Python representations don't have a
silent-equality trap.

STANDING RULE (the r11 decimal lesson — 4 driver-hash-red rows):
Spark's pandas materialization of DecimalType is ``object`` dtype
holding ``decimal.Decimal`` instances, while DuckDB's DECIMAL lands
``float64`` — so the two engines NEVER hash-agree on a decimal output
column even when every value is identical.  The convention is
therefore: exact wide arithmetic (decimal(38,0) / HUGEINT) INSIDE the
plan, driver-stable kinds at the output boundary — cast final decimal
columns to BIGINT where the value bound fits int64 (document the
headroom), or to DOUBLE on BOTH sides where a >2^53 bound must
survive.  ``spark_kind`` maps decimal to its own enforced kind
(``"decimal"``) precisely so any future registered query shipping a
raw decimal output fails the typed sweep the way it would fail the
driver; ``tests/test_oracle_parity.py`` asserts the dtype divergence
empirically and sweeps the registry for decimal outputs.
"""

from __future__ import annotations

import math

import duckdb

# duck DESCRIBE column_type -> driver-visible kind
_DUCK_KIND = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int",
    # HUGEINT has no Arrow/pandas integer mapping: it lands float64
    # (pandas) / decimal128 (arrow) — driver sees float.
    "HUGEINT": "float", "UHUGEINT": "float",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "float",
    "BOOLEAN": "bool", "VARCHAR": "str",
}

# spark simpleString -> driver-visible kind
_SPARK_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "boolean": "bool", "string": "str",
}

_ENFORCED = {"int", "float", "bool", "decimal"}  # fail on drift


def duck_kind(column_type: str) -> str:
    t = column_type.upper()
    if t.startswith("DECIMAL"):
        return "float"  # pandas materializes DECIMAL as float64
    return _DUCK_KIND.get(t, "other")


def spark_kind(simple_string: str) -> str:
    s = simple_string.lower()
    if s.startswith("decimal"):
        # NOT "float": Spark's pandas path materializes DecimalType
        # as object-dtype decimal.Decimal (unlike DuckDB's float64),
        # so a Spark decimal output can never driver-hash-match ANY
        # DuckDB column — give it its own enforced kind.
        return "decimal"
    return _SPARK_KIND.get(s, "other")


def duck_connect(sf_dir: str, tables) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def duck_types(con, sql: str) -> dict[str, str]:
    """Column name -> DuckDB type for `sql`, WITHOUT executing it
    (DESCRIBE binds and type-checks only)."""
    return {
        r[0]: r[1] for r in con.execute("DESCRIBE " + sql).fetchall()
    }


def kind_mismatches(spark_schema, duck_type_map) -> list[tuple]:
    """Driver-faithful typed check.  Returns [(col, spark_kind,
    duck_kind), ...] for every column whose driver-visible kind
    drifts between engines — empty means the driver's typed hash
    cannot diverge on representation for any enforced column.

    `spark_schema` is a pyspark StructType; `duck_type_map` is
    :func:`duck_types` output.  Columns present on only one side are
    the column-name layer's job, not this one's.
    """
    skinds = {
        f.name: spark_kind(f.dataType.simpleString())
        for f in spark_schema.fields
    }
    out = []
    for name, dtype in duck_type_map.items():
        dk = duck_kind(dtype)
        sk = skinds.get(name)
        if sk is None:
            continue
        if sk != dk and sk in _ENFORCED and dk in _ENFORCED:
            out.append((name, sk, dk))
    return out


def normalize(cols, rows):
    """Sort columns by name (the driver's convention) and rows by a
    stable key; round float repr noise only."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else round(v, 10)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=0, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True


def compare(spark_df, con, sql: str) -> dict:
    """Full comparison of one query: columns, typed kinds, row count,
    values.  Returns {"ok": bool, "why": str|None, "rows": int,
    "oracle_rows": int}.  Collects the Spark side — callers own the
    session/caching story."""
    dtypes = duck_types(con, sql)
    kinds_bad = kind_mismatches(spark_df.schema, dtypes)
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    ns_cols, ns_rows = normalize(s_cols, s_rows)
    nd_cols, nd_rows = normalize(d_cols, d_rows)
    res = {"ok": True, "why": None,
           "rows": len(ns_rows), "oracle_rows": len(nd_rows)}
    if kinds_bad:
        res.update(ok=False, why=f"typed-kind drift: {kinds_bad}")
        return res
    if ns_cols != nd_cols:
        res.update(ok=False, why=f"columns {ns_cols} vs {nd_cols}")
        return res
    if len(ns_rows) != len(nd_rows):
        res.update(ok=False,
                   why=f"rowcount {len(ns_rows)} vs {len(nd_rows)}")
        return res
    bad = [(x, y) for x, y in zip(ns_rows, nd_rows)
           if not rows_equal(x, y)]
    if bad:
        res.update(ok=False,
                   why=f"{len(bad)} mismatched rows; first {bad[:2]}")
    return res
