"""Rehearsal of the driver's t2 correctness gate: every registered
query is run on Spark AND DuckDB at sf0.01 and compared
order-insensitively on row count, column names, and exact values.
"""

import math

import duckdb
import pytest

from mr_lda_spark import TABLES, queries_registry

SF_DIR = "/root/testdata/sf0.01"


def _duck_run(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # Engines rounded already; kill -0.0 / repr noise only.
                v = 0.0 if v == 0 else round(v, 10)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(queries_registry.ORACLES))
def test_query_matches_oracle(spark, name):
    fn = queries_registry.QUERIES[name]
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _duck_run(queries_registry.ORACLES[name])

    ns_cols, ns_rows = _normalize(s_cols, s_rows)
    nd_cols, nd_rows = _normalize(d_cols, d_rows)

    assert ns_cols == nd_cols, f"{name}: column mismatch {ns_cols} vs {nd_cols}"
    assert len(ns_rows) == len(nd_rows), (
        f"{name}: row count {len(ns_rows)} vs {len(nd_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(ns_rows, nd_rows) if not _rows_eq(a, b)
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def _rows_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=0, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True


def test_every_query_has_rows(spark):
    """Smoke: every registered query returns a stable schema and >=0
    rows at sf0.001 (driver t1 analogue)."""
    for name, fn in queries_registry.QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
        df.limit(5).collect()
