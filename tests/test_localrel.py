"""local_df must be indistinguishable from spark.createDataFrame for
the tiny-relation shapes the engine embeds in query plans — same
schema (types AND nullability), same values bit-for-bit — while
building a pure-JVM literal plan (its point: no Python-RDD job per
action).  See operators/localrel.py for the measured motivation."""

import math

import pytest

from mr_lda_spark.operators.localrel import local_df


def _same_cell(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(
            _same_cell(x, y) for x, y in zip(a, b)
        )
    return a == b


def _assert_matches(spark, rows, schema, **kw):
    old = spark.createDataFrame(rows, schema)
    new = local_df(spark, rows, schema, **kw)
    assert new.schema == old.schema
    ro = sorted([tuple(r) for r in old.collect()], key=repr)
    rn = sorted([tuple(r) for r in new.collect()], key=repr)
    assert len(ro) == len(rn)
    for ta, tb in zip(ro, rn):
        for a, b in zip(ta, tb):
            assert _same_cell(a, b), (a, b)


def test_scalar_types_match(spark):
    rows = [
        ("plain", 1, 0.5),
        ("qu'ote\\back\tslash\nnl", None, float("nan")),
        ("héllo 日本語 𝔘", 3, float("inf")),
        (None, -2147483648, float("-inf")),
        ("", 2147483647, -0.0),
        ("x", 7, 5e-324),
        ("y", 8, 1e300),
        ("z", 9, math.pi),
    ]
    _assert_matches(spark, rows, "s string, k int, v double")


def test_bigint_bounds_and_bool(spark):
    rows = [(-(1 << 63), True), ((1 << 63) - 1, False), (0, None)]
    _assert_matches(spark, rows, "k bigint, b boolean")


def test_array_cells(spark):
    rows = [([1, 2, 3],), ([],), ([9223372036854775807],)]
    _assert_matches(spark, rows, "w array<bigint>")
    rows2 = [([0.1, float("nan")],), ([1e300],)]
    _assert_matches(spark, rows2, "w array<double>")


def test_empty_rows(spark):
    _assert_matches(spark, [], "a string, b double")


def test_fallback_over_cell_cap_matches(spark):
    rows = [(i, [float(i) + j for j in range(8)]) for i in range(50)]
    # cap forces the 1-slice parallelize fallback; results identical
    _assert_matches(
        spark, rows, "k int, v array<double>", max_literal_cells=10
    )


def test_fallback_unrenderable_type(spark):
    import numpy as np

    # np.int64 is not a Python int: the literal renderer must refuse
    # it and the fallback must still produce correct rows.
    rows = [(np.int64(5),), (np.int64(-7),)]
    new = local_df(spark, rows, "k bigint")
    assert sorted(r["k"] for r in new.collect()) == [-7, 5]


def test_numpy_float_subclass_is_exact(spark):
    import numpy as np

    # np.float64 IS a float subclass; repr differs (np.float64(0.1))
    # so the renderer must normalize before repr or silently corrupt.
    rows = [(np.float64(0.1),), (np.float64(1e300),)]
    new = local_df(spark, rows, "v double")
    assert sorted(r["v"] for r in new.collect()) == [0.1, 1e300]


def test_field_named_id_guard(spark):
    _assert_matches(spark, [(1, "a"), (2, "b")], "id bigint, s string")


def test_no_python_eval_in_plan(spark):
    new = local_df(spark, [("a", 1.5)], "s string, v double")
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Scan ExistingRDD" not in plan
    assert "Range" in plan
