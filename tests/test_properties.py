"""Property-based tests (hypothesis) for the numeric/ranking kernels."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mr_lda_spark.functions.special import digamma, gammaln, trigamma

POS = st.floats(min_value=0.01, max_value=1e6, allow_nan=False)


@given(POS)
@settings(max_examples=200, deadline=None)
def test_digamma_recurrence(x):
    # psi(x+1) = psi(x) + 1/x
    assert digamma(x + 1.0) == pytest.approx(digamma(x) + 1.0 / x, rel=1e-9, abs=1e-9)


@given(POS)
@settings(max_examples=200, deadline=None)
def test_trigamma_recurrence(x):
    assert trigamma(x + 1.0) == pytest.approx(
        trigamma(x) - 1.0 / (x * x), rel=1e-8, abs=1e-10
    )


@given(POS)
@settings(max_examples=200, deadline=None)
def test_gammaln_recurrence(x):
    # lnGamma(x+1) = lnGamma(x) + ln(x)
    assert gammaln(x + 1.0) == pytest.approx(
        gammaln(x) + math.log(x), rel=1e-9, abs=1e-8
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.floats(min_value=-700, max_value=700, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_logsumexp_agg_matches_numpy(spark, rows):
    from mr_lda_spark.functions.logmath import logsumexp_agg

    df = spark.createDataFrame(rows, schema="k int, v double")
    got = {
        r["k"]: r["lse"]
        for r in logsumexp_agg(df, ["k"], "v", "lse").collect()
    }
    groups = {}
    for k, v in rows:
        groups.setdefault(k, []).append(v)
    for k, vs in groups.items():
        m = max(vs)
        want = m + math.log(sum(math.exp(v - m) for v in vs))
        assert got[k] == pytest.approx(want, rel=1e-12, abs=1e-12), (k, vs)


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
        min_size=1,
        max_size=80,
        unique=True,
    )
)
@settings(max_examples=8, deadline=None)
def test_assign_dense_ids_matches_python_sort(spark, rows):
    from pyspark.sql import functions as F

    from mr_lda_spark.operators.parse import assign_dense_ids

    df = spark.createDataFrame(rows, schema="a int, b int")
    order = [F.col("a").desc(), F.col("b").asc()]
    out = assign_dense_ids(df, order, "rid", scalable=True).collect()
    want = sorted(rows, key=lambda t: (-t[0], t[1]))
    got = sorted(((r["a"], r["b"]), r["rid"]) for r in out)
    expect = sorted(((a, b), i + 1) for i, (a, b) in enumerate(want))
    assert got == expect
