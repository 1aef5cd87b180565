"""gram_moments: numpy-reference parity, drop semantics for bad rows,
covariance derivability, and plan shape."""

import pytest

import numpy as np
from pyspark.sql import functions as F

from mr_lda_spark.operators.linalg import gram_moments


def _df(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v] if v is not None else None) for i, v in enumerate(rows)],
        f"vec_id long, embedding array<float>",
    )


def _expected(mat, scale=1_000_000):
    q = np.floor(np.asarray(mat, dtype=np.float64) * scale + 0.5).astype(
        np.int64
    )
    g = q.T @ q
    out = {(0, 0): q.shape[0]}
    for i in range(q.shape[1]):
        out[(i + 1, 0)] = int(q[:, i].sum())
        for j in range(i, q.shape[1]):
            out[(i + 1, j + 1)] = int(g[i, j])
    return out


def test_gram_matches_numpy_reference(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(37, 4)).astype(np.float32)
    got = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(_df(spark, mat.tolist()), dim=4).collect()
    }
    assert got == _expected(mat.astype(np.float64))


def test_gram_drops_null_and_ragged_vectors(spark):
    rows = [[1.0, 2.0, 3.0, 4.0], None, [1.0, 1.0], [0.5, 0.0, -0.5, 1.0]]
    got = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(_df(spark, rows), dim=4).collect()
    }
    # only the two well-formed rows count
    assert got[(0, 0)] == 2
    assert got == _expected([rows[0], rows[3]])


def test_gram_output_is_d_squared_shaped(spark):
    rng = np.random.default_rng(5)
    df = gram_moments(_df(spark, rng.normal(size=(50, 4)).tolist()), dim=4)
    # 10 upper-triangle + 4 first moments + 1 count
    assert df.count() == 4 * 5 // 2 + 4 + 1


def test_gram_covariance_derivable_and_exact(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 4))
    stats = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(_df(spark, mat.tolist()), dim=4).collect()
    }
    n = stats[(0, 0)]
    scale = 1_000_000
    # the stored column is float32 — quantize what Spark actually saw
    q = np.floor(mat.astype(np.float32).astype(np.float64) * scale + 0.5)
    for i in range(4):
        for j in range(i, 4):
            cov = (
                stats[(i + 1, j + 1)]
                - stats[(i + 1, 0)] * stats[(j + 1, 0)] / n
            ) / (n * scale**2)
            ref = np.cov(q[:, i], q[:, j], bias=True)[0, 1] / scale**2
            assert abs(cov - ref) < 1e-9


def test_gram_plan_partial_agg_no_cartesian(spark):
    rng = np.random.default_rng(9)
    df = gram_moments(_df(spark, rng.normal(size=(20, 4)).tolist()), dim=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the cross-batch sum must be map-side combined: a partial
    # HashAggregate below the exchange, the final one above it.
    assert plan.count("HashAggregate") >= 2


# ------------------------------------------------------------ pca_power


def test_pca_power_converges_on_gapped_spectrum(spark):
    """Planted dominant direction: data = strong signal along a fixed
    unit vector + weak isotropic noise (λ₁ ≫ λ₂), where 12 exact
    steps must align with numpy eigh's top eigenvector."""
    from mr_lda_spark.operators.linalg import pca_power

    rng = np.random.default_rng(13)
    d, n = 6, 400
    u = np.array([3.0, -1.0, 2.0, 0.5, -2.0, 1.0])
    u /= np.linalg.norm(u)
    mat = (
        np.outer(rng.normal(size=n) * 5.0, u)
        + rng.normal(size=(n, d)) * 0.1
    )
    got = {
        r["i"]: int(r["loading"])
        for r in pca_power(_df(spark, mat.tolist(), dim=d), dim=d).collect()
    }
    v = np.array([got[i] for i in range(1, d + 1)], dtype=np.float64)
    q = np.floor(mat.astype(np.float32).astype(np.float64) * 1e6 + 0.5)
    evals, evecs = np.linalg.eigh(np.cov(q.T, bias=True))
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.9999
    # loadings are max-abs normalized to ±1e6
    assert max(abs(x) for x in got.values()) == 1_000_000


def test_pca_power_zero_matrix_yields_zero_vector(spark):
    """Rank-0 input (all rows identical): M = n·S − s·sᵀ is exactly
    zero, the degenerate branch pins the zero vector — matching the
    SQL oracle's CASE, not an early break."""
    from mr_lda_spark.operators.linalg import pca_power

    rows = [[0.25, -0.5, 0.75, 1.0]] * 10
    got = {
        r["i"]: int(r["loading"])
        for r in pca_power(_df(spark, rows, dim=4), dim=4).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}


# ----------------------------------------------------- streaming twin


@pytest.mark.slow
def test_gram_stream_equals_batch_across_microbatches(spark, tmp_path):
    """Three parquet files + maxFilesPerTrigger=1 → three micro-
    batches; integer-exact partials must make the drained table
    bit-identical to the batch Gram over the union."""
    import uuid

    from mr_lda_spark.streaming.gram_stream import (
        EMB_SCHEMA,
        gram_moments_from_stream,
    )

    rng = np.random.default_rng(21)
    d = 4
    parts = [rng.normal(size=(30, d)).astype(np.float32) for _ in range(3)]
    base = 0
    for k, mat in enumerate(parts):
        df = spark.createDataFrame(
            [
                (base + i, [float(x) for x in row], 0)
                for i, row in enumerate(mat)
            ],
            "vec_id long, embedding array<float>, label int",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"part{k}")
        )
        base += len(mat)
    # one directory containing the three single-file tables
    import glob
    import shutil

    src = tmp_path / "stream_src"
    src.mkdir()
    for k in range(3):
        f = glob.glob(str(tmp_path / f"part{k}" / "*.parquet"))[0]
        shutil.copy(f, src / f"f{k}.parquet")

    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = gram_moments_from_stream(
        spark, stream, f"g_{uuid.uuid4().hex[:8]}", dim=d
    )
    batch = gram_moments(
        spark.read.schema(EMB_SCHEMA).parquet(str(src)), dim=d
    )
    g = sorted((r["i"], r["j"], str(r["s"])) for r in got.collect())
    b = sorted((r["i"], r["j"], str(r["s"])) for r in batch.collect())
    assert g == b
    assert len(g) == d * (d + 1) // 2 + d + 1


# --------------------------------------------------- correlation_pairs


def test_correlation_pairs_matches_numpy(spark):
    """corr over the QUANTIZED integers must equal np.corrcoef of the
    quantized matrix (the operator's contract is exactness over the
    quantized relation, not the float input)."""
    from mr_lda_spark.operators.linalg import correlation_pairs

    rng = np.random.default_rng(21)
    d, n = 5, 300
    base = rng.normal(size=(n, d))
    base[:, 1] = base[:, 0] * 0.8 + base[:, 1] * 0.2  # planted corr
    got = {
        (r["i"], r["j"]): r["corr"]
        for r in correlation_pairs(
            _df(spark, base.tolist(), dim=d), dim=d
        ).collect()
    }
    q = np.floor(base.astype(np.float32).astype(np.float64) * 1e6 + 0.5)
    ref = np.corrcoef(q.T)
    assert len(got) == d * (d - 1) // 2
    for (i, j), c in got.items():
        assert abs(c - ref[i - 1, j - 1]) < 1e-6
    assert abs(got[(1, 2)]) > 0.9  # the planted pair


def test_correlation_zero_variance_dimension_null(spark):
    """A constant dimension has zero variance — corr is NULL
    (undefined), not 0 (the profile.correlation_matrix convention)."""
    from mr_lda_spark.operators.linalg import correlation_pairs

    rows = [[1.0, float(i), float(i % 3)] for i in range(20)]
    got = {
        (r["i"], r["j"]): r["corr"]
        for r in correlation_pairs(
            _df(spark, rows, dim=3), dim=3
        ).collect()
    }
    assert got[(1, 2)] is None and got[(1, 3)] is None
    assert got[(2, 3)] is not None


def test_correlation_single_gram_pass_broadcast_joins(spark):
    """The composition must run the distributed gram kernel ONCE and
    finish on broadcast joins of d²-sized relations.  This is only
    true because materialize=True checkpoints the gram relation: the
    five consumers filter on the GROUP KEYS (i, j), Catalyst pushes
    those predicates through the aggregate into each branch's
    exchange, the canonicalized exchanges differ, and ReuseExchange
    never fires — the lazy plan re-runs the corpus scan + Arrow
    matmul six times.  Asserted both ways so the hazard stays
    documented-by-test."""
    from mr_lda_spark.operators.linalg import correlation_pairs

    rng = np.random.default_rng(23)
    src = _df(spark, rng.normal(size=(30, 4)).tolist(), dim=4)
    df = correlation_pairs(src, dim=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # materialized: downstream plan reads the checkpointed 2145-row
    # relation — the Arrow kernel appears ZERO times
    assert plan.count("MapInPandas") == 0
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    lazy = correlation_pairs(src, dim=4, materialize=False)
    lplan = lazy._jdf.queryExecution().executedPlan().toString()
    # the lazy path exists for composition/inspection, and the
    # recompute hazard is real (this is the regression witness: if a
    # Spark upgrade starts reusing the exchange, this count drops and
    # the eager default can be revisited)
    assert lplan.count("MapInPandas") >= 2
    assert "CartesianProduct" not in lplan


def test_gram_out_type_double_and_decimal_paths(spark):
    """The three boundary representations agree on values: long
    (default, driver-hashable), decimal(38,0) (exact internal form,
    pca_power's collect path), double (the >2^53-bound escape —
    inexact past 2^53 but engine-agreed below it)."""
    rng = np.random.default_rng(31)
    rows = rng.normal(size=(25, 4)).tolist()
    base = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(_df(spark, rows), dim=4).collect()
    }
    dec = gram_moments(_df(spark, rows), dim=4, out_type="decimal(38,0)")
    dbl = gram_moments(_df(spark, rows), dim=4, out_type="double")
    assert dec.schema["s"].dataType.simpleString() == "decimal(38,0)"
    assert dbl.schema["s"].dataType.simpleString() == "double"
    assert {
        (r["i"], r["j"]): int(r["s"]) for r in dec.collect()
    } == base
    assert {
        (r["i"], r["j"]): int(r["s"]) for r in dbl.collect()
    } == base


def test_gram_bigint_overflow_fails_loudly_not_null(spark):
    """ADVICE r12: under non-ANSI Spark the decimal->bigint boundary
    cast past 2^63-1 yields silent NULL sums (DuckDB would error),
    quietly corrupting downstream covariance.  The guard must fail
    the JOB instead: components of 1000.0 quantize to 1e9 micro-units,
    so 10 rows put every gram cell at 1e19 > 2^63-1.  Partitioning is
    EXPLICIT (ADVICE r13): repartition(10) pins the one-row-per-batch
    shape this test exercises (the cross-batch decimal sum tripping
    the boundary guard) regardless of core count; the one-partition
    shape has its own test below (kernel-tier chunking)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    rows = [[1000.0, 1000.0] for _ in range(10)]
    over = gram_moments(_df(spark, rows, dim=2).repartition(10), dim=2)
    with pytest.raises(Exception) as exc:
        over.collect()
    # Spark surfaces assert_true as a Py4J-wrapped RuntimeError whose
    # message carries the guard text; accept either wrapping.
    assert "gram_moments" in str(exc.value) or isinstance(
        exc.value, Py4JJavaError
    )
    # the exact decimal path carries the same input losslessly...
    dec = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(
            _df(spark, rows, dim=2), dim=2, out_type="decimal(38,0)"
        ).collect()
    }
    assert dec[(1, 1)] == 10 * (10**9) ** 2
    # ...and in-bound inputs pass through the guard value-unchanged.
    small = [[0.5, -0.25], [1.0, 0.125]]
    guarded = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(_df(spark, small, dim=2), dim=2).collect()
    }
    exact = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(
            _df(spark, small, dim=2), dim=2, out_type="decimal(38,0)"
        ).collect()
    }
    assert guarded == exact


def test_gram_single_partition_chunking_keeps_decimal_exact(spark):
    """ADVICE r13 (the kernel-tier wrap): on ONE partition the whole
    10-row batch hits the int64 matmul at once — per-cell 1e19 wraps
    to -8.45e18, which lands back INSIDE ±2^63-1 where the boundary
    guard cannot see it.  The kernel must chunk the batch (B·max|q|²
    headroom → sub-batch partials) so the decimal path stays exact
    and the long-boundary guard still fires on the true sum."""
    import pytest

    rows = [[1000.0, 1000.0] for _ in range(10)]
    src = _df(spark, rows, dim=2).coalesce(1)
    dec = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_moments(
            src, dim=2, out_type="decimal(38,0)"
        ).collect()
    }
    assert dec[(1, 1)] == 10 * (10**9) ** 2  # wrapped would be < 0
    assert dec[(0, 0)] == 10  # chunk partials must not double-count
    with pytest.raises(Exception) as exc:
        gram_moments(src, dim=2).collect()
    assert "gram_moments" in str(exc.value)


def test_gram_single_row_past_int64_raises_in_kernel(spark):
    """A single row whose cell bound max|q|² overflows int64 cannot be
    chunked around — the kernel must raise loudly (lower scale), not
    wrap.  4000.0 quantizes to 4e9; 1.6e19 > 2^63-1."""
    import pytest

    src = _df(spark, [[4000.0, 4000.0]], dim=2).coalesce(1)
    with pytest.raises(Exception, match="single row"):
        gram_moments(src, dim=2, out_type="decimal(38,0)").collect()


def test_gram_non_finite_component_raises(spark):
    """NaN/inf components previously wrapped through astype(int64)
    into garbage micro-units; the quantization-tier check fails them
    loudly instead."""
    import pytest

    src = _df(spark, [[float("nan"), 1.0]], dim=2).coalesce(1)
    with pytest.raises(Exception, match="non-finite"):
        gram_moments(src, dim=2, out_type="decimal(38,0)").collect()


def test_gram_int_out_type_guard_and_pass_through(spark):
    """ADVICE r13 (low): the silent-NULL cast guard must cover EVERY
    integral out_type at its own bound, not just long/bigint.  20
    rows of 0.5 put the diagonal at 5e12 > 2^31-1 → out_type='int'
    must fail the job; a genuinely int-sized input passes through
    value-unchanged."""
    import pytest

    rows = [[0.5, 0.5] for _ in range(20)]
    with pytest.raises(Exception) as exc:
        gram_moments(_df(spark, rows, dim=2), dim=2, out_type="int").collect()
    assert "gram_moments" in str(exc.value)
    small = [[0.001, 0.002]]
    got = {
        (r["i"], r["j"]): r["s"]
        for r in gram_moments(
            _df(spark, small, dim=2), dim=2, out_type="int"
        ).collect()
    }
    assert got[(1, 1)] == 1000 * 1000 and got[(2, 2)] == 2000 * 2000
    assert got[(0, 0)] == 1
