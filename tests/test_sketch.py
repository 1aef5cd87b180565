"""Count-min sketch heavy hitters (operators/sketch.py): exact parity
with the plain groupBy-HAVING query, the overestimate invariant, the
prefilter's pruning, and the Arrow-not-pickled plan shape."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import sketch, textops


def _occurrences(documents):
    return textops.shingles(documents, "text", 3).select("shingle")


def test_cms_heavy_hitters_match_exact(spark, documents):
    occ = _occurrences(documents)
    exact = sorted(
        map(
            tuple,
            occ.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 5)
            .collect(),
        )
    )
    via_cms = sorted(
        map(
            tuple,
            sketch.heavy_hitters_cms(
                occ, "shingle", threshold=5, width=65536, depth=5
            ).collect(),
        )
    )
    assert exact == via_cms
    assert len(exact) > 0, "fixture must contain heavy hitters"


def test_cms_estimate_is_upper_bound(spark, documents):
    occ = _occurrences(documents)
    table = sketch.cms_build(occ, "shingle", width=4096, depth=4)
    bc = spark.sparkContext.broadcast(table)
    truth = (
        occ.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("_pos", sketch.cms_positions(F.col("shingle"), 4096, 4))
        .collect()
    )
    assert len(truth) > 1000
    t = bc.value
    for row in truth[:500]:
        est = min(int(t[d, p]) for d, p in enumerate(row["_pos"]))
        assert est >= row["cnt"], (row["shingle"], est, row["cnt"])


def test_cms_prefilter_prunes(spark, documents):
    """With a well-sized sketch the candidate KEY set stays near the
    true hitter set, far below the full key space."""
    occ = _occurrences(documents)
    table = sketch.cms_build(occ, "shingle", width=65536, depth=5)
    # Positions must come from Spark's xxhash64 — fetch them
    # relationally, replay the min-estimate in-process.
    rows = (
        occ.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("_pos", sketch.cms_positions(F.col("shingle"), 65536, 5))
        .collect()
    )
    n_keys = len(rows)
    n_true = sum(1 for r in rows if r["cnt"] >= 5)
    cand = sum(
        1
        for r in rows
        if min(int(table[d, p]) for d, p in enumerate(r["_pos"])) >= 5
    )
    assert cand >= n_true
    assert cand < n_keys / 10, (cand, n_keys)


def test_cms_threshold_above_max_is_empty(spark, documents):
    occ = _occurrences(documents)
    out = sketch.heavy_hitters_cms(
        occ, "shingle", threshold=10**9, width=1024, depth=3
    )
    assert out.count() == 0


def test_cms_probe_is_arrow_not_pickled(spark, documents):
    occ = _occurrences(documents)
    plan = (
        sketch.heavy_hitters_cms(occ, "shingle", threshold=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_stream_cms_table_equals_batch(spark, sf_dir, documents):
    """The streamed CMS cell table must equal the batch one exactly
    (count is order-insensitive) — the property that makes the sketch
    safe to maintain incrementally."""
    import uuid

    import numpy as np

    from mr_lda_spark.streaming.dedup_stream import read_documents_stream
    from mr_lda_spark.streaming.hll_stream import cms_table_from_stream

    batch = sketch.cms_build(
        _occurrences(documents), "shingle", width=4096, depth=3
    )
    stream_keys = textops.shingles(
        read_documents_stream(spark, sf_dir), "text", 3
    ).select("shingle")
    streamed = cms_table_from_stream(
        spark, stream_keys, "shingle",
        f"t_cms_{uuid.uuid4().hex[:8]}", width=4096, depth=3,
    )
    assert np.array_equal(batch, streamed)


def test_heavy_hitters_with_injected_table(spark, documents):
    """An externally-supplied sketch must give the same exact output
    as the internally-built one."""
    occ = _occurrences(documents)
    table = sketch.cms_build(occ, "shingle", width=8192, depth=4)
    via_injected = sorted(
        map(tuple, sketch.heavy_hitters_cms(
            occ, "shingle", threshold=5, width=8192, depth=4,
            table=table).collect())
    )
    via_internal = sorted(
        map(tuple, sketch.heavy_hitters_cms(
            occ, "shingle", threshold=5, width=8192, depth=4).collect())
    )
    assert via_injected == via_internal and via_injected


def test_selfjoin_mass_upper_bound_and_tightening(spark):
    """Every depth row's estimate must upper-bound the true F2, and
    widening the sketch must not loosen the bound (collision term
    shrinks ~F1²/width)."""
    from pyspark.sql import functions as F

    keys = spark.range(20000).select(
        F.concat(F.lit("k"), (F.col("id") % 3000)).alias("shingle")
    )
    wide = sketch.selfjoin_mass_estimate(keys, "shingle", 16384, 4).collect()[0]
    narrow = sketch.selfjoin_mass_estimate(keys, "shingle", 1024, 4).collect()[0]
    # true F2: 3000 keys x ceil/floor(20000/3000) occurrences
    exact = wide["exact_mass"]
    assert narrow["exact_mass"] == exact
    assert wide["est_mass"] >= exact
    assert narrow["est_mass"] >= exact
    assert wide["est_mass"] <= narrow["est_mass"]
    # the collision term is ~F1^2/width in expectation (measured
    # 157.6k vs exact 134k + 20000^2/16384 = 158.4k) — allow 2x slack
    assert wide["est_mass"] <= exact + 2 * (20000 ** 2) // 16384


def test_ams_f2_unbiased_near_truth(spark):
    """AMS should land much closer to the truth than the CMS upper
    bound at the same width, and is NOT one-sided."""
    from pyspark.sql import functions as F

    keys = spark.range(20000).select(
        F.concat(F.lit("k"), (F.col("id") % 3000)).alias("shingle")
    )
    ams = sketch.ams_f2_estimate(keys, "shingle", 4096, 5).collect()[0]
    exact = ams["exact_mass"]
    assert abs(ams["ams_f2"] - exact) <= 0.2 * exact
    cms = sketch.selfjoin_mass_estimate(keys, "shingle", 4096, 5).collect()[0]
    assert abs(ams["ams_f2"] - exact) < cms["est_mass"] - exact


def test_cms_tail_pass_fraction_rule():
    """The width-sizing rule as numpy: pass fraction = product over
    rows of the fraction of cells at/over the threshold."""
    import numpy as np

    t = np.zeros((2, 10), dtype=np.int64)
    t[0, :] = 20         # saturated row: every cell >= 10
    t[1, :5] = 20        # half-saturated row
    pf = sketch.cms_tail_pass_fraction(t, threshold=10)
    assert abs(pf - 0.5) < 1e-12
    # one true hitter per row in a wide healthy sketch: tiny fraction
    h = np.zeros((3, 1000), dtype=np.int64)
    h[:, 0] = 500
    assert sketch.cms_tail_pass_fraction(h, threshold=10) < 1e-8


def test_cms_saturation_guard_fires_and_stays_quiet(spark):
    """VERDICT r9 #5: an undersized width must warn (the prefilter
    cannot prune), the probe-sized 65,536 width must not."""
    import warnings

    from pyspark.sql import functions as F

    # 20k singleton keys: tail mass 20k, no true hitters at thr=50.
    keys = spark.range(20000).select(
        F.concat(F.lit("u"), F.col("id")).alias("shingle")
    )
    with pytest.warns(sketch.CmsSaturationWarning):
        sketch.heavy_hitters_cms(keys, "shingle", threshold=50, width=32,
                                 depth=3).collect()
    with warnings.catch_warnings():
        warnings.simplefilter("error", sketch.CmsSaturationWarning)
        out = sketch.heavy_hitters_cms(
            keys, "shingle", threshold=50, width=65536, depth=3
        ).collect()
    assert out == []  # no true hitters either way — output exactness
