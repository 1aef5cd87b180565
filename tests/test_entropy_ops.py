"""char_entropy / source_divergence / weighted_sample unit tests.

Golden values are hand-derivable (powers-of-two alphabets) or
recomputed in-process with numpy/hashlib — the same
mirror-the-engine-in-python strategy the minhash and negative-sample
suites use, so a regression in either engine's arithmetic shows up as
a value diff, not just a shape diff.
"""

import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from mr_lda_spark.operators.curation import weighted_sample
from mr_lda_spark.operators.textops import char_entropy, source_divergence


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestCharEntropy:
    def test_powers_of_two_alphabets(self, spark):
        # aaaa -> 0 bits; abab -> 1 bit; abcdabcd -> 2 bits (exact).
        out = {
            r["doc_id"]: r
            for r in char_entropy(
                _docs(
                    spark,
                    [(1, "aaaa"), (2, "abab"), (3, "abcdabcd")],
                )
            ).collect()
        }
        assert out[1]["entropy_bits"] == 0.0
        assert out[2]["entropy_bits"] == 1.0
        assert out[3]["entropy_bits"] == 2.0
        assert out[3]["n_distinct_chars"] == 4
        assert out[3]["n_chars"] == 8

    def test_matches_numpy_on_mixed_text(self, spark):
        text = "the quick brown fox jumps over the lazy dog 12345!"
        row = char_entropy(_docs(spark, [(1, text)])).collect()[0]
        # Mirror: quantized c*log2(c) terms summed exactly.
        counts = {}
        for ch in text:
            counts[ch] = counts.get(ch, 0) + 1
        n = sum(counts.values())
        s = sum(round(c * math.log2(c) * 1e6) for c in counts.values())
        assert row["clogc_q"] == s
        assert row["n_chars"] == n
        assert row["entropy_bits"] == pytest.approx(
            math.log2(n) - s / (n * 1e6), abs=1e-4
        )

    def test_empty_doc_zero_entropy(self, spark):
        rows = char_entropy(_docs(spark, [(1, ""), (2, "xy")])).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[1]["n_chars"] == 0
        assert by_id[1]["entropy_bits"] == 0.0
        assert by_id[2]["entropy_bits"] == 1.0

    def test_unicode_chars_counted_once(self, spark):
        row = char_entropy(_docs(spark, [(1, "éé¤¤")])).collect()[0]
        assert row["n_chars"] == 4
        assert row["n_distinct_chars"] == 2
        assert row["entropy_bits"] == 1.0

    def test_keep_cols_passthrough(self, spark):
        df = spark.createDataFrame(
            [(1, "ab", "web")], ["doc_id", "text", "source"]
        )
        row = char_entropy(df, keep_cols=("source",)).collect()[0]
        assert row["source"] == "web"


class TestSourceDivergence:
    def test_identical_sources_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "s1"), (2, "a b c", "s2")],
            ["doc_id", "text", "source"],
        )
        row = source_divergence(df).collect()[0]
        assert (row["source_a"], row["source_b"]) == ("s1", "s2")
        assert row["js_bits"] == 0.0
        assert row["n_shared_terms"] == 3

    def test_disjoint_sources_emit_no_row(self, spark):
        df = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "x y", "s2")],
            ["doc_id", "text", "source"],
        )
        assert source_divergence(df).count() == 0

    def test_matches_numpy_js(self, spark):
        rows = [
            (1, "a a b c d", "s1"),
            (2, "a b b b e", "s2"),
            (3, "c c c d e f", "s3"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = {
            (r["source_a"], r["source_b"]): r["js_bits"]
            for r in source_divergence(df).collect()
        }

        def js(ta, tb):
            va = {}
            vb = {}
            for t in ta.split():
                va[t] = va.get(t, 0) + 1
            for t in tb.split():
                vb[t] = vb.get(t, 0) + 1
            na, nb = sum(va.values()), sum(vb.values())
            terms = set(va) | set(vb)
            total = 0.0
            for t in terms:
                p = va.get(t, 0) / na
                q = vb.get(t, 0) / nb
                m = (p + q) / 2
                if p:
                    total += p / 2 * math.log2(p / m)
                if q:
                    total += q / 2 * math.log2(q / m)
            return total

        assert got[("s1", "s2")] == pytest.approx(
            js(rows[0][1], rows[1][1]), abs=1e-5
        )
        assert got[("s1", "s3")] == pytest.approx(
            js(rows[0][1], rows[2][1]), abs=1e-5
        )
        assert got[("s2", "s3")] == pytest.approx(
            js(rows[1][1], rows[2][1]), abs=1e-5
        )
        # JS in bits is bounded by 1; all pairs share some terms here
        # so strictly inside (0, 1).
        for v in got.values():
            assert 0.0 < v < 1.0

    def test_symmetric_in_distribution(self, spark):
        # Swapping which source holds which text flips only the labels.
        d1 = spark.createDataFrame(
            [(1, "a a b", "s1"), (2, "b c c", "s2")],
            ["doc_id", "text", "source"],
        )
        d2 = spark.createDataFrame(
            [(1, "b c c", "s1"), (2, "a a b", "s2")],
            ["doc_id", "text", "source"],
        )
        v1 = source_divergence(d1).collect()[0]["js_bits"]
        v2 = source_divergence(d2).collect()[0]["js_bits"]
        assert v1 == v2


def _mirror_min_key(doc_id, w):
    best = None
    for i in range(1, w + 1):
        h = hashlib.md5(f"{doc_id}:wrs:{i}".encode()).hexdigest()
        k = int(h[:15], 16)
        best = k if best is None or k < best else best
    return best


class TestWeightedSample:
    def test_matches_python_mirror(self, spark):
        df = spark.createDataFrame(
            [(i, (i % 7) + 1) for i in range(1, 101)], ["doc_id", "w"]
        )
        got = sorted(
            weighted_sample(df, "w", k=10).collect(),
            key=lambda r: r["rank"],
        )
        mirror = sorted(
            (_mirror_min_key(i, (i % 7) + 1), i) for i in range(1, 101)
        )[:10]
        assert [(r["min_key"], r["doc_id"]) for r in got] == mirror
        assert [r["rank"] for r in got] == list(range(1, 11))

    def test_heavy_rows_win_more(self, spark):
        # 50 heavy (w=64) + 50 light (w=1): expectation ~64/65 of the
        # sample is heavy; deterministic draw, assert a safe majority.
        rows = [(i, 64) for i in range(50)] + [
            (i, 1) for i in range(50, 100)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "w"])
        got = weighted_sample(df, "w", k=20).collect()
        heavy = sum(1 for r in got if r["doc_id"] < 50)
        assert heavy >= 16

    def test_weight_cap_and_floor(self, spark):
        # w <= 0 floors to 1 ticket; w > cap saturates at cap — both
        # still sample deterministically.
        df = spark.createDataFrame(
            [(1, 0), (2, 10_000), (3, 5)], ["doc_id", "w"]
        )
        got = {r["doc_id"]: r for r in weighted_sample(df, "w", k=3).collect()}
        assert got[1]["w_capped"] == 1
        assert got[2]["w_capped"] == 64
        assert got[1]["min_key"] == _mirror_min_key(1, 1)
        assert got[2]["min_key"] == _mirror_min_key(2, 64)

    def test_without_replacement(self, spark):
        df = spark.createDataFrame(
            [(i, 64) for i in range(30)], ["doc_id", "w"]
        )
        got = weighted_sample(df, "w", k=30).collect()
        assert len({r["doc_id"] for r in got}) == 30

    def test_topk_plan_no_global_sort(self, spark):
        df = spark.createDataFrame([(i, 3) for i in range(20)], ["doc_id", "w"])
        plan = weighted_sample(df, "w", k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestCharEntropyStateless:
    def test_bit_identical_to_groupby_variant(self, spark, documents):
        from mr_lda_spark.operators.textops import char_entropy_stateless

        a = {
            r["doc_id"]: tuple(r)
            for r in char_entropy(documents).collect()
        }
        b = {
            r["doc_id"]: tuple(r)
            for r in char_entropy_stateless(documents).collect()
        }
        assert a == b

    def test_plan_is_pure_projection(self, spark, documents):
        from mr_lda_spark.operators.textops import char_entropy_stateless

        plan = (
            char_entropy_stateless(documents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_edge_cases(self, spark):
        from mr_lda_spark.operators.textops import char_entropy_stateless

        rows = {
            r["doc_id"]: r
            for r in char_entropy_stateless(
                _docs(spark, [(1, ""), (2, "aaaa"), (3, "abcdabcd")])
            ).collect()
        }
        assert rows[1]["n_chars"] == 0 and rows[1]["entropy_bits"] == 0.0
        assert rows[1]["clogc_q"] == 0
        assert rows[2]["entropy_bits"] == 0.0
        assert rows[3]["entropy_bits"] == 2.0


class TestLexicalDiversity:
    def test_matches_python_mirror(self, spark):
        from mr_lda_spark.operators.textops import lexical_diversity

        rows = [
            (1, "a a a b c", "s1"),
            (2, "d d a", "s1"),
            (3, "x y z", "s2"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = {r["source"]: r for r in lexical_diversity(df).collect()}
        # s1: tokens a*4 b c d*2 -> N=8, V=4, hapax=2,
        # simpson_num = 4*3 + 0 + 0 + 2*1 = 14
        s1 = got["s1"]
        assert s1["n_tokens"] == 8
        assert s1["vocab"] == 4
        assert s1["hapax"] == 2
        assert int(s1["simpson_num"]) == 14
        assert s1["simpson"] == pytest.approx(14 / (8 * 7), abs=1e-6)
        assert s1["ttr"] == pytest.approx(4 / 8, abs=1e-6)
        # s2: all hapax -> simpson 0 (no repeats possible)
        s2 = got["s2"]
        assert int(s2["simpson_num"]) == 0
        assert s2["simpson"] == 0.0

    def test_simpson_num_is_bigint_at_boundary(self, spark):
        """The SUM runs in decimal(38,0) inside the plan but the
        OUTPUT column must be BIGINT — Spark materializes DecimalType
        to pandas as object-Decimal while DuckDB's DECIMAL lands
        float64, so a raw decimal output can never driver-hash-match
        (the r11 hash-red root cause)."""
        from mr_lda_spark.operators.textops import lexical_diversity

        df = spark.createDataFrame(
            [(1, "a a", "s")], ["doc_id", "text", "source"]
        )
        schema = {f.name: f.dataType.simpleString()
                  for f in lexical_diversity(df).schema.fields}
        assert schema["simpson_num"] == "bigint"

    def test_one_token_source_simpson_defined_zero(self, spark):
        """A 1-token source divides by N(N-1)=0: Spark's non-ANSI
        divide yields NULL, DuckDB's 0/0 yields NaN — the operator
        pins the defined value 0.0 on both engines (ADVICE r11)."""
        from mr_lda_spark.operators.textops import lexical_diversity

        df = spark.createDataFrame(
            [(1, "solo", "s")], ["doc_id", "text", "source"]
        )
        row = lexical_diversity(df).collect()[0]
        assert row["n_tokens"] == 1
        assert row["simpson"] == 0.0


def test_duplicate_registration_raises():
    """register() must refuse a name that already exists — a duplicate
    silently shadows the old row's semantics while its driver-hash
    history keeps the old identity (the curation_weighted_sample
    collision this guard was born from)."""
    from mr_lda_spark import queries_registry as qr

    with pytest.raises(ValueError, match="duplicate query registration"):
        qr.register("curation_weighted_sample")(lambda spark, sf: None)


class TestWeightedSampleGrouped:
    def test_k_per_group_and_mirror(self, spark):
        from mr_lda_spark.operators.curation import weighted_sample_grouped

        rows = [(i, f"g{i % 3}", (i % 5) + 1) for i in range(1, 61)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
        got = weighted_sample_grouped(
            df, "w", k=4, group_col="source"
        ).collect()
        by_g = {}
        for r in got:
            by_g.setdefault(r["source"], []).append(r)
        assert set(by_g) == {"g0", "g1", "g2"}
        for g, rs in by_g.items():
            assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4]
            # mirror: per-group 4 smallest min-ticket keys
            mirror = sorted(
                (_mirror_min_key(i, (i % 5) + 1), i)
                for (i, gg, _) in rows
                if gg == g
            )[:4]
            assert sorted((r["min_key"], r["doc_id"]) for r in rs) == mirror

    def test_small_group_keeps_all(self, spark):
        from mr_lda_spark.operators.curation import weighted_sample_grouped

        df = spark.createDataFrame(
            [(1, "tiny", 3), (2, "tiny", 3)], ["doc_id", "source", "w"]
        )
        got = weighted_sample_grouped(
            df, "w", k=10, group_col="source"
        ).collect()
        assert len(got) == 2


class TestRankingQuality:
    def _rank_df(self, spark, rows):
        return spark.createDataFrame(
            rows, ["query_id", "rank", "neighbor_id"]
        )

    def test_identical_rankings_perfect(self, spark):
        from mr_lda_spark.operators.similarity import ranking_quality

        exact = self._rank_df(
            spark, [(1, r, 100 + r) for r in range(1, 6)]
        )
        got = ranking_quality(exact, exact, k=5).collect()[0]
        assert got["n_hits"] == 5
        assert got["rr_ppm"] == 1000000
        assert got["ndcg"] == 1.0
        assert got["dcg_q"] == got["idcg_q"]

    def test_matches_python_mirror_on_degraded(self, spark):
        import math

        from mr_lda_spark.operators.similarity import ranking_quality

        k = 4
        exact = self._rank_df(
            spark, [(1, 1, 10), (1, 2, 20), (1, 3, 30), (1, 4, 40)]
        )
        # approx: misses item 10 (the true top-1), reorders the rest.
        approx = self._rank_df(
            spark, [(1, 1, 20), (1, 2, 40), (1, 3, 99), (1, 4, 30)]
        )
        got = ranking_quality(approx, exact, k=k).collect()[0]
        rel = {20: 3, 40: 1, 99: 0, 30: 2}  # k+1 - exact_rank
        dcg = sum(
            round(rel[i] * 1e6 / math.log2(p + 1))
            for p, i in [(1, 20), (2, 40), (3, 99), (4, 30)]
        )
        idcg = sum(
            round((k + 1 - r) * 1e6 / math.log2(r + 1))
            for r in range(1, k + 1)
        )
        assert got["n_hits"] == 3
        assert got["rr_ppm"] == 0  # true top-1 absent
        assert got["dcg_q"] == dcg
        assert got["idcg_q"] == idcg
        assert got["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)

    def test_rr_floor_division(self, spark):
        from mr_lda_spark.operators.similarity import ranking_quality

        exact = self._rank_df(spark, [(1, r, r) for r in range(1, 4)])
        # true top-1 (item 1) found at position 3 -> rr = 1e6 // 3
        approx = self._rank_df(
            spark, [(1, 1, 3), (1, 2, 2), (1, 3, 1)]
        )
        got = ranking_quality(approx, exact, k=3).collect()[0]
        assert got["rr_ppm"] == 333333

    def test_empty_approx_query_scores_zero_not_dropped(self, spark):
        """ADVICE r11: a query present in the exact ranking whose
        approximate result set is EMPTY must appear with honest zeros
        (n_hits=0, dcg_q=0, rr_ppm=0, ndcg=0.0), not vanish from the
        metrics relation — an evaluation that drops exactly the worst
        cases overstates quality."""
        from mr_lda_spark.operators.similarity import ranking_quality

        exact = self._rank_df(
            spark,
            [(1, r, 100 + r) for r in range(1, 4)]
            + [(2, r, 200 + r) for r in range(1, 4)],
        )
        # approx covers query 1 perfectly, query 2 not at all
        approx = self._rank_df(
            spark, [(1, r, 100 + r) for r in range(1, 4)]
        )
        got = {r["query_id"]: r
               for r in ranking_quality(approx, exact, k=3).collect()}
        assert set(got) == {1, 2}
        q2 = got[2]
        assert q2["n_hits"] == 0
        assert q2["rr_ppm"] == 0
        assert q2["dcg_q"] == 0
        assert q2["ndcg"] == 0.0
        assert q2["idcg_q"] > 0
        assert got[1]["ndcg"] == 1.0


def test_ranking_quality_materializes_inputs_once(spark):
    """The metric references `exact` 3x and `approx` 2x; without the
    construction-time localCheckpoint each reference recomputes the
    input ranking (typically a full-corpus top-k window — the
    pushdown-defeats-ReuseExchange class).  Materialized: the
    downstream plan contains ZERO window/top-k machinery; lazy: the
    repeated references are visible (the regression witness)."""
    from pyspark.sql import Window
    from mr_lda_spark.operators.similarity import ranking_quality

    base = spark.createDataFrame(
        [(q, v, float((q * 7 + v) % 11)) for q in (1, 2) for v in range(8)],
        ["query_id", "neighbor_id", "score"],
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc())
    rank = base.select(
        "query_id", "neighbor_id", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 3)

    mat = ranking_quality(rank, rank, k=3)
    mplan = mat._jdf.queryExecution().executedPlan().toString()
    assert mplan.count("WindowGroupLimit") + mplan.count("Window") == 0

    lazy = ranking_quality(rank, rank, k=3, materialize=False)
    lplan = lazy._jdf.queryExecution().executedPlan().toString()
    assert lplan.count("WindowGroupLimit") + lplan.count("Window") >= 2
    # values identical either way
    assert sorted(map(tuple, mat.collect())) == sorted(
        map(tuple, lazy.collect())
    )
