"""Boilerplate-span removal, model-score inference, upsampling, and
deterministic shard shuffling."""

import hashlib

from pyspark.sql import functions as F

from mr_lda_spark.operators import curation, textops


def test_remove_boilerplate_drops_hot_span(spark):
    boiler = " ".join(f"b{i}" for i in range(16))
    uniq = lambda d: " ".join(f"u{d}_{i}" for i in range(16))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + uniq(1)),
            (2, boiler + " " + uniq(2)),
            (3, boiler + " " + uniq(3)),
            (4, uniq(4) + " " + boiler.replace("b0", "B0")),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in textops.remove_boilerplate_spans(
            docs, span_tokens=16, max_span_occurrences=2
        ).collect()
    }
    # The boilerplate span occurs 3x -> dropped everywhere it appears.
    for d in (1, 2, 3):
        assert got[d]["clean_text"] == uniq(d)
        assert (got[d]["n_spans_kept"], got[d]["n_spans_dropped"]) == (1, 1)
    # Doc 4's variant span occurs once -> fully kept, in order.
    assert got[4]["clean_text"] == uniq(4) + " " + boiler.replace("b0", "B0")
    assert got[4]["n_spans_dropped"] == 0


def test_remove_boilerplate_all_dropped_yields_empty(spark):
    span = " ".join(f"x{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(i, span) for i in range(5)], "doc_id long, text string"
    )
    out = textops.remove_boilerplate_spans(
        docs, span_tokens=16, max_span_occurrences=2
    ).collect()
    assert all(r["clean_text"] == "" and r["n_spans_kept"] == 0 for r in out)


def test_quality_model_score_matches_python(spark):
    text = "alpha beta gamma alpha"
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = textops.quality_model_score(docs, n_buckets=4096).collect()[0]
    total = 0
    for tok in text.split():
        b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 4096
        total += (b * 2654435761) % 1001 - 500
    raw = total / (4 * 1000.0)
    assert row["n_tokens"] == 4
    assert abs(row["raw_score"] - round(raw, 6)) < 1e-9
    assert 0.0 < row["quality_prob"] < 1.0


def test_upsample_integer_and_zero_weights(spark):
    docs = spark.createDataFrame(
        [(i, "src0" if i % 2 == 0 else "src1") for i in range(20)],
        "doc_id long, source string",
    )
    out = curation.upsample(
        docs, {"src0": 2.0, "src1": 0.0}, domain_col="source"
    )
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(per_doc[i] == 2 for i in range(0, 20, 2))
    assert all(i not in per_doc for i in range(1, 20, 2))


def test_upsample_fractional_is_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, "s") for i in range(400)], "doc_id long, source string"
    )
    out = curation.upsample(docs, {"s": 1.5}, domain_col="source")
    n1 = out.count()
    n2 = curation.upsample(docs, {"s": 1.5}, domain_col="source").count()
    assert n1 == n2  # hash rule, not RNG
    assert 400 * 1.3 < n1 < 400 * 1.7


def test_shuffle_shards_positions_and_determinism(spark):
    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = curation.shuffle_shards(docs, n_shards=4).collect()
    b = curation.shuffle_shards(docs, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # A different salt yields a different permutation.
    c = curation.shuffle_shards(docs, n_shards=4, salt="epoch2").collect()
    assert sorted(map(tuple, c)) != sorted(map(tuple, a))


def test_domain_cap(spark):
    rows = [(i, f"d{i % 3}", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = curation.domain_cap(
        df, max_per_domain=4, domain_col="source", score_col="score"
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 4 for v in by_dom.values())

    # Keeps the highest-scoring docs of each domain (score == doc_id here).
    for dom, ids in by_dom.items():
        expect = sorted(
            [i for i in range(30) if f"d{i % 3}" == dom], reverse=True
        )[:4]
        assert sorted(ids) == sorted(expect)


def test_interleave_domains_rotates_and_is_deterministic(spark):
    rows = [(i, f"d{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = curation.interleave_domains(df).orderBy("interleave_pos").collect()
    b = curation.interleave_domains(df).orderBy("interleave_pos").collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    # positions are a permutation of 1..N
    assert sorted(r["interleave_pos"] for r in a) == list(range(1, 41))
    # With 4 equal-sized domains, each consecutive block of 4 (one
    # round) covers all 4 domains — perfect rotation.
    for start in range(0, 40, 4):
        block = {r["source"] for r in a[start : start + 4]}
        assert len(block) == 4


def test_adaptive_quality_filter_per_group_median(spark):
    # Two sources with clearly different score distributions: each
    # keeps its own >= median half, not a global cut.
    rows = []
    for i in range(8):
        # "good" source: long, stop-wordy docs (high score).
        rows.append((i, "the quick brown fox jumps over a lazy dog " * (i + 3), "web"))
    for i in range(8):
        # "short" source: terse low-score docs.
        rows.append((100 + i, "x" + " y" * (5 + i), "logs"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.adaptive_quality_filter(docs, group_col="source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # Both groups survive with their own thresholds.
    assert set(by_src) == {"web", "logs"}
    thr = {s: rs[0]["group_threshold"] for s, rs in by_src.items()}
    assert thr["web"] != thr["logs"]
    for s, rs in by_src.items():
        assert all(r["quality_score"] >= thr[s] for r in rs)
        # Median gate keeps at least half, never everything (scores differ).
        assert 4 <= len(rs) <= 8


def test_adaptive_quality_filter_plan_no_corpus_shuffle(spark):
    docs = spark.createDataFrame(
        [(1, "the a of and to in is it words here", "s1")],
        "doc_id long, text string, source string",
    )
    plan = curation.adaptive_quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    # Thresholds come back via broadcast, not a shuffled corpus join.
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_domain_cap_salted_two_phase_equals_single_phase(spark):
    """The default salted two-phase cap is output-identical to the
    single-phase window (every true top-N row survives its salt
    bucket's top-N), including under a score ordering with ties."""
    rows = []
    for i in range(200):
        rows.append((i, "mega", float(i % 7)))   # skewed giant domain
    for i in range(200, 215):
        rows.append((i, "small", float(i % 3)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    two = curation.domain_cap(
        docs, 10, score_col="score", salt_buckets=8
    ).collect()
    one = curation.domain_cap(
        docs, 10, score_col="score", salt_buckets=None
    ).collect()
    key = lambda r: (r["source"], r["doc_id"])  # noqa: E731
    assert sorted(map(tuple, two)) == sorted(map(tuple, one))
    per_dom = {}
    for r in two:
        per_dom[r["source"]] = per_dom.get(r["source"], 0) + 1
    assert per_dom == {"mega": 10, "small": 10}


def test_token_budget_select_equals_global_cumsum(spark):
    """The histogram-offset + per-bucket-window plan must reproduce the
    naive global-ordered running sum exactly (membership AND
    cum_tokens), including ties broken by doc_id and a score bucket
    that straddles the budget boundary."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (i, float(f"0.{(i * 37) % 100:02d}"), 10 + (i % 5))
        for i in range(300)
    ]  # many duplicate scores -> multi-row buckets and ties
    scored = spark.createDataFrame(
        rows, "doc_id long, quality_score double, n_tokens int"
    )
    budget = 1200
    got = sorted(
        map(tuple, curation.token_budget_select(scored, budget).collect())
    )
    w = Window.orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = sorted(
        map(
            tuple,
            scored.withColumn(
                "cum_tokens", F.sum("n_tokens").over(w).cast("long")
            )
            .filter(F.col("cum_tokens") <= budget)
            .collect(),
        )
    )
    assert got == want and 0 < len(got) < 300
    # degenerate budgets
    assert curation.token_budget_select(scored, 0).count() == 0
    assert curation.token_budget_select(scored, 10**9).count() == 300


def test_dsir_weights_prefer_target_like_docs(spark):
    """DSIR semantics: docs sharing the target's n-gram distribution
    score higher than off-target docs, and the weights are
    deterministic across runs."""
    target_texts = [f"the quick brown fox jumps over dog {i}" for i in range(10)]
    on_target = [f"the quick brown fox runs past dog {i}" for i in range(10, 20)]
    off_target = [f"zzz qqq xxx vvv kkk jjj www {i}" for i in range(20, 30)]
    docs = spark.createDataFrame(
        list(enumerate(target_texts + on_target + off_target)),
        "doc_id long, text string",
    )
    target = docs.filter(F.col("doc_id") < 10)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in curation.dsir_weights(docs, target, n_buckets=256).collect()
    }
    on = sum(w[i] for i in range(10, 20)) / 10
    off = sum(w[i] for i in range(20, 30)) / 10
    assert on > off + 0.5, (on, off)
    again = {
        r["doc_id"]: r["log_weight"]
        for r in curation.dsir_weights(docs, target, n_buckets=256).collect()
    }
    assert w == again


def test_temperature_sample_flattens_mixture(spark):
    """τ < 1 upweights small sources: the small source's keep rate must
    exceed the big one's, totals respect the budget in expectation, and
    the deterministic draw repeats exactly."""
    rows = [(i, f"doc {i}", "big" if i < 900 else "small") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curation.temperature_sample(docs, tau=0.5, target_docs=200)
    got = out.collect()
    rates = {r["source"]: r["keep_rate"] for r in got}
    assert rates["small"] > rates["big"]
    n = len(got)
    assert 120 <= n <= 280  # budget 200 ± sampling noise
    again = sorted(map(tuple, curation.temperature_sample(
        docs, tau=0.5, target_docs=200).collect()))
    assert again == sorted(map(tuple, got))
    # tau=1 keeps natural proportions: keep rates equal across sources
    nat = {
        r["source"]: r["keep_rate"]
        for r in curation.temperature_sample(docs, tau=1.0, target_docs=200).collect()
    }
    assert abs(nat["small"] - nat["big"]) < 1e-9


def test_hash_split_is_disjoint_exhaustive_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    out = curation.hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = out.collect()
    # exhaustive: every row got exactly one label
    assert len(rows) == 500
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    # deterministic: md5-derived, so a Python replay agrees row by row
    for r in rows:
        h = hashlib.md5(f"split:{r['doc_id']}".encode()).hexdigest()
        b = int(h[:15], 16) % 1_000_000
        want = "train" if b < 800_000 else ("val" if b < 900_000 else "test")
        assert r["split"] == want, r
    # roughly proportional (hash uniformity, wide tolerance)
    n_train = sum(r["split"] == "train" for r in rows)
    assert 330 <= n_train <= 470


def test_hash_split_single_split_takes_everything(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = curation.hash_split(docs, {"all": 1.0}).collect()
    assert [r["split"] for r in got] == ["all", "all"]


def test_hash_split_remainder_goes_to_last(spark):
    # fractions deliberately not summing to 1: last split absorbs.
    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    rows = curation.hash_split(docs, {"a": 0.001, "rest": 0.5}).collect()
    assert len(rows) == 200
    assert all(r["split"] in ("a", "rest") for r in rows)
    assert sum(r["split"] == "rest" for r in rows) > 150


def test_weighted_priority_sample_prefers_heavy_rows(spark):
    # weight 1000 vs 1: heavy rows should dominate the sample
    rows = [(i, 1000 if i < 50 else 1) for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    got = curation.weighted_priority_sample(docs, 40, "w").collect()
    heavy = sum(r["w"] == 1000 for r in got)
    assert heavy >= 30  # ~proportional-to-weight inclusion
    # deterministic: identical rerun, bit-identical priorities
    again = curation.weighted_priority_sample(docs, 40, "w").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # priority replays from the md5 rule exactly
    for r in got[:5]:
        u = int(hashlib.md5(f"wps:{r['doc_id']}".encode())
                .hexdigest()[:15], 16)
        assert r["priority"] == float(u) / float(r["w"])


def test_weighted_priority_sample_is_topk_plan(spark):
    docs = spark.createDataFrame([(1, 2)], "doc_id long, w long")
    plan = (
        curation.weighted_priority_sample(docs, 5, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a full global sort


def test_negative_samples_deterministic_and_self_free(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.curation import negative_samples

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = negative_samples(docs, k=3, bucket_target=32)
    rows = a.collect()
    # one row per (doc, rank) except the rare self-only bucket
    assert len(rows) >= 3 * 500 - 5
    for r in rows:
        assert r["neg_doc_id"] != r["doc_id"]
        assert 1 <= r["neg_rank"] <= 3
    # deterministic: a second evaluation is identical
    b = {(r["doc_id"], r["neg_rank"]): r["neg_doc_id"]
         for r in negative_samples(docs, k=3, bucket_target=32).collect()}
    assert {(r["doc_id"], r["neg_rank"]): r["neg_doc_id"]
            for r in rows} == b


def test_negative_samples_spread(spark):
    """Negatives should be spread over the corpus, not collapsed onto
    a few candidates (hash-quality smoke check)."""
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.curation import negative_samples

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = negative_samples(docs, k=2, bucket_target=64)
    distinct_negs = out.select("neg_doc_id").distinct().count()
    assert distinct_negs > 300


def test_score_calibration_ppm(spark):
    from pyspark.sql import functions as F
    from mr_lda_spark.operators.curation import score_calibration

    rows = [
        ("a", 1, 0.1), ("a", 2, 0.2), ("a", 3, 0.2), ("a", 4, 0.9),
        ("b", 5, 100.0),           # singleton group -> 0
        ("c", 6, 5.0), ("c", 7, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, quality_score double"
    )
    got = {
        r["doc_id"]: r["calibrated_ppm"]
        for r in score_calibration(df, "source", "quality_score").collect()
    }
    # group a, n=4: ranks 1,2,2,4 -> (r-1)*1e6 // 3
    assert got[1] == 0
    assert got[2] == got[3] == 1_000_000 // 3
    assert got[4] == 1_000_000
    assert got[5] == 0
    assert got[6] == 0 and got[7] == 1_000_000
