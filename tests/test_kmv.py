"""KMV / theta bottom-k sketch unit tests (operators/kmv.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import kmv


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "source", "key"])


class TestKmvSketch:
    def test_matches_python_mirror(self, spark):
        rows = [(i, f"s{i % 3}", f"key{i}") for i in range(300)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=16)
        for g in ["s0", "s1", "s2"]:
            mirror = sorted(
                {_h60(k) for (_, s, k) in rows if s == g}
            )[:16]
            got = [
                r["h"]
                for r in sk.filter(F.col("source") == g)
                .orderBy("rank")
                .collect()
            ]
            assert got == mirror

    def test_two_level_selection_equals_one_level(self, spark):
        """The salted two-stage top-k (the 100 TB shape) must select
        exactly the same k values as a single global sort, for every
        bucket count."""
        rows = [(i, "s", f"v{i}") for i in range(500)]
        df = _df(spark, rows)
        expected = sorted({_h60(f"v{i}") for i in range(500)})[:32]
        for buckets in (1, 7, 64):
            got = [
                r["h"]
                for r in kmv.kmv_sketch(
                    df, "key", ["source"], k=32, buckets=buckets
                )
                .orderBy("rank")
                .collect()
            ]
            assert got == expected, f"buckets={buckets}"

    def test_small_group_keeps_all(self, spark):
        rows = [(i, "tiny", f"k{i}") for i in range(5)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=64)
        assert sk.count() == 5


class TestKmvPairSetOps:
    def test_identical_sets_estimate_equal(self, spark):
        # Same 400 keys in both sources: the merged sketch IS either
        # sketch, every element is common, inter_est == union_est.
        rows = [(i, "a", f"k{i}") for i in range(400)] + [
            (1000 + i, "b", f"k{i}") for i in range(400)
        ]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=64)
        r = kmv.kmv_pair_set_ops(sk, "source", k=64).collect()[0]
        assert r["n_sketch"] == 64
        assert r["n_common"] == 64
        assert r["inter_est"] == r["union_est"]
        # KMV estimator should land near the truth (400) for k=64.
        assert 250 < r["union_est"] < 650

    def test_disjoint_sets_zero_intersection(self, spark):
        rows = [(i, "a", f"x{i}") for i in range(300)] + [
            (1000 + i, "b", f"y{i}") for i in range(300)
        ]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=64)
        r = kmv.kmv_pair_set_ops(sk, "source", k=64).collect()[0]
        assert r["n_common"] == 0
        assert r["inter_est"] == 0.0
        # Union of two disjoint 300-sets ~ 600.
        assert 380 < r["union_est"] < 950

    def test_exact_collapse_when_under_k(self, spark):
        # 10 + 10 keys sharing 4: the merged sketch holds ALL 16
        # distinct union values < k, so estimates are exact counts.
        rows = [(i, "a", f"k{i}") for i in range(10)] + [
            (100 + i, "b", f"k{i + 6}") for i in range(10)
        ]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=64)
        r = kmv.kmv_pair_set_ops(sk, "source", k=64).collect()[0]
        assert r["n_sketch"] == 16
        assert r["union_est"] == 16.0
        assert r["n_common"] == 4
        assert r["inter_est"] == 4.0

    def test_plan_no_cartesian(self, spark):
        rows = [(i, f"s{i % 4}", f"k{i}") for i in range(100)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=8)
        plan = (
            kmv.kmv_pair_set_ops(sk, "source", k=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan


class TestKmvStream:
    def test_tracker_merges_and_prunes_incrementally(self):
        """Pure-python pin of the stateful kernel: chunked Arrow
        batches + pre-existing state must produce exactly the bottom-k
        of the union, and state stays pruned to k after EVERY chunk
        (the bounded-transient-memory claim)."""
        import pandas as pd

        from mr_lda_spark.streaming.kmv_stream import _kmv_tracker

        class FakeState:
            def __init__(self, hs):
                self.exists = hs is not None
                self._hs = hs
                self.updated = None

            @property
            def get(self):
                return (self._hs,)

            def update(self, v):
                self.updated = v

        fn = _kmv_tracker(k=4)
        st = FakeState([10, 20, 30, 40])
        chunks = [
            pd.DataFrame({"h": [5, 25, 25, 100]}),
            pd.DataFrame({"h": [1, 999]}),
        ]
        out = list(fn(("src",), chunks, st))
        expected = sorted({10, 20, 30, 40, 5, 25, 100, 1, 999})[:4]
        assert out[0]["hs"].iloc[0] == expected == [1, 5, 10, 20]
        assert st.updated == ([1, 5, 10, 20],)

    def test_stream_equals_batch_sketch(self, spark, documents):
        """Drained streaming sketch ≡ batch kmv_sketch on the same
        corpus (bottom-k is order-insensitive, so trigger boundaries
        cannot change it)."""
        import uuid

        from mr_lda_spark.operators import textops
        from mr_lda_spark.streaming.dedup_stream import (
            read_documents_stream,
        )
        from mr_lda_spark.streaming.kmv_stream import (
            kmv_drain_stream,
            kmv_sketch_stream,
            shingle_source_stream,
        )

        sf = "/root/testdata/sf0.001"
        stream = shingle_source_stream(
            read_documents_stream(spark, sf), n=3
        )
        drained = kmv_drain_stream(
            spark,
            kmv_sketch_stream(stream, "shingle", "source", k=32),
            f"kmvtest_{uuid.uuid4().hex[:8]}",
        )
        keys = textops.shingles(documents, "text", 3).join(
            documents.select("doc_id", "source"), "doc_id"
        )
        batch = kmv.kmv_sketch(keys, "shingle", ["source"], k=32)
        a = sorted(tuple(r) for r in drained.collect())
        b = sorted(
            (r["source"], r["h"], r["rank"]) for r in batch.collect()
        )
        assert a == b


class TestReviewRegressions:
    def test_null_keys_do_not_poison_sketch(self, spark):
        """md5(NULL) is NULL and sorts first in Spark's window — a NULL
        key must be dropped, not take rank 1."""
        rows = [(i, "s", f"k{i}") for i in range(50)]
        with_nulls = spark.createDataFrame(
            [(999, "s", None)] + rows, ["id", "source", "key"]
        )
        clean = _df(spark, rows)
        a = sorted(
            tuple(r)
            for r in kmv.kmv_sketch(
                with_nulls, "key", ["source"], k=8
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in kmv.kmv_sketch(clean, "key", ["source"], k=8).collect()
        )
        assert a == b
        assert all(r[1] is not None for r in a)

    @pytest.mark.slow
    def test_drain_across_multiple_microbatches(self, spark, tmp_path):
        """Update-mode memory sinks APPEND a row per group per trigger;
        the drain must keep only the final state.  Two source files +
        maxFilesPerTrigger=1 forces two micro-batches whose partial
        states would otherwise both explode into the output."""
        import uuid

        from mr_lda_spark.streaming.kmv_stream import (
            kmv_drain_stream,
            kmv_sketch_stream,
        )

        rows1 = [(f"s{i % 2}", f"k{i}") for i in range(60)]
        rows2 = [(f"s{i % 2}", f"k{i + 60}") for i in range(60)]
        d1 = spark.createDataFrame(rows1, ["source", "key"])
        d2 = spark.createDataFrame(rows2, ["source", "key"])
        src = str(tmp_path / "kmv_two_batches")
        d1.coalesce(1).write.parquet(src)
        d2.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("source string, key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        drained = kmv_drain_stream(
            spark,
            kmv_sketch_stream(stream, "key", "source", k=16),
            f"kmv2b_{uuid.uuid4().hex[:8]}",
        )
        batch = kmv.kmv_sketch(
            d1.unionByName(d2), "key", ["source"], k=16
        )
        a = sorted(tuple(r) for r in drained.collect())
        b = sorted(
            (r["source"], r["h"], r["rank"]) for r in batch.collect()
        )
        assert a == b
        # exactly one rank sequence per group, no duplicate hashes
        assert len(a) == len({(s, h) for s, h, _ in a})


def test_gram_empty_input_yields_count_row_and_zero_pca(spark):
    """An input with no valid vectors must still emit the (0,0,0)
    count row (the SQL oracle's count(*) always does) and pca_power
    must walk the documented degenerate trajectory to the zero vector
    instead of raising KeyError."""
    from mr_lda_spark.operators.linalg import gram_moments, pca_power

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    rows = gram_moments(empty, dim=4).collect()
    assert [(r["i"], r["j"], int(r["s"])) for r in rows] == [(0, 0, 0)]
    v = pca_power(empty, dim=4, iterations=3).collect()
    assert [int(r["loading"]) for r in v] == [0, 0, 0, 0]


def test_merge_equals_direct_sketch(spark):
    """kmv_merge over per-group sketches must reproduce the direct
    global sketch bit-for-bit — bottom-k is grouping-insensitive."""
    rows = [(i, f"g{i % 5}", f"k{i}") for i in range(400)]
    df = _df(spark, rows)
    per_group = kmv.kmv_sketch(df, "key", ["source"], k=16)
    merged = sorted(
        (r["h"], r["rank"])
        for r in kmv.kmv_merge(per_group, k=16).collect()
    )
    direct = sorted(
        (r["h"], r["rank"])
        for r in kmv.kmv_sketch(df, "key", [], k=16).collect()
    )
    assert merged == direct
    est = kmv.kmv_estimate(kmv.kmv_merge(per_group, k=16), k=16).collect()[0]
    assert est["n_sketch"] == 16
    assert 250 < est["est_distinct"] < 650


class TestHammingBandedPairs:
    def test_generic_kernel_matches_bruteforce(self, spark):
        from mr_lda_spark.operators.dedup import hamming_banded_pairs

        hashes = [
            (1, 0b10110011),
            (2, 0b10110010),  # hamming 1 to id 1
            (3, 0b01001100),  # far from 1/2
            (4, 0b01001100),  # identical to 3
        ]
        fp = spark.createDataFrame(hashes, "doc_id long, h long")
        got = sorted(
            (r["a"], r["b"], r["hamming"])
            for r in hamming_banded_pairs(
                fp, bits=8, max_hamming=2, hash_col="h"
            ).collect()
        )
        want = []
        for i, (ia, ha) in enumerate(hashes):
            for ib, hb in hashes[i + 1:]:
                d = bin(ha ^ hb).count("1")
                if d <= 2:
                    want.append((ia, ib, d))
        assert got == sorted(want)
        assert (1, 2, 1) in got and (3, 4, 0) in got

    def test_no_persisted_relations_after_return(self, spark):
        """The pagerank-leak rule: the fingerprint cache must be
        released before the materialized pairs return.  Holds the
        result (its localCheckpoint RDD is legitimately cached) and
        asserts AT MOST that one new persisted entry exists — the
        fingerprint cache itself must be gone, deterministically (no
        reliance on GC/ContextCleaner timing)."""
        from mr_lda_spark.operators.dedup import hamming_banded_pairs

        jsc = spark.sparkContext._jsc
        before = set(jsc.getPersistentRDDs().keySet().toArray())
        fp = spark.createDataFrame(
            [(i, i * 7) for i in range(50)], "doc_id long, h long"
        )
        out = hamming_banded_pairs(fp, bits=16, max_hamming=3, hash_col="h")
        after = set(jsc.getPersistentRDDs().keySet().toArray())
        assert len(after - before) <= 1  # only the held checkpoint
        out.count()  # the result stays usable after the fp release

    def test_lazy_path_runs_no_job_and_persists_nothing(self, spark):
        """materialize=False must be TRULY lazy: no persist, no job."""
        from mr_lda_spark.operators.dedup import hamming_banded_pairs

        jsc = spark.sparkContext._jsc
        before = set(jsc.getPersistentRDDs().keySet().toArray())
        fp = spark.createDataFrame(
            [(i, i * 5) for i in range(30)], "doc_id long, h long"
        )
        hamming_banded_pairs(
            fp, bits=16, max_hamming=3, hash_col="h", materialize=False
        )
        after = set(jsc.getPersistentRDDs().keySet().toArray())
        assert after == before

    def test_degenerate_band_width_refused(self, spark):
        from mr_lda_spark.operators.dedup import hamming_banded_pairs

        fp = spark.createDataFrame([(1, 2)], "doc_id long, h long")
        with pytest.raises(ValueError, match="bands"):
            hamming_banded_pairs(fp, bits=8, max_hamming=60, hash_col="h")

    def test_lazy_path_plan_inspectable(self, spark):
        from mr_lda_spark.operators.dedup import hamming_banded_pairs

        fp = spark.createDataFrame(
            [(i, i * 3) for i in range(20)], "doc_id long, h long"
        )
        lazy = hamming_banded_pairs(
            fp, bits=16, max_hamming=2, hash_col="h", materialize=False
        )
        plan = lazy._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
            or "BroadcastHashJoin" in plan


def test_estimate_grouped_matches_ungrouped_per_group(spark):
    """kmv_estimate_grouped restricted to one group ≡ kmv_estimate on
    that group's sketch alone."""
    rows = [(i, f"g{i % 2}", f"k{i}") for i in range(300)]
    df = _df(spark, rows)
    sk = kmv.kmv_sketch(df, "key", ["source"], k=32)
    grouped = {
        r["source"]: (r["n_sketch"], r["kth_h"], r["est_distinct"])
        for r in kmv.kmv_estimate_grouped(sk, ["source"], k=32).collect()
    }
    for g in ("g0", "g1"):
        single = kmv.kmv_estimate(
            sk.filter(F.col("source") == g), k=32
        ).collect()[0]
        assert grouped[g] == (
            single["n_sketch"], single["kth_h"], single["est_distinct"]
        )


def test_merge_k_larger_than_built_k_refused():
    """ADVICE r11: a merge-k larger than the sketch-time k would
    silently return an undersized relation that kmv_estimate misreads
    as the exact-collapse case.  The built_k parameter turns that
    silent wrongness into a driver-side ValueError (no Spark job)."""
    with pytest.raises(ValueError, match="built_k"):
        kmv.kmv_merge(None, k=64, built_k=32)


class TestMergeKEvidence:
    """ADVICE r12: the merge-k invariant must not be bypassable by
    OMITTING built_k — the sketch relation itself carries the
    sketch-time k as metadata on the rank column, and kmv_merge
    enforces against that evidence."""

    def test_metadata_evidence_blocks_oversized_merge(self, spark):
        rows = [(i, f"g{i % 3}", f"k{i}") for i in range(200)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=16)
        # built_k omitted: the stamped metadata (16) must still refuse
        # a merge at k=64 — the exact bypass ADVICE r12 flagged.
        with pytest.raises(ValueError, match="built_k=16"):
            kmv.kmv_merge(sk, k=64)

    def test_metadata_survives_filter_and_select(self, spark):
        rows = [(i, f"g{i % 3}", f"k{i}") for i in range(200)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=16)
        narrowed = sk.filter(F.col("source") != "g9").select(
            "source", "h", "rank"
        )
        with pytest.raises(ValueError, match="built_k=16"):
            kmv.kmv_merge(narrowed, k=32)
        # equal-or-smaller merge-k still passes through the evidence
        assert kmv.kmv_merge(narrowed, k=8).count() == 8

    def test_evidence_free_relation_refused_without_built_k(self, spark):
        """A hand-built relation with no kmv_built_k metadata and no
        explicit built_k is refused outright — the check cannot be
        skipped by omission."""
        bare = spark.createDataFrame(
            [("a", 10, 1), ("a", 20, 2)], "source string, h long, rank int"
        )
        with pytest.raises(ValueError, match="no sketch-time-k evidence"):
            kmv.kmv_merge(bare, k=2)
        # declaring the truncation point re-enables the merge
        assert kmv.kmv_merge(bare, k=2, built_k=2).count() == 2

    def test_merged_sketch_carries_its_own_k(self, spark):
        rows = [(i, f"g{i % 3}", f"k{i}") for i in range(200)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=16)
        merged = kmv.kmv_merge(sk, k=8)
        # the merged relation's evidence is the MERGE k, so a second
        # merge at a larger k is refused too (re-merge safety)
        with pytest.raises(ValueError, match="built_k=8"):
            kmv.kmv_merge(merged, k=16)


@pytest.mark.slow
def test_stream_null_keys_match_batch(spark, tmp_path):
    """ADVICE r11: batch kmv_sketch drops NULL keys before hashing;
    the streaming twin must mirror that filter — without it a NULL
    key's NULL hash reaches the Arrow batch as NaN and the tracker's
    int(h) raises, breaking batch/stream bit-equality for any
    non-shingle caller."""
    import uuid

    from mr_lda_spark.streaming.kmv_stream import (
        kmv_drain_stream,
        kmv_sketch_stream,
    )

    rows = [("s0", f"k{i}") for i in range(40)] + [("s0", None), ("s1", None)]
    d = spark.createDataFrame(rows, "source string, key string")
    src = str(tmp_path / "kmv_nulls")
    d.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("source string, key string")
        .parquet(src)
    )
    drained = kmv_drain_stream(
        spark,
        kmv_sketch_stream(stream, "key", "source", k=8),
        f"kmvnull_{uuid.uuid4().hex[:8]}",
    )
    batch = kmv.kmv_sketch(d, "key", ["source"], k=8)
    a = sorted(tuple(r) for r in drained.collect())
    b = sorted((r["source"], r["h"], r["rank"]) for r in batch.collect())
    assert a == b
    # the all-NULL group contributes nothing on either side
    assert all(s == "s0" for s, _, _ in a)


class TestMergeKContradiction:
    """ADVICE r13: an explicit built_k that EXCEEDS stamped evidence
    must be refused — otherwise kmv_merge(sk_built_at_16, k=64,
    built_k=64) silently returns the undersized relation the
    invariant exists to prevent.  The override is reserved for
    evidence-free relations and for STRICTER truncation claims."""

    def test_explicit_built_k_exceeding_evidence_refused(self, spark):
        rows = [(i, f"g{i % 3}", f"k{i}") for i in range(200)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=16)
        with pytest.raises(ValueError, match="contradicts"):
            kmv.kmv_merge(sk, k=64, built_k=64)

    def test_stricter_built_k_than_evidence_allowed(self, spark):
        """Declaring a truncation point BELOW the stamped k is always
        safe (more conservative than the proof) — it must pass."""
        rows = [(i, f"g{i % 3}", f"k{i}") for i in range(200)]
        sk = kmv.kmv_sketch(_df(spark, rows), "key", ["source"], k=16)
        assert kmv.kmv_merge(sk, k=8, built_k=8).count() == 8


class TestKmvUnion:
    """VERDICT r13 #3: mixed-k unions as BEHAVIOR — kmv_union reads
    every input's evidence and stamps the union with min-k, so the
    downstream kmv_merge needs no manual built_k and the invariant
    holds end-to-end."""

    def _two_sketches(self, spark, k_a=32, k_b=8):
        rows_a = [(i, "A", f"key{i}") for i in range(300)]
        rows_b = [(i, "B", f"key{i + 150}") for i in range(300)]
        sk_a = kmv.kmv_sketch(_df(spark, rows_a), "key", ["source"], k=k_a)
        sk_b = kmv.kmv_sketch(_df(spark, rows_b), "key", ["source"], k=k_b)
        return sk_a, sk_b

    def test_union_stamps_min_k(self, spark):
        sk_a, sk_b = self._two_sketches(spark)
        u = kmv.kmv_union([sk_a, sk_b])
        stamped = dict(u.schema["rank"].metadata)
        assert stamped["kmv_built_k"] == 8

    def test_merge_of_mixed_union_equals_direct_min_k_sketch(self, spark):
        """bottom-8 of (bottom-32(A) ∪ bottom-8(B)) must equal the
        bottom-8 sketch of A∪B built in one pass — the containment
        property that makes min-k the honest stamp."""
        sk_a, sk_b = self._two_sketches(spark)
        merged = kmv.kmv_merge(kmv.kmv_union([sk_a, sk_b]), k=8)
        all_rows = [(i, "all", f"key{i}") for i in range(300)] + [
            (i, "all", f"key{i + 150}") for i in range(300)
        ]
        direct = kmv.kmv_sketch(_df(spark, all_rows), "key", ["source"], k=8)
        got = sorted((r["h"], r["rank"]) for r in merged.collect())
        want = sorted((r["h"], r["rank"]) for r in direct.collect())
        assert got == want

    def test_merge_past_min_k_refused_without_manual_built_k(self, spark):
        """The exact mixed-k hazard: merging the union at the LARGER
        side's k must be refused by the stamped min-k evidence."""
        sk_a, sk_b = self._two_sketches(spark)
        with pytest.raises(ValueError, match="built_k=8"):
            kmv.kmv_merge(kmv.kmv_union([sk_a, sk_b]), k=32)

    def test_union_refuses_evidence_free_input(self, spark):
        sk_a, _ = self._two_sketches(spark)
        bare = spark.createDataFrame(
            [("X", 10, 1), ("X", 20, 2)], "source string, h long, rank int"
        )
        with pytest.raises(ValueError, match="no sketch-time-k"):
            kmv.kmv_union([sk_a, bare])
        # declaring the bare input's truncation point re-enables it
        u = kmv.kmv_union([sk_a, bare], built_ks=[None, 2])
        assert dict(u.schema["rank"].metadata)["kmv_built_k"] == 2

    def test_union_refuses_contradicting_built_ks_entry(self, spark):
        sk_a, _ = self._two_sketches(spark, k_a=16)
        with pytest.raises(ValueError, match="contradicts"):
            kmv.kmv_union([sk_a], built_ks=[64])
