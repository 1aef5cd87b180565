"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB corpus):
- exact dedup is one hash-shuffle on a 128-bit digest — never on the
  raw text (the digest is computed map-side so only 16 bytes shuffle).
- MinHash/LSH: signatures are computed per-doc with zero shuffle; the
  only shuffles are the band-bucket self-join (keys are (band, hash) —
  high cardinality, well distributed) and the final per-pair verify.
  Bucket skew (a degenerate hot bucket) is capped via a bucket-size
  limit before the pair explosion, the standard guard at scale.
- SimHash: per-doc bit-vote aggregation, one narrow shuffle on
  (doc_id, bit); output is a single 32-bit value per doc.
- n-gram Jaccard verify joins only candidate pairs — never all pairs.

All hashes are md5-derived (hex → bigint) so the DuckDB oracle can
reproduce them bit-for-bit; at production scale you'd swap in
xxhash64 via the same expression shape.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mr_lda_spark.operators.textops import shingles
from mr_lda_spark.operators.lifecycle import (
    cut_lineage,
    cut_lineage_round,
    release,
)

logger = logging.getLogger(__name__)


def _hash64(col, seed: int):
    """Deterministic 60-bit hash from md5 — reproducible in ANSI SQL:
    ('0x' || substr(md5(seed||':'||x),1,15))::BIGINT."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: one row per distinct text with the canonical
    (min) doc_id and the copy count."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    ngram: int | None = None,
) -> DataFrame:
    """Cross-dataset leakage matrix: for every ORDERED pair of sources,
    how many distinct content units appear in BOTH, and what fraction
    of the first source's distinct units that is — the audit a
    training-data pipeline runs before declaring subsets independent
    (train/eval leakage, mirrored crawls, vendor-overlap checks).

    The unit is the whole text (exact-copy leakage) by default, or
    ``ngram``-token shingles (GPT-3-decontamination-style fuzzy
    overlap — the corpus-similarity matrix) when set.

    Plan: (unit, source) distinct → per-unit sorted source set
    (bounded by the number of sources, a few dozen however big the
    corpus) → in-array ordered-pair explode (the lsh_candidate_pairs
    move — no self-join, no second scan) → count per pair; per-source
    distinct-unit totals are a source-count-sized relation joined
    back broadcast.  Shuffles: the distinct, the per-unit group, the
    pair count — all keyed on unit or (a, b), nothing corpus-wide ever
    fans out.

    Returns (source_a, source_b, n_shared, n_a, frac_of_a) for a ≠ b,
    both directions (frac is asymmetric by design)."""
    if ngram:
        # shingles() keys by "doc_id"; aliasing source into that slot
        # gives (source, shingle) with no extra join.
        hs = (
            shingles(
                docs.select(
                    F.col(source_col).alias("doc_id"), F.col(text_col)
                ),
                text_col,
                ngram,
            )
            .select(
                F.col("doc_id").alias("source"),
                F.col("shingle").alias("text_hash"),
            )
            .distinct()
        )
    else:
        hs = docs.select(
            F.md5(F.col(text_col)).alias("text_hash"),
            F.col(source_col).alias("source"),
        ).distinct()
    totals = hs.groupBy("source").agg(F.count(F.lit(1)).alias("n_a"))
    per_hash = hs.groupBy("text_hash").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    pairs = (
        per_hash.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ss"),
                        lambda x: F.transform(
                            F.filter(F.col("ss"), lambda y: y != x),
                            lambda y: F.struct(
                                x.alias("a"), y.alias("b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.join(
            F.broadcast(totals.withColumnRenamed("source", "source_a")),
            "source_a",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            F.round(F.col("n_shared") / F.col("n_a"), 6).alias("frac_of_a"),
        )
    )


def source_overlap_minhash(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Sketch path of ``source_overlap`` for MANY sources: the exact
    matrix's per-unit pair explode costs Σ_unit S_unit² rows, which is
    linear in the corpus only while the source count S stays small.
    Here each source gets a K-seed MinHash signature over its shingle
    set (one groupBy — S×K rows total regardless of corpus size) and
    pairwise Jaccard is ESTIMATED as the fraction of agreeing seeds:
    the S²K join is sketch-sized, never corpus-sized.

    Returns (source_a, source_b, est_jaccard) for a < b.  The md5
    hashing is engine-reproducible, so even the estimate is
    SQL-oracle-checkable."""
    sigs = minhash_signatures(
        docs.select(F.col(source_col).alias("doc_id"), F.col(text_col)),
        text_col,
        num_hashes,
        shingle_n,
    )
    a = sigs.select(
        F.col("doc_id").alias("source_a"), "seed", F.col("minhash").alias("ha")
    )
    b = sigs.select(
        F.col("doc_id").alias("source_b"), "seed", F.col("minhash").alias("hb")
    )
    return (
        a.join(b, "seed")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.avg((F.col("ha") == F.col("hb")).cast("double")), 6
            ).alias("est_jaccard")
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Tall MinHash signature table: (doc_id, seed, minhash).

    shingle → per-seed hash → min per (doc, seed).  One shuffle
    (the groupBy); the seed dimension is generated per-row with
    ``explode(sequence(...))`` so no join is needed.

    No distinct on the shingle stream: min() is duplicate-invariant,
    so deduplicating first would spend a full shuffle of the exploded
    stream to save ~15% of the (map-side, cheap) hashing — the groupBy's
    map-side partial min already collapses everything to docs×seeds
    rows before the only shuffle.  ``shingle_sets`` accepts an
    already-distinct (doc_id, shingle) relation when the caller has one
    persisted anyway (the LSH pipeline does, for its verify step).

    Measured dead end (do not "optimize" this into the simhash-style
    wide aggregate): computing the seeds as ``num_hashes`` min-columns
    in one direct groupBy(doc_id) — md5 inside each aggregate
    expression — benched 4× SLOWER than this explode+narrow-agg plan
    (medians 7.4 s vs 1.8 s over 4 interleaved reps on a cached 500k-
    doc shingle input).  The explode is a cheap generated dimension
    that map-side combine collapses before the shuffle, while the wide
    form drags the expensive md5/conv evaluation into the aggregate
    update path.  simhash's wide aggregate wins for the opposite
    reasons: its per-column expressions are trivial bit ops and the
    alternative there costs a full extra shuffle.
    """
    sh = (
        shingle_sets
        if shingle_sets is not None
        else shingles(docs, text_col, shingle_n).select("doc_id", "shingle")
    )
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        F.col("shingle"),
    )
    hashed = seeded.select(
        "doc_id",
        "seed",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long").alias("h"),
    )
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def minhash_band_buckets(
    signatures: DataFrame, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket key.
    Returns (doc_id, band, band_key)."""
    banded = signatures.withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    return (
        banded.groupBy("doc_id", "band")
        .agg(F.array_sort(F.collect_list("minhash")).alias("sig"))
        .select(
            "doc_id",
            "band",
            F.md5(F.concat_ws(",", F.col("sig").cast("array<string>"))).alias(
                "band_key"
            ),
        )
    )


def lsh_candidate_pairs(
    buckets: DataFrame, max_bucket_size: int = 1000
) -> DataFrame:
    """Band buckets → candidate pairs (a < b).

    ``max_bucket_size`` caps degenerate hot buckets before the O(n²)
    pair explosion — at 100 TB a boilerplate shingle can put millions of
    docs in one bucket; dropping those buckets (they would be caught by
    the verify step's cheaper exact/threshold paths) bounds the work.

    The cap is enforced with a pre-aggregated size table joined back
    BEFORE the per-bucket doc lists are collected — a window count
    would buffer the whole mega-bucket in one task just to discard it,
    and a bucket self-join re-executes the upstream signature lineage
    once per side.  Pair generation is then the same in-array explode
    as the capped Jaccard path (fan-out bounded by cap²/2 per bucket).
    """
    sizes = (
        buckets.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(
            (F.col("bucket_n") >= 2) & (F.col("bucket_n") <= max_bucket_size)
        )
    )
    bounded = buckets.join(sizes.select("band", "band_key"), ["band", "band_key"])
    doc_lists = bounded.groupBy("band", "band_key").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ds")
    )
    return (
        doc_lists.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                            lambda y: F.struct(x.alias("a"), y.alias("b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only.

    |A∩B| via a (shingle-set ⋈ candidates) count; |A∪B| = |A|+|B|−|A∩B|.
    The candidate set is tiny relative to the corpus, so both joins
    broadcast in practice.  ``shingle_sets`` short-circuits the shingle
    recomputation when the caller already holds the distinct sets
    (they feed three consumers here — persist upstream).
    """
    sets = (
        shingle_sets
        if shingle_sets is not None
        else shingles(docs, text_col, shingle_n).distinct()
    )
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        candidates.join(
            sets.select(F.col("doc_id").alias("a"), "shingle"), "a"
        )
        .join(sets.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("n_b")), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_duplicates_minhash(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: (a, b, jaccard) near-dup pairs.

    The distinct shingle sets are materialized ONCE and feed both the
    signature hashing and the verify step's three consumers — without
    the persist the explode→distinct lineage runs four times.
    ``shingle_sets`` accepts an already-distinct, already-MATERIALIZED
    (doc_id, shingle) relation when the caller holds one (the caller
    then owns its lifecycle; nothing is persisted here for it) — the
    audit rows score the LSH and exact pipelines over the same corpus,
    and sharing the one distinct-shingle relation saves a full
    shingle explode+distinct pass per extra pipeline."""
    if shingle_sets is not None:
        sets = shingle_sets
    else:
        sets = (
            shingles(docs, text_col, shingle_n)
            .select("doc_id", "shingle")
            .distinct()
            .persist()
        )
        # Materialize BOTH caches eagerly: their consumers are
        # independent stages of the one final job, and concurrent
        # stages each recompute an unpopulated cache (the recompute
        # multiplicity varies with scheduling — measured as bimodal
        # 3 s / 10 s / 29 s runs of this operator under host load).
        # Two scalar-count jobs buy a deterministic single
        # materialization.
        sets.count()
    sigs = minhash_signatures(
        docs, text_col, num_hashes, shingle_n, shingle_sets=sets
    )
    # Persist the bucket relation (docs × bands rows — tiny): the
    # candidate step has three consumers (size table, bounded join,
    # doc lists) that would otherwise each re-execute the md5
    # signature chain.
    buckets = minhash_band_buckets(sigs, rows_per_band).persist()
    buckets.count()
    cands = lsh_candidate_pairs(buckets)
    return jaccard_verify(
        docs, cands, text_col, shingle_n, threshold, shingle_sets=sets
    )


def edit_distance_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_distance: int = 64,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Fuzzy near-dup pairs by bounded EDIT DISTANCE: MinHash-LSH
    blocking (same banding as :func:`near_duplicates_minhash`) for
    candidates, then an exact Levenshtein verify on the candidate
    texts only — (a, b, dist) with ``dist <= max_distance``.

    Scale shape: candidate generation is the audited banded equi-join
    with the hot-bucket cap, so the quadratic step never happens; the
    verify uses Spark's THRESHOLD Levenshtein (``levenshtein(l, r, k)``,
    O(len·k) banded DP instead of O(len²), returns -1 past k) and
    touches only candidate pairs, each joined to its two texts by id.
    Character caveat for cross-engine checks: Spark edits CODE POINTS
    while DuckDB's ``levenshtein`` edits UTF-8 BYTES — identical on
    ASCII corpora (the oracle-checked regime), divergent on multibyte
    text.
    """
    sigs = minhash_signatures(docs, text_col, num_hashes, shingle_n)
    buckets = minhash_band_buckets(sigs, rows_per_band).persist()
    buckets.count()
    cands = lsh_candidate_pairs(buckets)
    ta = docs.select(F.col("doc_id").alias("a"), F.col(text_col).alias("__ta"))
    tb = docs.select(F.col("doc_id").alias("b"), F.col(text_col).alias("__tb"))
    return (
        cands.join(ta, "a")
        .join(tb, "b")
        .select(
            "a",
            "b",
            F.levenshtein("__ta", "__tb", max_distance).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_distance))
    )


def simhash_near_dupes(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    materialize: bool | str = True,
) -> DataFrame:
    """EAGER by default — executes Spark jobs at construction (pass
    ``materialize=False`` for lazy composition / plan inspection,
    ``"reliable"`` for the executor-churn tier —
    ``operators/lifecycle.py``).
    SimHash near-dup pairs: (a, b, hamming) where the fingerprints
    differ in ≤ ``max_hamming`` bits.

    Pigeonhole banding: the ``bits``-bit fingerprint splits into
    ``max_hamming + 1`` contiguous bands.  Two fingerprints within
    hamming distance ``max_hamming`` must agree exactly on at least one
    band, so an equi-join on (band, band_value) finds every qualifying
    pair without ever materialising the O(n²) cross product — the join
    keys are high-cardinality band values, the classic scale-out
    blocking scheme (Manku et al., WWW'07 §3).  Exactness is preserved
    (pigeonhole is a guarantee, not a heuristic); ``distinct`` collapses
    pairs that agree on several bands.

    ``max_bucket_size`` optionally drops degenerate hot buckets (e.g.
    the all-zeros band from boilerplate shingles) before the pair
    explosion; ``None`` keeps the result exact.

    Delegates to :func:`hamming_banded_pairs` — the banding kernel is
    hash-agnostic and also serves the image dHash near-dup row.
    """
    return hamming_banded_pairs(
        simhash(docs, text_col, bits),
        bits=bits,
        max_hamming=max_hamming,
        hash_col="simhash",
        max_bucket_size=max_bucket_size,
        materialize=materialize,
    )


def hamming_banded_pairs(
    fp: DataFrame,
    bits: int,
    max_hamming: int,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_bucket_size: int | None = None,
    materialize: bool | str = True,
) -> DataFrame:
    """EAGER by default — executes Spark jobs at construction (the
    funnel/triangles lifecycle rule; ``materialize="reliable"`` cuts
    the pair result with persist+count instead of localCheckpoint —
    ``operators/lifecycle.py``): generic pigeonhole-banded
    Hamming pair search over any (id, ``bits``-bit hash) relation —
    the kernel behind ``simhash_near_dupes`` (text) and the image
    dHash near-dup row (`multimodal.png_dhash` fingerprints).

    The fingerprint relation feeds both sides of the band self-join —
    it is persisted (id + one long per row, tiny), the pair result is
    eagerly localCheckpointed, and the cache is released before
    returning, so no persisted relation outlives the call (the
    pagerank-leak class fixed r11).  ``materialize=False`` returns the
    TRULY lazy plan — no persist, no job — for inspection/plan-guards
    and lazy composition (the fingerprint subtree then appears once
    per join side; callers running it hot should persist fp
    themselves).
    """
    n_bands = max_hamming + 1
    if n_bands > bits:
        # Zero-width bands (band_val 0 for every row) would collapse
        # the equi-join into an all-pairs explosion — refuse loudly.
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_bands} bands over "
            f"only {bits} hash bits; require max_hamming + 1 <= bits"
        )
    if materialize:
        fp = fp.persist()
        fp.count()
    bounds = [round(i * bits / n_bands) for i in range(n_bands + 1)]
    banded = fp.select(
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(
                            f"({hash_col} >> {bounds[i]}) & "
                            f"{(1 << (bounds[i + 1] - bounds[i])) - 1}"
                        ).alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(
        "__id",
        "__h",
        F.col("bv.band").alias("band"),
        F.col("bv.band_val").alias("band_val"),
    )
    if max_bucket_size is not None:
        banded = banded.withColumn(
            "bucket_n",
            F.count(F.lit(1)).over(Window.partitionBy("band", "band_val")),
        ).filter(F.col("bucket_n") <= max_bucket_size)
    a = banded.select(
        "band", "band_val", F.col("__id").alias("a"), F.col("__h").alias("ha")
    )
    b = banded.select(
        "band", "band_val", F.col("__id").alias("b"), F.col("__h").alias("hb")
    )
    pairs = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.expr("ha ^ hb")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    if not materialize:
        return pairs
    out = cut_lineage(pairs, materialize)
    fp.unpersist()
    return out


def _capped_pair_counts(
    docs: DataFrame,
    text_col: str,
    shingle_n: int,
    max_shingle_df: int,
    new_from: int | None = None,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Shared shingle-overlap pair counting for the capped set-
    similarity family (Jaccard / containment): returns
    (a, n_a, b, n_b, n_common) where n_common counts shared shingles
    rarer than the df cap and n_a/n_b are FULL distinct-set sizes.

    THREE shuffles total, ZERO joins:
    1. groupBy(doc_id) collect_set builds each doc's
       distinct-shingle SET + its size in ONE exchange (partial
       aggregation dedupes the exploded stream map-side).  The
       set is an Aggregate output attribute, so the multiple
       downstream references (size + explode) read a stored
       value — an `array_distinct` projection alias here gets
       INLINED by projection collapse and recomputed per
       reference (measured 3× slower);
    2. one groupBy(shingle) collects (doc_id, n_sh) structs;
       hot shingles are dropped by list size (the cap bounds the
       per-row pair fan-out at cap²/2);
    3. pairs are generated with array ops CARRYING both sizes,
       so the similarity denominator needs no post-aggregation join
       back to a corpus-cardinality size table (measured: those
       two joins were the most expensive stage of the old plan,
       and a broadcast would not survive 100 TB — sizes has one
       row per document).
    """
    # No silent caps: the excluded boilerplate shingles are
    # enumerable via hot_shingles(docs, ...) with the same cap.
    logger.info(
        "capped pair counts: shingle-df cap active (df <= %d); "
        "hotter shingles are excluded from candidate generation",
        max_shingle_df,
    )
    # ``shingle_sets`` (already-distinct (doc_id, shingle), caller-
    # materialized) short-circuits the shingle scan: collect_set
    # dedupes its input anyway, so building doc sets from the distinct
    # relation is value-identical to building them from the raw
    # shingle stream — and the audit rows that run BOTH this and the
    # MinHash pipeline over one corpus then pay the explode once.
    doc_sets = (
        (
            shingle_sets
            if shingle_sets is not None
            else shingles(docs, text_col, shingle_n)
        )
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shs"))
    )
    ex = doc_sets.select(
        F.struct("doc_id", F.size("shs").alias("n_sh")).alias("d"),
        F.explode("shs").alias("shingle"),
    )
    doc_lists = (
        ex.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("d")).alias("ds"))
        .filter(
            (F.size("ds") >= 2) & (F.size("ds") <= max_shingle_df)
        )
    )
    # Pair expansion as TWO codegen Generate nodes (posexplode the
    # anchor, explode the sorted tail) instead of one interpreted
    # nested transform/flatten building every pair struct in Catalyst's
    # expression interpreter — measured 1.6-1.9x faster on the pair
    # stage at sf0.1 (0.6 s vs 1.0-1.8 s over 1.13 M pairs), identical
    # output (r14 optimization; same pair set, same grouping).
    tail = F.slice(F.col("ds"), F.col("i") + F.lit(2), F.size(F.col("ds")))
    if new_from is not None:
        # b = max(a, b) (lists are sorted), so `b >= new_from` ≡
        # "pair touches the new batch".  Pruned pre-explode: the
        # old-old quadratic mass never reaches the shuffle.
        tail = F.filter(tail, lambda y: y["doc_id"] >= F.lit(new_from))
    pairs = (
        doc_lists.select("ds", F.posexplode("ds").alias("i", "x"))
        .select("x", F.explode(tail).alias("y"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("x.n_sh").alias("n_a"),
            F.col("y.doc_id").alias("b"),
            F.col("y.n_sh").alias("n_b"),
        )
    )
    return pairs.groupBy("a", "n_a", "b", "n_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int = 64,
    new_from: int | None = None,
) -> DataFrame:
    """Shingle-containment near-dup pairs: C(A,B) = |A∩B| / min(|A|,|B|)
    — the DIRECTIONAL similarity Jaccard misses when a small document
    is embedded verbatim in a much larger one (quotes, article-in-
    aggregator pages, prompt/response supersets).  A 100-shingle doc
    fully contained in a 10k-shingle page has Jaccard ≈ 0.01 but
    containment 1.0.

    Same three-shuffle zero-join capped plan as the exact Jaccard path
    (``_capped_pair_counts``); only the denominator differs.  Returns
    (a, b, containment, jaccard) above the containment threshold —
    jaccard rides along for free so downstream policy can distinguish
    "true near-dup" from "subset".
    """
    common = _capped_pair_counts(
        docs, text_col, shingle_n, max_shingle_df, new_from
    )
    return (
        common.select(
            "a",
            "b",
            F.round(
                F.col("n_common") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= threshold)
    )


def jaccard_near_dupes_exact(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
    new_from: int | None = None,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted-index
    self-join on shingles (never a cross join): pairs that share at
    least one shingle are scored |A∩B| / |A∪B|.

    At scale, ``max_shingle_df`` drops boilerplate shingles that occur
    in more than N docs before the pair explosion (the candidate pairs
    they would generate are found through their rarer shingles or the
    MinHash path).

    ``new_from`` (capped path) enables INCREMENTAL dedup: only pairs
    involving at least one document with ``doc_id >= new_from`` are
    emitted — the daily-delta regime, where re-scoring the existing
    corpus against itself every ingest would be quadratic waste.  Old
    docs still participate as comparison targets (a new doc duplicating
    an old one IS found); old-old pairs are pruned inside the in-array
    pair generation, before anything is exploded or shuffled.

    ``shingle_sets`` accepts an already-distinct, already-materialized
    (doc_id, shingle) relation (caller owns its lifecycle) so audit
    rows running this AND the MinHash pipeline over one corpus pay the
    shingle explode once — value-identical either way (collect_set /
    distinct both dedupe).
    """
    if max_shingle_df is not None:
        common = _capped_pair_counts(
            docs, text_col, shingle_n, max_shingle_df, new_from,
            shingle_sets=shingle_sets,
        )
        return common.select(
            "a",
            "b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)
    # Uncapped (oracle/exact) path below.  The shingle sets feed the
    # self-join twice plus the size table — persist so the upstream
    # lineage runs once.  Plain distinct (NOT pre-repartitioned by
    # shingle): the partial aggregation collapses the exploded shingle
    # stream map-side (~20× here) before any exchange, so the shuffled
    # relation is the small distinct set.
    if shingle_sets is not None:
        sets = shingle_sets  # caller-materialized; caller owns lifecycle
    else:
        sets = shingles(docs, text_col, shingle_n).distinct().persist()
        sets.count()  # eager: 3 independent consumers below would race
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # A hot shingle here would fan out quadratically, which is exactly
    # what the cap exists to prevent at scale.
    common = (
        sets.select(F.col("doc_id").alias("a"), "shingle")
        .join(sets.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("n_a")), "a"
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("n_b")), "b"
        )
        .select(
            "a",
            "b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    materialize: bool | str = True,
) -> DataFrame:
    """Connected components over an undirected near-dup pair graph:
    (doc_id, cluster) where ``cluster`` is the smallest doc_id in the
    component.  Only nodes that appear in at least one pair are
    returned (singletons are trivially their own component).

    Hash-min label propagation: every node starts labelled with its own
    id; each iteration pushes labels across edges and keeps the per-node
    minimum, converging in O(graph diameter) rounds — near-dup graphs
    are unions of small dense cliques, so the diameter (and round
    count) is tiny even at 100 TB.  Each round is one equi-join plus
    one min-aggregation (both shuffle on high-cardinality node ids);
    lineage is cut per round with ``localCheckpoint`` exactly like the
    EM loop in plans.lda.  For adversarial long-chain graphs the
    large-star/small-star variant (Kiveris et al., SoCC'14) halves the
    round count — same join/agg plan shape, not needed for dedup
    workloads.

    Convergence is detected by the (monotonically decreasing) sum of
    labels: one scalar agg per round, no extra join.
    """
    handles: list[DataFrame] = []
    edges = cut_lineage_round(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct(),
        materialize,
        handles,
        eager=True,
    )
    labels = cut_lineage_round(
        edges.select(F.col("src").alias("node")).distinct().select(
            "node", F.col("node").alias("cluster")
        ),
        materialize,
        handles,
        eager=True,
    )
    prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]
    for _ in range(max_iter):
        prop = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "cluster")
        labels = cut_lineage_round(
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("cluster").alias("cluster")),
            materialize,
            handles,
        )
        cur_sum = labels.agg(F.sum("cluster")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # Reliable tier: labels is persisted and already materialized by
    # the convergence agg; release every other per-round handle.
    release([h for h in handles if h is not labels])
    return labels.select(F.col("node").alias("doc_id"), "cluster")


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """The corpus after near-dup collapse: for every connected component
    of the pair graph keep only the canonical (minimum) doc_id; docs in
    no pair survive untouched.  One anti-join against the (tiny,
    cluster-member-sized) non-canonical set — the corpus itself is
    never shuffled."""
    cc = connected_components(pairs, a_col, b_col)
    losers = cc.filter(F.col("doc_id") != F.col("cluster")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def dedup_survivors_by_score(
    docs: DataFrame,
    pairs: DataFrame,
    scores: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-aware near-dup collapse: per connected component keep
    the HIGHEST-SCORING member (tie → lowest id) instead of the
    minimum id — the production policy ("keep the best copy, not the
    first"); docs in no pair survive untouched.

    ``scores`` is (id, score); members MISSING a score row rank as
    -inf (a LEFT join + coalesce — an inner join would silently
    delete every unscored member and skip fully-unscored clusters;
    with all scores absent the policy degrades to min-id, matching
    :func:`dedup_survivors`).  Same scale shape as that function:
    components and the arg-max run on the pair-member relation
    (tiny — cluster members only, joined to their scores by id), and
    the corpus itself meets only one left-anti join against the
    loser set, never a shuffle."""
    cc = connected_components(pairs, a_col, b_col)
    members = cc.join(
        scores.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).alias("__score"),
        ),
        "doc_id",
        "left",
    ).withColumn(
        "__score",
        F.coalesce(F.col("__score"), F.lit(float("-inf"))),
    )
    # Two-stage arg-max (max score, then min id among the maximal):
    # id-type agnostic, unlike a max(struct(score, -id)) whose unary
    # minus silently requires numeric ids while the rest of the dedup
    # family accepts any orderable id type (ADVICE r9 #4).  Both
    # stages run on the tiny cluster-member relation.
    top = members.groupBy("cluster").agg(F.max("__score").alias("__smax"))
    best = (
        members.join(top, "cluster")
        .filter(F.col("__score") == F.col("__smax"))
        .groupBy("cluster")
        .agg(F.min("doc_id").alias("__keep"))
    )
    losers = (
        cc.join(best, "cluster")
        .filter(F.col("doc_id") != F.col("__keep"))
        .select("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti")


def hot_shingles(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    max_shingle_df: int = 100,
) -> DataFrame:
    """Audit companion to ``jaccard_near_dupes_exact``'s
    ``max_shingle_df`` cap: the boilerplate shingles the cap excludes,
    with their document frequency.  At 100 TB this is the report a
    pipeline owner reviews before trusting the near-dup pass."""
    sets = shingles(docs, text_col, shingle_n).distinct()
    return (
        sets.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .filter(F.col("sdf") > max_shingle_df)
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """Per-doc SimHash over term-frequency-weighted 32-bit token hashes.

    Classic Charikar scheme: each token votes ±count on each bit of its
    hash; the fingerprint sets bits with positive vote sums.

    Plan: the per-bit votes are ``bits`` conditional-sum columns in ONE
    direct ``groupBy(doc_id)`` aggregation over the exploded token
    instances — not an exploded (doc_id, bit) relation (``bits``× the
    rows), and not a (doc_id, term) tf pre-count either: a ±1 vote per
    token INSTANCE sums to exactly the ±cnt vote of the tf-weighted
    scheme, so the per-term counting shuffle is pure overhead.  The
    map-side partial collapses straight to one 32-column row per doc
    per partition; the only shuffle moves ~P×D tiny partial rows.
    (Cost: md5 runs per instance instead of per distinct term — cheap
    codegen vs a full extra shuffle of the token relation; measured
    31.0 s → 4.15 s at the 500k-doc tier of SCALING_r04_100x.json.)
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias(
            "term"
        ),
    )
    hashed = toks.withColumn(
        "h", F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
    )
    # Branch-free votes: ±1 as (2·bit − 1) — arithmetic only,
    # no per-bit conditional in the 32-wide aggregate.
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"((h >> {i}) & 1) * 2 - 1")).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    fingerprint = F.lit(0).cast("long")
    for i in range(bits):
        fingerprint = fingerprint + F.when(
            F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0))
    return bit_sums.select("doc_id", fingerprint.alias("simhash"))


def segment_dedup(
    docs: DataFrame,
    width: int = 8,
    scope: str = "corpus",
    text_col: str = "text",
) -> DataFrame:
    """Segment-level exact dedup WITH text reconstruction — the
    paragraph-dedup step of a RefinedWeb/CCNet-style pipeline, adapted
    to whitespace corpora (fixed ``width``-token segments stand in for
    paragraphs; the reference corpus carries no paragraph breaks).

    Each document is cut into consecutive non-overlapping segments; a
    segment survives iff it is the FIRST occurrence of its content —
    corpus-wide (``scope='corpus'``, cross-document boilerplate
    removal) or within its own document (``scope='doc'``, intra-doc
    repetition removal à la the Gopher/Rae-et-al. repeated-passage
    rules).  Survivors are re-joined in segment order into
    ``dedup_text``.

    Scale plan (100 TB): one zero-shuffle posexplode; ONE groupBy on
    the 128-bit md5 segment digest (uniform key, map-side partial agg
    — the raw segment text never shuffles for the dedup decision, only
    for the join-back); one equi-join of the segment relation against
    the first-occurrence relation on the digest; one per-doc rebuild
    groupBy whose state is bounded by the document length.  No global
    window, no driver state.  Doc scope keeps everything doc-local:
    the digest groupBy key is (doc_id, digest), so segments of one
    document land in one partition and nothing cross-document moves.
    """
    if scope not in ("corpus", "doc"):
        raise ValueError("scope must be 'corpus' or 'doc'")
    base = docs.select(
        "doc_id",
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("t"),
    ).filter(F.size("t") > 0)
    segs = base.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(1), F.size("t"), F.lit(width))
        ).alias("seg_idx", "s"),
        "t",
    ).select(
        "doc_id",
        "seg_idx",
        F.concat_ws(" ", F.slice("t", F.col("s"), F.lit(width))).alias("seg"),
    )
    segs = segs.withColumn("k", F.md5("seg"))
    if scope == "corpus":
        firsts = segs.groupBy("k").agg(
            F.min(F.struct("doc_id", "seg_idx")).alias("first_pos")
        )
        kept = segs.join(firsts, "k").filter(
            F.struct("doc_id", "seg_idx") == F.col("first_pos")
        )
    else:
        firsts = segs.groupBy("doc_id", "k").agg(
            F.min("seg_idx").alias("first_idx")
        )
        kept = segs.join(firsts, ["doc_id", "k"]).filter(
            F.col("seg_idx") == F.col("first_idx")
        )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda x: x["seg"],
            ),
        ).alias("dedup_text"),
    )
    totals = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments")
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.col("n_segments").cast("int").alias("n_segments"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        (F.col("n_segments") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_dropped"),
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
    )


def exact_substring_dedup(
    docs: DataFrame,
    n: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring deduplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    protocol, re-expressed relationally): any ``n``-token window whose
    content occurs elsewhere in the corpus is removed from every
    NON-canonical location — the first occurrence by (doc_id, start)
    survives — and overlapping duplicated windows merge into maximal
    removed spans via position union.  The paper builds a corpus
    suffix array; the distributed equivalent is a sliding-window
    digest join, which finds exactly the same duplicated windows for
    a fixed ``n``.

    Returns (doc_id, n_tokens, n_removed, clean_text) for every doc
    with ≥1 token; clean_text is the surviving tokens in order.

    Scale plan (100 TB): the window relation is (doc_id, start,
    digest) — the window TEXT never shuffles, only its 128-bit md5.
    One digest-keyed groupBy finds each window's canonical location
    (map-side partial min); one digest equi-join marks non-canonical
    windows; a bounded sequence explode (×n) expands them to covered
    positions; the rebuild is the same doc-keyed groupBy as
    decontaminate_spans / segment_dedup, state bounded by doc length.
    No window function over the corpus, no driver state.
    """
    from mr_lda_spark.operators.textops import _tokens

    base = docs.select(
        "doc_id", _tokens(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") > 0)
    idx = F.sequence(F.lit(1), F.size("toks") - (n - 1))
    mk = lambda i: F.md5(  # noqa: E731
        F.concat_ws(" ", F.slice("toks", i, F.lit(n)))
    )
    windows = base.filter(F.size("toks") >= n).select(
        "doc_id",
        F.posexplode(F.transform(idx, mk)).alias("p0", "k"),
    ).select("doc_id", (F.col("p0") + 1).alias("start"), "k")
    firsts = windows.groupBy("k").agg(
        F.min(F.struct("doc_id", "start")).alias("first_pos")
    )
    nonfirst = windows.join(firsts, "k").filter(
        F.struct("doc_id", "start") != F.col("first_pos")
    )
    bad_pos = nonfirst.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + (n - 1))
        ).alias("pos"),
    ).distinct()
    ptoks = base.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    return (
        ptoks.join(bad_pos, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("clean_text"),
        )
        .join(
            base.select("doc_id", F.size("toks").alias("n_tokens")),
            "doc_id",
            "right",
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    block_chars: int = 8,
    key_chars: int = 24,
    max_distance: int = 64,
) -> DataFrame:
    """Blocked sorted-neighborhood near-dup pairs — the classic record
    -linkage alternative to LSH blocking: normalize each text to a
    sort key (lowercased, non-alphanumerics stripped, first
    ``key_chars`` chars), sort WITHIN each ``block_chars``-prefix
    block, and compare each record only to its ``window`` successors,
    verified by threshold Levenshtein on the full text.

    Scale shape: the sort is per-block (window partitioned by the
    block prefix — never a global single-task sort); the window pass
    sees only (doc_id, sort-key) — texts join back BY ID afterwards,
    so the heavy column never rides the sort shuffle; candidate count
    is ≤ window·n by construction (skew-immune: a hot block caps each
    member at ``window`` pairs, unlike an equi-join block which goes
    quadratic); the verify is Spark's banded O(len·k) threshold
    Levenshtein on candidates only.  Pairs are canonicalized
    (a = least id) and cannot repeat — each ordered (predecessor,
    successor-at-gap-i) pair exists for exactly one i.
    """
    skey = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""),
        1,
        key_chars,
    )
    keyed = docs.select(
        "doc_id",
        skey.alias("skey"),
    ).withColumn("blk", F.substring("skey", 1, block_chars))
    w = Window.partitionBy("blk").orderBy("skey", "doc_id")
    leads = keyed.select(
        "doc_id",
        *[
            F.lead("doc_id", i).over(w).alias(f"_n{i}")
            for i in range(1, window + 1)
        ],
    )
    pair_cols = [
        leads.select(
            F.col("doc_id").alias("ia"), F.col(f"_n{i}").alias("ib")
        ).filter(F.col("ib").isNotNull())
        for i in range(1, window + 1)
    ]
    cands = pair_cols[0]
    for pc in pair_cols[1:]:
        cands = cands.unionByName(pc)
    ta = docs.select(F.col("doc_id").alias("ia"), F.col(text_col).alias("__ta"))
    tb = docs.select(F.col("doc_id").alias("ib"), F.col(text_col).alias("__tb"))
    return (
        cands.join(ta, "ia")
        .join(tb, "ib")
        .select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            F.levenshtein("__ta", "__tb", max_distance).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_distance))
    )
