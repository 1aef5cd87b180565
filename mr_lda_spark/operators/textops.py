"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (its tokenizer/stop-list machinery,
ParseCorpus.java:182-207), these are the standard corpus-curation ops a
100 TB pretraining pipeline needs: token counting, quality scoring,
language ID, document fingerprinting.  Everything is built-in-function
only (JVM-side, whole-stage codegen) — no Python UDFs in any hot path;
every op is embarrassingly parallel per document (no shuffle at all
except where noted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/symbol splitter (shared with the DuckDB oracle —
# plain character classes so Java regex and RE2 agree).
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Character-trigram language profiles (textcat / Cavnar–Trenkle style):
# the most characteristic char 3-grams of each language's function words,
# with word-boundary spaces included.  Deterministic literals so the
# DuckDB oracle reproduces the scoring bit-for-bit; at production scale
# the same plan shape ships fuller profiles (a few hundred trigrams per
# language) through the identical broadcast-literal expression.
# zh uses tone-numbered pinyin trigrams (the romanized convention of the
# test corpus); han-script text is handled by the script-aware analyzer
# (operators.analyzers.cjk_bigram) before language scoring.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (
        " th", "the", "he ", "ing", "ng ", " an", "and", "nd ",
        " of", "of ", " to", "to ", " in", "ion", "ed ", "er ",
        " is", "is ", "at ", " it", "it ", " wa", "was", " be",
    ),
    "es": (
        " de", "de ", " la", "la ", " el", "el ", "que", "ue ",
        " qu", "os ", " es", "es ", "ión", "ón ", "nte", " en",
        "en ", "ado", "da ", " se", "ar ", " co", "con", " un",
    ),
    "de": (
        "der", "die", "ie ", " di", "das", " da", "und", " un",
        "ein", " ei", "ich", "ch ", "sch", "ung", " ge", "cht",
        "ist", "st ", "ten", "den", " au", "auf", "ber", " zu",
    ),
    "fr": (
        " le", "le ", "les", " la", " de", "de ", "des", "est",
        " et", "et ", "ent", "nt ", "que", "ue ", " qu", "eur",
        "au ", " au", "ais", "ait", " pa", "par", "our", " da",
    ),
    "zh": (
        "de5", "shi", "hi4", "i4 ", "le5", "e5 ", "zai", "ai4",
        "he2", "e2 ", "bu4", "u4 ", "yi1", "i1 ", "ge4", "e4 ",
        "wo3", "o3 ", "ni3", "men", "en2", "ta1", "a1 ", "ng1",
    ),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(_tokens(text)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)).alias("re_tokens"),
        F.length(text).alias("n_chars"),
    )


def quality_scores(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple = ()
) -> DataFrame:
    """Heuristic quality features + a composite score.

    Classic Gopher/C4-style cheap filters: length, mean word length,
    stop-word density, digit/symbol density.  All arithmetic stays in
    codegen; score is rounded for cross-engine determinism.
    ``keep_cols`` passes extra columns through the projection so
    downstream group-wise consumers never need a corpus-sized
    join-back on doc_id.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    digit_chars = F.length(F.regexp_replace(text, "[^0-9]", ""))
    mean_word_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus spaces
    stop_ratio = stop_hits / n_tok
    digit_ratio = digit_chars / n_chars
    score = (
        F.when(n_tok < 5, 0.0)
        .otherwise(
            0.5 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
            + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
            + 0.2 * (1 - F.least(digit_ratio * 10, F.lit(1.0)))
        )
    )
    return docs.select(
        "doc_id",
        *keep_cols,
        n_tok.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def novelty_scores(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of the doc's DISTINCT
    n-gram shingles that appear in no other document — high for
    original content, near zero for template/boilerplate/near-copy
    pages.  The diversity twin of ``repetition_scores`` (which looks
    WITHIN the doc; this looks across the corpus).

    Plan: one distinct (doc, shingle) relation feeds both the corpus
    df aggregation and the per-doc counts; the df relation joins back
    on shingle (vocabulary-sized — NEVER broadcast, the
    ``bigram_lm_scores`` rule) and a final doc-keyed aggregation
    computes the unique fraction.  Corpus-linear, no state.
    """
    sh = shingles(docs, text_col, n).distinct()
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum((F.col("sdf") == 1).cast("int"))
            .cast("int")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )


def blocklist_filter(
    docs: DataFrame, blocked: list[str], text_col: str = "text"
) -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 §2.2's "bad words"
    page filter): flag documents containing ANY blocked token and count
    the hits.  Pure codegen projection — token filter against a literal
    list, no shuffle, no UDF, no state — so it composes into any scan
    at zero extra passes.

    An empty blocklist short-circuits to zero hits — ``Column.isin``
    with no arguments raises, and "nothing blocked" is a valid
    configuration, not an error."""
    if blocked:
        hits = F.size(
            F.filter(_tokens(F.col(text_col)), lambda t: t.isin(*blocked))
        )
    else:
        hits = F.lit(0)
    return docs.select(
        "doc_id",
        hits.cast("int").alias("n_blocked_hits"),
        (hits > 0).alias("blocked"),
    )


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the "repetitious text" filters every large-scale corpus pipeline
    applies): per document,

    - ``dup_token_frac``   = 1 − distinct/total tokens;
    - ``top_bigram_frac``  = instances of the most frequent 2-gram /
      total 2-grams (Gopher's top-n-gram fraction);
    - ``dup_trigram_frac`` = instances of 3-grams occurring ≥2 times /
      total 3-grams (Gopher's duplicated-n-gram fraction);
    - ``repetitive``       = top_bigram_frac > 0.18 OR
      dup_trigram_frac > 0.30 (thresholds in the Gopher table's range,
      compared on the 6-dp-rounded values so engines agree exactly).

    Plan: three doc-keyed aggregations (tokens, 2-gram counts, 3-gram
    counts — each with map-side partial agg over the explode) joined
    back on doc_id.  Nothing wider than (doc, shingle) ever shuffles
    and there is no global state, so the shape is corpus-linear at any
    scale.  Docs with zero tokens produce no row (same as the token
    explode everywhere else); docs too short for an n-gram get 0.0 via
    the left joins.
    """
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tok_stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("term").alias("n_distinct"),
    )
    bi = (
        shingles(docs, text_col, 2)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bi"), F.sum("c").alias("n_bi"))
    )
    tri = (
        shingles(docs, text_col, 3)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))
            ).alias("dup_tri"),
            F.sum("c").alias("n_tri"),
        )
    )
    out = (
        tok_stats.join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_tokens"), 6
            ).alias("dup_token_frac"),
            F.round(
                F.coalesce(F.col("top_bi") / F.col("n_bi"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("dup_tri") / F.col("n_tri"), F.lit(0.0)), 6
            ).alias("dup_trigram_frac"),
        )
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_bigram_frac") > 0.18)
        | (F.col("dup_trigram_frac") > 0.30),
    )


def char_trigrams(text: Column) -> Column:
    """All character 3-grams of ``' ' || lower(text) || ' '`` (the
    padding makes word-boundary trigrams visible).  Pure codegen
    projection."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n = F.length(padded) - 2
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: padded.substr(i, F.lit(3)),
        )
    )


def language_id(
    docs: DataFrame, text_col: str = "text", sample_chars: int = 256
) -> DataFrame:
    """Char-n-gram language ID (Cavnar–Trenkle "N-Gram-Based Text
    Categorization" style): count how many of the document's character
    trigrams appear in each language's profile, argmax with a fixed
    priority order for ties, 'und' when nothing matches.

    Plan/perf design (each point measured at sf0.1):
    - Score a bounded prefix (fastText/CLD-style sampling): language
      is redundant within a document, so the cost per doc is flat at
      any corpus scale.
    - Trigram rows come from a broadcast cross join with a tiny
      position table and a native ``substr(p, pos, 3)`` — NOT from
      higher-order array lambdas, which are interpreted (~5µs/element,
      measured 5-10× slower end-to-end).  Everything here stays inside
      whole-stage codegen, and the 120-literal membership test folds
      to an InSet hash probe.
    - Hits are counted in one ``groupBy(doc_id)`` aggregation: the
      Aggregate evaluates each scan exactly once and is a hard
      optimizer barrier, so a filter or join on pred_lang cannot
      re-inline the scoring expressions (a projection-only form
      re-evaluates them ~35× per row under predicate pushdown).  The
      explode side is doc-local, so partial aggregation collapses it
      map-side: one narrow one-row-per-doc shuffle."""
    return _attach_pred_lang(
        docs.select("doc_id"),
        _language_hits_agg(docs, text_col, sample_chars),
    )


def _language_hits_agg(
    docs: DataFrame, text_col: str = "text", sample_chars: int = 256
) -> DataFrame:
    """The (doc_id, hits_<lang>…) aggregate — language_id's shared
    kernel (all the plan/perf reasoning in language_id's docstring
    lives HERE).  Docs with no profile trigram at all are ABSENT from
    the output; consumers left-join onto a one-row-per-doc spine and
    coalesce to zero (:func:`_attach_pred_lang`)."""
    langs = list(LANG_TRIGRAMS)
    union_profile = sorted({t for p in LANG_TRIGRAMS.values() for t in p})
    padded = F.concat(
        F.lit(" "), F.lower(F.substring(F.col(text_col), 1, sample_chars)), F.lit(" ")
    )
    tri_rows = (
        docs.select("doc_id", padded.alias("p"))
        .select(
            "doc_id",
            "p",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("p") - 2, F.lit(1)))
            ).alias("pos"),
        )
        .select(
            "doc_id", F.col("p").substr(F.col("pos"), F.lit(3)).alias("t")
        )
        .filter(F.col("t").isin(*union_profile))
    )
    return tri_rows.groupBy("doc_id").agg(
        *[
            F.count(F.when(F.col("t").isin(*LANG_TRIGRAMS[lang]), 1))
            .cast("int")
            .alias(f"hits_{lang}")
            for lang in langs
        ]
    )


def _attach_pred_lang(spine: DataFrame, agg: DataFrame) -> DataFrame:
    """Left-join the hit counts onto a ONE-ROW-PER-DOC spine (extra
    spine columns are carried through) and derive ``pred_lang`` —
    argmax with the fixed tie order, 'und' on zero hits.  Factored out
    of language_id so a pipeline that already scans the corpus for
    another per-doc projection (curation's quality spine) can attach
    language predictions with its ONE existing doc-keyed join instead
    of paying a second corpus join against language_id's own
    doc_id-only spine — same values by construction (both spines are
    exactly one row per doc_id)."""
    langs = list(LANG_TRIGRAMS)
    carried = [c for c in spine.columns if c != "doc_id"]
    # Left join back: docs with no profile trigram at all → zero hits.
    with_hits = (
        spine.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            *carried,
            *[
                F.coalesce(F.col(f"hits_{lang}"), F.lit(0)).alias(f"hits_{lang}")
                for lang in langs
            ],
        )
    )
    with_best = with_hits.withColumn(
        "_best", F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    )
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"hits_{lang}") == F.col("_best"), F.lit(lang)).otherwise(
            pred
        )
    pred = F.when(F.col("_best") == 0, F.lit("und")).otherwise(pred)
    return with_best.select(
        "doc_id",
        *carried,
        *[f"hits_{lang}" for lang in langs],
        pred.alias("pred_lang"),
    )


def npmi_coherence(
    docs: DataFrame,
    word_sets: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Topic-coherence via normalized PMI over document co-occurrence —
    the metric the reference computes with the external
    `topic_interpretability` tool (reference README.md:226-276),
    implemented in-engine.

    ``word_sets``: (set_id INT, term STRING) — e.g. each topic's top-k
    words.  For every unordered pair (a < b) within a set:

        npmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) / −ln p(a,b)

    with p from document frequencies (+1 smoothing on the joint).
    Returns per-set mean npmi: (set_id, n_pairs, mean_npmi).

    Plan: one distinct (doc, term) projection of the corpus filtered
    to the sets' vocabulary (broadcast semi-join) → df counts + a
    self-join on doc_id for joint counts — co-occurrence work is
    proportional to docs × set-vocabulary, never the full corpus.
    """
    n_docs = docs.count()
    vocab = word_sets.select("term").distinct()
    occ = (
        docs.select(
            "doc_id",
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .join(F.broadcast(vocab), "term", "left_semi")
        .distinct()
    )
    dfreq = occ.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    pairs = (
        word_sets.alias("x")
        .join(word_sets.alias("y"), "set_id")
        .filter(F.col("x.term") < F.col("y.term"))
        .select("set_id", F.col("x.term").alias("a"), F.col("y.term").alias("b"))
    )
    joint = (
        occ.alias("oa")
        .join(occ.alias("ob"), "doc_id")
        .filter(F.col("oa.term") < F.col("ob.term"))
        .groupBy(F.col("oa.term").alias("a"), F.col("ob.term").alias("b"))
        .agg(F.count(F.lit(1)).alias("joint_df"))
    )
    scored = (
        pairs.join(dfreq.select(F.col("term").alias("a"), F.col("df").alias("df_a")), "a")
        .join(dfreq.select(F.col("term").alias("b"), F.col("df").alias("df_b")), "b")
        .join(joint, ["a", "b"], "left")
        .withColumn("joint_df", F.coalesce("joint_df", F.lit(0)))
        .withColumn("p_a", F.col("df_a") / n_docs)
        .withColumn("p_b", F.col("df_b") / n_docs)
        .withColumn("p_ab", (F.col("joint_df") + 1.0) / n_docs)
        .withColumn(
            "npmi",
            F.log(F.col("p_ab") / (F.col("p_a") * F.col("p_b")))
            / -F.log(F.col("p_ab")),
        )
    )
    return scored.groupBy("set_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("npmi"), 6).alias("mean_npmi"),
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Explode each doc into its n-token shingles (1-based positions so
    the DuckDB oracle matches exactly).  Docs shorter than n tokens are
    dropped.  ``id_cols`` names the carried key columns — ("doc_id",)
    for batch corpora, a group label like ("source",) for STREAMS,
    which cannot join labels back later the way batch does; the
    streaming shingle helpers are thin wrappers over this one function
    so batch and stream tokenize identically by construction.

    The token array is materialized behind a Filter barrier on
    purpose: a single-select formulation lets projection collapse
    inline the tokenize `split` into every `element_at` of the shingle
    lambda (3 re-splits per shingle — measured ~13× slower at
    sf0.1)."""
    toks = _tokens(F.col(text_col))
    with_toks = docs.select(*id_cols, toks.alias("toks")).filter(
        F.size("toks") >= n
    )
    idx = F.sequence(F.lit(1), F.size("toks") - (n - 1))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("toks", i + j) for j in range(n)]
    )
    return with_toks.select(
        *id_cols,
        F.explode(F.transform(idx, lambda i: shingle(i))).alias("shingle"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-windowed chunks with overlap — the
    standard context-window preparation step of a pretraining pipeline.

    Chunks start every ``chunk_tokens − overlap`` tokens; the last
    chunk may be short.  Pure higher-order-function projection — zero
    shuffle, embarrassingly parallel.

    Returns (doc_id, chunk_index, chunk_start, n_chunk_tokens, chunk).
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = _tokens(F.col(text_col))
    with_toks = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    # 1-based start positions: 1, 1+stride, ... while start <= n_tokens.
    starts = F.sequence(
        F.lit(1), F.size("toks"), F.lit(stride)
    )
    chunked = with_toks.select(
        "doc_id",
        "toks",
        F.size("toks").alias("n_tokens"),
        F.posexplode(starts).alias("chunk_index", "chunk_start"),
    )
    return chunked.select(
        "doc_id",
        "chunk_index",
        "chunk_start",
        F.least(
            F.lit(chunk_tokens), F.col("n_tokens") - F.col("chunk_start") + 1
        ).alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice("toks", F.col("chunk_start"), F.lit(chunk_tokens))
        ).alias("chunk"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: min-hash over n-gram shingles (the 1-hash
    special case of MinHash — a winnowing-style content fingerprint).
    Identical / near-identical docs collide; no shuffle besides the
    per-doc groupBy."""
    sh = shingles(docs, text_col, n)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle"))).alias("fingerprint"),
        F.count_distinct(F.col("shingle")).alias("n_shingles"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Eval-set decontamination: flag every training doc that shares at
    least one n-token shingle with an evaluation corpus (the GPT-3 /
    PaLM n-gram-overlap protocol; they use 8-13-gram windows — ``n`` is
    the knob).

    Plan: the eval n-gram set is tiny relative to the corpus, so it is
    deduplicated and BROADCAST into a map-side hash join against the
    training corpus's exploded shingles — the 100 TB side never
    shuffles; the only exchanges are over join SURVIVORS (the
    distinct that de-duplicates repeated (doc, shingle) overlaps runs
    AFTER the map-side join, so it shuffles matches, not the corpus —
    r9 fix: the old distinct-before-join shape shuffled every corpus
    shingle and silently broke this docstring's claim) and the
    per-doc overlap count.  Returns every training doc with its
    overlap count and a boolean flag.
    """
    doc_ng = shingles(docs, text_col, n)
    ev_ng = shingles(eval_docs, text_col, n).select("shingle").distinct()
    overlap = (
        doc_ng.join(F.broadcast(ev_ng), "shingle")
        .select("doc_id", "shingle")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    bits_per_key: int = 12,
    n_hashes: int = 6,
) -> DataFrame:
    """``decontaminate`` with the eval n-gram set carried as a Bloom
    bitset instead of broadcast strings — EXACTLY the same output (the
    verify join removes Bloom false positives), built for eval suites
    past the string-broadcast cliff: 10M n-grams is ~1 GB of broadcast
    strings but a ~15 MB bitset at the default sizing.

    Plan: eval shingles hash JVM-side into the bitset
    (``operators/bloom.py`` — the driver collects the word list, never
    the n-grams); the corpus side's exploded shingles pass an
    Arrow-vectorized k-probe membership test, and only the surviving
    candidates (true overlaps + ~0.5^n_hashes fp noise) enter the
    exact verify join and per-doc count.  The verify join is left to
    the optimizer ON PURPOSE (no broadcast hint): past the cliff it
    must run as a shuffle join of two pre-shrunk sides — candidates ×
    eval — which is exactly what a plain exploded-shingle join could
    not do without shuffling the full corpus.
    """
    from .bloom import bloom_build, bloom_prefilter

    # No distinct on the corpus side before the prefilter: the whole
    # point is that the Bloom test prunes MAP-SIDE, so the only
    # corpus-shingle shuffle is the survivors' dedup (r9 fix — the
    # old distinct-before-prefilter shape shuffled every corpus
    # shingle first, paying the exact cost this operator exists to
    # avoid).
    doc_ng = shingles(docs, text_col, n)
    ev_ng = (
        shingles(eval_docs, text_col, n).select("shingle").distinct()
    ).persist()
    n_keys = ev_ng.count()  # eval-sized; also materializes the persist
    words, m = bloom_build(
        ev_ng, "shingle", n_keys, bits_per_key, n_hashes
    )
    candidates = bloom_prefilter(doc_ng, "shingle", words, m, n_hashes)
    overlap = (
        candidates.join(ev_ng, "shingle")
        .select("doc_id", "shingle")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    out = (
        docs.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )
    return out


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document top-k terms by tf-idf (idf = ln(N/df), the plain
    Robertson form; ties broken by term for determinism).

    Plan: one groupBy for tf, one for df (both with map-side partial
    aggregation over the exploded tokens), the scalar corpus size N
    joined in as a broadcast literal row, and a per-doc rank window.
    The corpus is read once; nothing larger than (doc, term) ever
    shuffles.

    The tf ⋈ df join deliberately carries NO broadcast hint: the df
    relation is vocabulary-sized, and a web-scale corpus has billions
    of distinct tokens — a forced broadcast OOMs the driver exactly
    when the corpus is large (same reasoning as ``bigram_lm_scores``'s
    never-broadcast model side).  A plain shuffle join on ``term``
    co-partitions with the df aggregation's own exchange, and AQE will
    still pick a broadcast at runtime when df is genuinely small.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document n-gram language-model perplexity (CCNet's quality
    gate, KenLM-style, as an exact relational plan): train an add-α
    bigram model on the corpus, score every document by its average
    bigram log-probability.  Gibberish / boilerplate-shuffled text
    scores high-perplexity; fluent-for-this-corpus text scores low —
    the classic LM quality filter, here with no external model
    artifact and a full SQL oracle (unlike the LDA-based
    ``curation.perplexity_filter``, whose model is iterative).

    P(w2|w1) = (c(w1 w2) + α) / (c(w1 ·) + α·V), V = distinct tokens.

    Plan: the bigram relation (2-gram shingles, split once behind the
    shingle Filter barrier) feeds both the model aggregation and the
    scoring join; c(w1 w2) and c(w1 ·) are plain groupBy counts, V a
    broadcast scalar.  The scoring join shuffles on (w1, w2) — model-
    sized right side, never broadcast (the bigram vocabulary grows
    with the corpus).  Returns (doc_id, n_bigrams, avg_logprob,
    perplexity); docs with <2 tokens are dropped (no bigram support).
    """
    sp = F.split(F.col("shingle"), " ")
    # pairs feeds THREE consumers (c12, c1, the scoring join) — persist
    # so the split/explode lineage runs once, not three times.
    # Deliberately NOT unpersisted (ADVICE r7): the returned DataFrame
    # is lazy and reads the cache on evaluation; the entry is
    # bigram-instance-sized and LRU-evicted under storage pressure
    # (long-lived sessions can spark.catalog.clearCache() between
    # queries).
    pairs = (
        shingles(docs, text_col, 2)
        .select(
            "doc_id",
            sp.getItem(0).alias("w1"),
            sp.getItem(1).alias("w2"),
        )
        .persist()
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = docs.select(
        F.explode(_tokens(F.col(text_col))).alias("term")
    ).agg(F.count_distinct("term").alias("v"))
    lp = F.log(
        (F.col("c12") + alpha) / (F.col("c1") + alpha * F.col("v"))
    )
    return (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
            F.round(F.exp(-F.avg(lp)), 6).alias("perplexity"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval scoring: top-k documents for a bag-of-words
    query (Robertson/Sparck-Jones idf with the +1 floor, the Lucene/
    Okapi default) — the workhorse of quality-by-retrieval curation
    (e.g. "find pretraining docs similar to a trusted seed set").

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).

    Plan: doc length is a pure projection (``size`` of the token
    array — no explode, no shuffle); the token explode is filtered to
    the query terms BEFORE any aggregation, so the only (doc, term)
    shuffle carries query-matching tokens only.  df (|q| rows) and the
    (N, avgdl) scalar row broadcast; the doc-length join is the one
    corpus-keyed shuffle.  Scores round to 6dp and tie-break on doc_id
    so the top-k frontier is deterministic across engines.
    """
    lens = docs.select(
        "doc_id", F.size(_tokens(F.col(text_col))).alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qtoks = docs.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qtoks.groupBy("term").agg(
        F.count_distinct(F.col("doc_id")).alias("df")
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(lens, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def top_ngrams(
    docs: DataFrame, text_col: str = "text", n: int = 3, k: int = 20
) -> DataFrame:
    """Global heavy hitters: the k most frequent n-gram shingles by
    document frequency (ties broken by shingle).  One partial-agg
    shuffle + a single-partition top-k (TakeOrderedAndProject — never a
    full sort of the tail)."""
    sh = shingles(docs, text_col, n).distinct()
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("sdf"))
        .orderBy(F.desc("sdf"), F.asc("shingle"))
        .limit(k)
    )


# Shared with the DuckDB oracle — plain character classes only, so Java
# regex and RE2 agree on every match.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
PII_PHONE = "[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]"
PII_URL = "https?://[^ ]+"


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: count and redact emails / phone numbers / URLs
    (each span replaced with a typed sentinel token).  Pure codegen
    projection — zero shuffle, embarrassingly parallel per doc; the
    redaction regexes are deliberately simple character-class patterns
    shared verbatim with the oracle."""
    text = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"),
            PII_URL,
            "<URL>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_URL), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).alias("n_phones"),
        clean.alias("clean_text"),
    )


def remove_boilerplate_spans(
    docs: DataFrame,
    span_tokens: int = 16,
    max_span_occurrences: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate removal, the C4 rule ("discard any
    three-sentence span occurring more than once") adapted to fixed
    token windows: segment every document into non-overlapping
    ``span_tokens``-token spans, count each span's occurrences across
    the whole corpus, drop spans seen more than
    ``max_span_occurrences`` times, and reassemble the surviving text
    in order.

    Plan: span occurrence counting is a window count over the span
    hash (one hash shuffle of (doc, span) rows — the same shape as
    C4's global line-hash groupBy), reassembly is one groupBy(doc)
    with an ordered string_agg.  Two shuffles total; nothing wider
    than the exploded spans ever moves, and the span *hash* (not the
    span text) is the shuffle key at scale.

    Returns (doc_id, clean_text, n_spans_kept, n_spans_dropped).
    """
    from pyspark.sql import Window

    toks = _tokens(F.col(text_col))
    with_toks = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.sequence(F.lit(1), F.size("toks"), F.lit(span_tokens))
    spans = with_toks.select(
        "doc_id",
        F.posexplode(starts).alias("span_index", "span_start"),
        F.concat_ws(
            " ", F.slice("toks", F.col("span_start"), F.lit(span_tokens))
        ).alias("span"),
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy(F.md5(F.col("span"))))
    flagged = spans.select(
        "doc_id", "span_index", "span", (occ <= max_span_occurrences).alias("keep")
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct("span_index", "span"),
                        )
                    )
                ),
                lambda s: s.span,
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("int")).cast("int").alias("n_spans_kept"),
        F.sum((~F.col("keep")).cast("int")).cast("int").alias("n_spans_dropped"),
    )


def quality_model_score(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Hashed-feature linear quality classifier inference — the
    fastText-style "model-based quality filter" stage of a pretraining
    pipeline, run as a relational plan: tokens hash into
    ``n_buckets`` feature buckets, bucket weights live in a (tiny)
    weight table that is BROADCAST into a map-side join against the
    exploded corpus, and the per-document score is an exact integer
    sum pushed through a logistic link.

    The weight table here is a deterministic synthetic model
    (weight_i = ((i·2654435761) mod 1001) − 500 milli-units) so the
    oracle can rebuild it arithmetically; a real pipeline would load
    trained weights and broadcast them the same way.  Integer
    milli-unit weights make the aggregation exact (no float
    summation-order drift between engines).

    Returns (doc_id, n_tokens, raw_score, quality_prob).
    """
    spark = docs.sparkSession
    weights = spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 1001 - 500).alias("w_milli"),
    )
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    bucketed = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )
    scored = (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_milli").alias("sum_milli"),
        )
    )
    raw = F.col("sum_milli") / (F.col("n_tokens") * 1000.0)
    # raw_score's 6-dp rounding is INTEGER-exact: round-half-away of
    # (sum_milli·1000 / n_tokens) in micro-units via BIGINT arithmetic
    # in both engines.  The float round() hit an exact decimal .5
    # boundary at sf0.1 (4140/64000 = 0.0646875), where Spark's
    # repr-based HALF_UP and an engine rounding the binary double
    # (…74999…) disagree by 1e-6 — the r6 oracle-determinism class.
    raw_micro = F.expr(
        "CASE WHEN sum_milli >= 0"
        " THEN (2000 * sum_milli + n_tokens) div (2 * n_tokens)"
        " ELSE -((-2000 * sum_milli + n_tokens) div (2 * n_tokens)) END"
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        (raw_micro / F.lit(1000000.0)).alias("raw_score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6).alias(
            "quality_prob"
        ),
    )


def decontaminate_spans(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """SURGICAL eval-set decontamination (the Llama-style refinement of
    ``decontaminate``): instead of dropping a whole doc that shares an
    n-gram with the eval set, remove only the contaminated token spans
    and keep the rest.  Every token covered by ANY matching n-gram
    window goes; overlapping windows merge via position dedup.

    Returns (doc_id, n_tokens, n_removed, clean_text) for every input
    doc — clean_text is the surviving tokens in order ('' if fully
    contaminated).

    Plan: the eval n-gram set broadcasts (the corpus side never
    shuffles for the match); contaminated start positions expand to
    covered positions with a sequence explode; the rebuild is one
    corpus-keyed groupBy with an in-group position sort — same shape
    as ``remove_boilerplate_spans``."""
    toks_col = _tokens(F.col(text_col))
    base = docs.select("doc_id", toks_col.alias("toks"))
    with_sh = base.filter(F.size("toks") >= n)
    idx = F.sequence(F.lit(1), F.size("toks") - (n - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("toks", i + j) for j in range(n)]
    )
    doc_ng = with_sh.select(
        "doc_id", F.posexplode(F.transform(idx, mk)).alias("p0", "shingle")
    ).select("doc_id", (F.col("p0") + 1).alias("start"), "shingle")
    ev = shingles(eval_docs, text_col, n).select("shingle").distinct()
    bad_pos = (
        doc_ng.join(F.broadcast(ev), "shingle")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    ptoks = base.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    rebuilt = (
        ptoks.join(bad_pos, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("p"),
        )
        .select(
            "doc_id",
            "n_kept",
            F.concat_ws(" ", F.col("p.tok")).alias("clean_text"),
        )
    )
    return (
        base.select("doc_id", F.size("toks").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple = ()
) -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    cheap "is this natural text or noise/boilerplate" quality signal
    (low for repeated padding / single-char runs, ~4 bits for natural
    prose, high for base64/binary spill).  Complements
    ``quality_scores`` (token ratios) and ``repetition_scores``
    (n-gram loops) with a distribution-shape signal neither sees.

    Cross-engine determinism: H = log2(N) - (Σ c·log2 c)/N.  The only
    libm calls live in the per-(doc,char) terms, each ROUNDED to an
    integer at 1e6 scale BEFORE summation (``clogc_q`` — bigint), so
    the sum is exact integer arithmetic in any order/engine; the final
    entropy is float ops over exact integers (IEEE-exact ÷ and −, one
    log2) rounded to 4 decimals.  Residual risk is a term landing
    within ~1e-10 of a rounding boundary under a 1-ulp libm
    difference — the documented margin-mining class, negligible at
    1e6 term scale / 4-decimal output.

    Scale: explode-to-chars is corpus-linear (the shingling cost
    class); the (doc,char) groupBy map-side-combines to ≤ alphabet
    rows per doc before the doc_id shuffle, so shuffle volume is
    ~100× SMALLER than the input scan.  Empty documents produce no
    character rows and are emitted with zero entropy via the
    left join back to the doc spine.
    """
    spine = docs.select("doc_id", *keep_cols)
    ch = docs.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    per = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    doc = (
        per.select(
            "doc_id",
            "c",
            F.round(F.col("c") * F.log2("c") * 1e6, 0)
            .cast("bigint")
            .alias("t"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("int").alias("n_distinct_chars"),
            F.sum("t").alias("clogc_q"),
        )
    )
    return spine.join(doc, "doc_id", "left").select(
        "doc_id",
        *keep_cols,
        F.coalesce("n_chars", F.lit(0).cast("bigint")).alias("n_chars"),
        F.coalesce("n_distinct_chars", F.lit(0)).alias("n_distinct_chars"),
        F.coalesce("clogc_q", F.lit(0).cast("bigint")).alias("clogc_q"),
        F.when(F.col("n_chars").isNull() | (F.col("n_chars") == 0), 0.0)
        .otherwise(
            F.round(
                F.log2("n_chars")
                - F.col("clogc_q") / (F.col("n_chars") * 1e6),
                4,
            )
        )
        .alias("entropy_bits"),
    )


def source_divergence(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between the unigram
    term distributions of every pair of sources — the domain-mixture
    diagnostic (which domains are interchangeable, which add coverage)
    behind DoReMi-style mixture design and dedup-across-domain
    decisions.  0 = identical distributions, 1 = disjoint
    vocabularies.

    Decomposition that needs ONLY the inner term join: terms present
    in one side contribute p·log2(2) /2 = p/2 to JS, so
    JS = Σ_both [p/2·log2(2p/(p+q)) + q/2·log2(2q/(p+q))]
         + (2 − P_both − Q_both)/2,
    where P_both/Q_both are the shared-term probability masses —
    recoverable from the SAME join via exact integer count sums.  No
    full-outer vocabulary alignment needed.

    Determinism: per-term contributions are rounded to integers at 1e9
    scale (``js_q`` sums exactly in any order); the shared masses are
    integer counts; the final js is IEEE-exact arithmetic over those
    integers, rounded to 6 decimals.

    Scale: the joined relation is vocabulary × source-pairs — domains
    are few (tens), so this is vocabulary-sized, never corpus-sized;
    the per-source totals are a broadcast-sized dimension.  A pair
    with NO shared terms emits no row (its JS is exactly 1) — callers
    needing the dense matrix left-join against the source cross
    product and coalesce to 1.
    """
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    cnt = toks.groupBy("g", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("g").agg(F.sum("c").cast("bigint").alias("n"))
    cn = cnt.join(F.broadcast(tot), "g")
    a, b = cn.alias("a"), cn.alias("b")
    p = F.col("a.c") / F.col("a.n")
    q = F.col("b.c") / F.col("b.n")
    m2 = p + q  # = 2m
    term_js = 0.5 * (
        p * F.log2(2 * p / m2) + q * F.log2(2 * q / m2)
    )
    joined = a.join(b, "term").filter(F.col("a.g") < F.col("b.g"))
    agg = joined.groupBy(
        F.col("a.g").alias("source_a"), F.col("b.g").alias("source_b")
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_shared_terms"),
        F.sum(F.round(term_js * 1e9, 0).cast("bigint")).alias("js_q"),
        F.sum("a.c").cast("bigint").alias("shared_c_a"),
        F.sum("b.c").cast("bigint").alias("shared_c_b"),
        F.min("a.n").alias("n_a"),
        F.min("b.n").alias("n_b"),
    )
    return agg.select(
        "source_a",
        "source_b",
        "n_shared_terms",
        "js_q",
        "shared_c_a",
        "shared_c_b",
        F.round(
            F.col("js_q") / 1e9
            + (
                2
                - F.col("shared_c_a") / F.col("n_a")
                - F.col("shared_c_b") / F.col("n_b")
            )
            / 2,
            6,
        ).alias("js_bits"),
    )


def char_entropy_stateless(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple = ()
) -> DataFrame:
    """``char_entropy`` recomputed entirely WITHIN each row — fold the
    quantized c·log2(c) terms over the row's DISTINCT characters, with
    c counted by an array filter — so the plan is a pure projection:
    NO shuffle, NO aggregation state, NO join-back (plan-guarded: zero
    Exchange nodes).  Bit-identical output to the groupBy variant
    (same integer quantization, and integer addition is order-free),
    pinned by tests/test_entropy_ops.py's equivalence sweep.

    This is the variant a 100 TB scan wants (entropy becomes a free
    rider on any existing pass over the corpus) and the one a STREAM
    can run verbatim — stateless projections need no watermark, no
    state store, no output-mode constraints.  Per-row cost is
    O(distinct_chars × doc_length) array scans — alphabet-bounded, and
    deliberately scan-shaped rather than sort-shaped: higher-order
    lambdas are interpreted, so the expression stays small (Catalyst
    re-inlines collapsed projections, multiplying every subtree
    reference; a sorted run-length formulation measured ~50× slower
    here).  The groupBy variant remains for extreme doc lengths where
    the quadratic-in-alphabet row cost beats a shuffle.
    """
    text = F.col(text_col)
    cs = F.filter(F.split(text, ""), lambda c: c != "")
    n = F.size(cs)
    counts = F.transform(
        F.array_distinct(cs),
        lambda d: F.size(F.filter(cs, lambda c: c == d)),
    )
    s = F.aggregate(
        counts,
        F.lit(0).cast("bigint"),
        lambda acc, c: acc
        + F.round(c * F.log2(c) * 1e6, 0).cast("bigint"),
    )
    staged = docs.select(
        "doc_id",
        *keep_cols,
        n.cast("bigint").alias("n_chars"),
        F.size(F.array_distinct(cs)).cast("int").alias("n_distinct_chars"),
        F.when(n == 0, F.lit(0).cast("bigint")).otherwise(s).alias(
            "clogc_q"
        ),
    )
    return staged.select(
        "doc_id",
        *keep_cols,
        "n_chars",
        "n_distinct_chars",
        "clogc_q",
        F.when(F.col("n_chars") == 0, 0.0)
        .otherwise(
            F.round(
                F.log2("n_chars")
                - F.col("clogc_q") / (F.col("n_chars") * 1e6),
                4,
            )
        )
        .alias("entropy_bits"),
    )


def lexical_diversity(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-source lexical diversity: token count, vocabulary size,
    hapax (once-only) count, and the Simpson repeat probability
    Σc(c−1)/N(N−1) — the probability two tokens drawn without
    replacement are the same type (low = diverse, high = repetitive) —
    plus the type-token ratio.  The Gopher-style corpus-level
    complement of the per-doc repetition filters.

    Everything is exact: counts are integers, the Simpson numerator
    SUM runs in decimal(38,0) (c² at planetary token counts wraps
    int64 — the copurchase-lift rule) and is cast to BIGINT only at
    the output boundary (the parity standing rule: Spark decimal
    materializes as object-Decimal, DuckDB's as float64 — a raw
    decimal output can never driver-hash-match; the cast is exact
    while Σc(c−1) < 2^63, i.e. per-source token counts < 3·10⁹ —
    the shipped corpora are ≤1.5·10⁴), and the two ratios are single
    IEEE divisions of exact integers, rounded once.  A 1-token source
    defines simpson = 0.0 explicitly (Spark's non-ANSI 0/0 is NULL,
    DuckDB's is NaN — the guard keeps both engines on the same
    defined value).  One vocabulary-sized aggregation; no joins.
    """
    toks = docs.select(
        F.col(group_col).alias("source"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    cnt = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    cdec = F.col("c").cast("decimal(38,0)")
    agg = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum((F.col("c") == 1).cast("bigint"))
        .cast("bigint")
        .alias("hapax"),
        F.sum(cdec * (cdec - 1)).cast("decimal(38,0)").alias("simpson_num"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        "hapax",
        F.col("simpson_num").cast("bigint").alias("simpson_num"),
        F.when(
            F.col("n_tokens") > 1,
            F.round(
                F.col("simpson_num").cast("double")
                / (
                    F.col("n_tokens").cast("double")
                    * (F.col("n_tokens") - 1).cast("double")
                ),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("simpson"),
        F.round(F.col("vocab") / F.col("n_tokens"), 6).alias("ttr"),
    )
