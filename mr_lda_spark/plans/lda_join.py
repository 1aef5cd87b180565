"""Shuffle-join variational EM — the scale path for models too large to
broadcast (SURVEY.md §7.3 "β broadcast at scale").

The reference ships ALL of β to every mapper's heap
(DocumentMapper.java:475-536) and hits an OOM wall the paper
acknowledges (the disabled truncation code, TermReducer.java:34-38).
Spark can do the join MapReduce couldn't: here β is a *DataFrame*
(term_id, beta ARRAY<DOUBLE>[K]) that never touches the driver:

per iteration:
  1. corpus_tall ⋈ beta on term_id  (shuffle join; corpus side is
     pre-partitioned by term_id once and reused every iteration)
  2. regroup by doc_id → doc rows carrying their terms' β slices
  3. mapInPandas E-step (same sweeps as plans.lda, β read from rows)
     → γ/doc-ll rows + PARTITION-COMBINED per-term φ partials
     (size-bounded in-kernel logsumexp fold — tokens×K never hits a
     shuffle)
  4. M-step fully relational: logsumexp φ by (term, topic) → η smooth →
     per-topic normalizer → E[log β'] via an Arrow-batched digamma
     kernel → next β DataFrame (localCheckpoint, still distributed)
  5. α stats/ELBO via plain aggregations; only K+1 numbers reach the
     driver.

Cost model vs broadcast mode: two extra corpus-sized shuffles per
iteration (the β join and the φ aggregation) — the honest price when
V×K ∉ executor memory.  Use broadcast mode (plans.lda) below that
threshold.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mr_lda_spark.functions.alpha import update_alpha_vector
from mr_lda_spark.functions.special import digamma, gammaln
from mr_lda_spark.operators.lifecycle import (
    ReliableCheckpointSweeper,
    cut_corpus_lineage,
)
from mr_lda_spark.plans.lda import DEFAULT_LOG_ETA, LdaState, init_elog_beta

_JOIN_ESTEP_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("id", T.LongType()),  # doc_id | term_id
        T.StructField("vec", T.ArrayType(T.DoubleType())),
        T.StructField("ll", T.DoubleType()),
    ]
)


def beta_init_dataframe(
    spark: SparkSession, num_terms: int, num_topics: int, seed: int
) -> DataFrame:
    """Seeded initial E[log β] as a tall DataFrame.  Built driver-side
    here for determinism/test parity with broadcast mode; a from-data
    init (e.g. seeded hash of (term, topic)) drops even this one-time
    driver materialization."""
    mat = init_elog_beta(num_terms, num_topics, seed)
    rows = [(int(v), [float(x) for x in mat[v]]) for v in range(1, num_terms + 1)]
    return spark.createDataFrame(rows, schema="term_id int, beta array<double>")


def _segment_lse(flat_terms: np.ndarray, flat_vecs: np.ndarray):
    """Vectorized per-term logsumexp of (n_rows, K) log values grouped
    by ``flat_terms``: sort, reduceat max-shift, reduceat sum."""
    order = np.argsort(flat_terms, kind="stable")
    t = flat_terms[order]
    v = flat_vecs[order]
    bounds = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
    uniq = t[bounds]
    mx = np.maximum.reduceat(v, bounds, axis=0)
    seg_sizes = np.diff(np.r_[bounds, len(t)])
    seg_id = np.repeat(np.arange(len(bounds)), seg_sizes)
    sm = np.add.reduceat(np.exp(v - mx[seg_id]), bounds, axis=0)
    return uniq, mx + np.log(sm)


def _join_estep_kernel(
    alpha: np.ndarray,
    max_gamma_iter: int,
    phi_flush: int = 1 << 18,
    learning: bool = True,
    gamma_tol: float = 0.0,
):
    """E-step over doc rows that carry their own β slices
    (terms, counts, betas aligned arrays).  ``learning=False`` is the
    reference's -test mode (VariationalInferenceOptions.java:166-178):
    γ-only sweeps, no φ statistics, no α rows — only doc rows flow.

    φ sufficient statistics are combined PARTITION-LOCALLY (the same
    in-mapper-combine move as the broadcast path, plans/lda.py:103):
    instead of one row per (doc, term) — tokens × K doubles into the
    M-step shuffle, twice, because the two-pass logsumexp re-shuffles
    its input — the kernel folds each batch's per-term logsumexp into
    a dict and emits one partial row per distinct term per partition.
    Memory stays bounded: the dict flushes to output whenever it
    exceeds ``phi_flush`` terms (so a vocabulary larger than executor
    memory degrades to more partials, never to OOM), and logsumexp of
    partials is associative so the relational combine downstream is
    unchanged."""
    K = len(alpha)
    l_alpha = float(gammaln(alpha.sum()) - gammaln(alpha).sum())

    def run(batches):
        phi_acc: dict[int, np.ndarray] = {}

        def phi_frame():
            out = pd.DataFrame(
                {
                    "kind": "phi",
                    "id": np.fromiter(phi_acc, dtype=np.int64, count=len(phi_acc)),
                    "vec": list(phi_acc.values()),
                    "ll": 0.0,
                }
            )
            phi_acc.clear()
            return out

        for pdf in batches:
            n_docs = len(pdf)
            if n_docs == 0:
                continue
            term_lists = [np.asarray(t, dtype=np.int64) for t in pdf["term_ids"]]
            count_lists = [np.asarray(c, dtype=np.float64) for c in pdf["term_counts"]]
            beta_lists = [np.asarray(list(b), dtype=np.float64) for b in pdf["betas"]]
            keep = [i for i, t in enumerate(term_lists) if t.size > 0]
            if not keep:
                continue
            B = len(keep)
            lens = np.array([term_lists[i].size for i in keep])
            n_max = int(lens.max())
            terms_pad = np.zeros((B, n_max), dtype=np.int64)
            counts_pad = np.zeros((B, n_max))
            elb = np.full((B, n_max, K), DEFAULT_LOG_ETA)
            for j, i in enumerate(keep):
                terms_pad[j, : lens[j]] = term_lists[i]
                counts_pad[j, : lens[j]] = count_lists[i]
                elb[j, : lens[j]] = beta_lists[i]
            valid = counts_pad > 0
            with np.errstate(divide="ignore"):
                log_counts = np.where(valid, np.log(counts_pad), -np.inf)

            n_tokens = counts_pad.sum(axis=1)
            gamma = np.tile(alpha, (B, 1)) + n_tokens[:, None] / K
            if "gamma" in pdf.columns:
                for j, i in enumerate(keep):
                    g = pdf["gamma"].iloc[i]
                    if g is not None and len(g) == K:
                        gamma[j] = np.asarray(g, dtype=np.float64)

            lpn = None
            phi = None
            for _ in range(max_gamma_iter):
                dg = digamma(gamma)
                lp = elb + dg[:, None, :]
                m = lp.max(axis=2, keepdims=True)
                norm = m + np.log(np.exp(lp - m).sum(axis=2, keepdims=True))
                lpn = lp - norm
                phi = np.exp(lpn)
                # γ = α + Σ_w c_w φ_w in linear space (φ is a normalized
                # probability; same rewrite as plans/lda.py — saves the
                # per-sweep (B, n_max+1, K) concatenate + logsumexp).
                prev_gamma = gamma
                gamma = alpha[None, :] + np.einsum(
                    "bn,bnk->bk", counts_pad, phi
                )
                if gamma_tol > 0.0 and np.max(
                    np.abs(gamma - prev_gamma) / prev_gamma
                ) < gamma_tol:
                    # Convergence-gated sweeps, same batch-max rule as
                    # the broadcast kernel (plans/lda.py).
                    break
            ll_phi = (counts_pad[:, :, None] * phi * (elb - lpn)).sum(
                axis=(1, 2)
            )
            sum_gamma = gamma.sum(axis=1)
            ll_gamma = gammaln(gamma).sum(axis=1) - gammaln(sum_gamma)
            doc_ll = l_alpha + ll_gamma + ll_phi
            alpha_contrib = digamma(gamma) - digamma(sum_gamma)[:, None]

            # Doc rows: γ (+ α contribution folded into 'vec2' via a
            # second row kind to stay relational).
            doc_ids = pdf["doc_id"].iloc[keep].astype("int64").values
            yield pd.DataFrame(
                {
                    "kind": "doc",
                    "id": doc_ids,
                    "vec": list(gamma),
                    "ll": doc_ll,
                }
            )
            if not learning:
                continue
            yield pd.DataFrame(
                {
                    "kind": "alpha",
                    "id": doc_ids,
                    "vec": list(alpha_contrib),
                    "ll": 0.0,
                }
            )
            # φ stats: per-term logsumexp within the batch, folded into
            # the partition-local accumulator (flushed size-bounded).
            contrib = lpn + log_counts[:, :, None]
            uniq, lse = _segment_lse(
                terms_pad[valid].astype(np.int64), contrib[valid]
            )
            for t, vec in zip(uniq, lse):
                prev = phi_acc.get(int(t))
                phi_acc[int(t)] = (
                    vec if prev is None else np.logaddexp(prev, vec)
                )
            if len(phi_acc) > phi_flush:
                yield phi_frame()
        if phi_acc:
            yield phi_frame()

    return run


def train_beta_join(
    spark: SparkSession,
    corpus_tall: DataFrame,
    num_terms: int,
    num_topics: int,
    max_iterations: int = 10,
    max_gamma_iter: int = 50,
    alpha_init=None,
    seed: int = 42,
    converge: float = 1e-6,
    shuffle_partitions: int | None = None,
    eta_seeds: DataFrame | None = None,
    gamma_tol: float = 0.0,
    gamma_init: DataFrame | None = None,
    symmetric_alpha: bool = False,
    corpus_checkpoint: bool | str = "local",
) -> tuple[DataFrame, LdaState]:
    """EM loop with distributed β.  ``corpus_tall`` is the encoded
    corpus (doc_id, term_id, term_count).  Returns (gamma DataFrame,
    state with driver-collected β — collected ONLY for API parity; the
    loop itself never pulls β).

    ``gamma_init`` is a (doc_id, gamma) snapshot for warm resume (the
    reference's -modelindex): iteration 1's E-step starts from the
    carried γ exactly as broadcast mode does with a gamma column on
    the corpus.

    ``eta_seeds`` is the informed-prior seed relation (topic, term_id)
    — ``informed_prior.parse_informed_prior``'s output.  With it, the
    M-step smooths seed entries at log 1000 and everything else at
    log 0.001 (InformedPrior.java:43-44) over a DENSE distributed
    V×K η relation: unlike the uninformed case, non-corpus terms'
    η mass (0.001 each) is NOT negligible in the per-topic
    normalizer, so the λ relation must cover every term — which is
    exactly what the broadcast M-step's dense matrix does, kept as a
    DataFrame here."""
    from mr_lda_spark.functions.logmath import logsumexp_agg
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    K = num_topics
    alpha = (
        np.full(K, 1.0 / K)
        if alpha_init is None
        else np.full(K, float(alpha_init))
        if np.isscalar(alpha_init)
        else np.asarray(alpha_init, dtype=np.float64).copy()
    )
    state = LdaState(alpha=alpha, elog_beta=np.zeros((0, K)))

    # Pre-partition the corpus by term_id ONCE; every iteration's β
    # join then reuses this partitioning (no corpus re-shuffle).
    # corpus_checkpoint selects the lineage-cut tier for the WHOLE
    # training lifecycle (corpus + per-iteration β/γ — a lost block of
    # any of them kills the run): operators/lifecycle.cut_corpus_lineage.
    # In reliable mode the sweeper bounds checkpoint-store disk at the
    # LIVE generation: superseded per-iteration β/γ directories are
    # deleted at the next loop top (never at supersede time — the
    # persisted E-step `out` may still re-read them on eviction).
    ckpt_gc = ReliableCheckpointSweeper(spark)
    tall = cut_corpus_lineage(
        corpus_tall.repartition(
            shuffle_partitions or spark.sparkContext.defaultParallelism,
            "term_id",
        ),
        corpus_checkpoint,
    )
    num_docs = tall.select("doc_id").distinct().count()
    state.total_tokens = float(
        tall.agg(F.sum("term_count")).collect()[0][0] or 0.0
    )

    beta_df = ckpt_gc.cut(
        beta_init_dataframe(spark, num_terms, K, seed).repartition(
            shuffle_partitions or spark.sparkContext.defaultParallelism,
            "term_id",
        ),
        corpus_checkpoint,
        slot="beta",
    )
    gamma_df = (
        None
        if gamma_init is None
        else ckpt_gc.cut(
            gamma_init.select("doc_id", "gamma"),
            corpus_checkpoint,
            slot="gamma",
        )
    )

    eta_rel = None
    if eta_seeds is not None:
        from mr_lda_spark.operators.informed_prior import (
            LOG_ETA_OTHER,
            LOG_ETA_SEED,
        )

        # Dense distributed η: every (term, topic) gets its log-prior
        # (seed overlay on the log 0.001 floor).  V×K rows, built with
        # spark.range — never on the driver.
        eta_rel = (
            spark.range(1, num_terms + 1)
            .select(F.col("id").cast("int").alias("term_id"))
            .crossJoin(
                spark.range(K).select(F.col("id").cast("int").alias("topic"))
            )
            .join(
                F.broadcast(
                    eta_seeds.select("topic", "term_id").distinct()
                    .withColumn("_seed", F.lit(True))
                ),
                ["topic", "term_id"],
                "left",
            )
            .select(
                "term_id",
                "topic",
                F.when(F.col("_seed"), F.lit(float(LOG_ETA_SEED)))
                .otherwise(F.lit(float(LOG_ETA_OTHER)))
                .alias("log_eta"),
            )
        )
        eta_rel = cut_corpus_lineage(eta_rel, corpus_checkpoint)

    digamma_udf = F.pandas_udf(
        lambda s: pd.Series(digamma(s.to_numpy())), "double"
    )

    import time as _time

    prev_elbo = None
    for _ in range(max_iterations):
        # Same per-iteration E+M wall instrumentation as broadcast
        # mode (plans/lda.py — A7/BASELINE.md sec-per-iteration
        # counters), so growth probes and benches read the loop
        # directly instead of dividing the train total.
        iter_t0 = _time.perf_counter()
        ckpt_gc.sweep()  # generation i-1 is unreachable now
        joined = tall.join(beta_df, "term_id")
        docs = joined.groupBy("doc_id").agg(
            F.collect_list("term_id").alias("term_ids"),
            F.collect_list("term_count").alias("term_counts"),
            F.collect_list("beta").alias("betas"),
        )
        if gamma_df is not None:
            docs = docs.join(gamma_df, "doc_id", "left")
        kernel = _join_estep_kernel(
            state.alpha, max_gamma_iter, gamma_tol=gamma_tol
        )
        out = docs.mapInPandas(kernel, schema=_JOIN_ESTEP_SCHEMA).persist()

        # --- M-step: fully relational β' ---
        phi = out.filter(F.col("kind") == "phi").select(
            F.col("id").cast("int").alias("term_id"),
            F.posexplode("vec").alias("topic", "log_phi"),
        )
        lam = logsumexp_agg(phi, ["term_id", "topic"], "log_phi", "lse")
        if eta_rel is None:
            # η smoothing (uninformed): λ = logaddexp(log η, Σφ).  At
            # η = 1e-12 the unobserved-term mass is negligible in the
            # normalizer, so the sparse (observed-terms-only) relation
            # suffices.
            lam = lam.select(
                "term_id",
                "topic",
                F.greatest(F.col("lse"), F.lit(DEFAULT_LOG_ETA)).alias("hi"),
                F.least(F.col("lse"), F.lit(DEFAULT_LOG_ETA)).alias("lo"),
            ).select(
                "term_id",
                "topic",
                (
                    F.col("hi") + F.log1p(F.exp(F.col("lo") - F.col("hi")))
                ).alias("log_lambda"),
            )
        else:
            # Informed prior: dense η relation keeps every term in the
            # normalizer (unobserved terms carry exp(log 0.001) each).
            lam = (
                eta_rel.join(lam, ["term_id", "topic"], "left")
                .select(
                    "term_id",
                    "topic",
                    F.greatest(
                        F.coalesce("lse", F.lit(float("-inf"))), "log_eta"
                    ).alias("hi"),
                    F.least(
                        F.coalesce("lse", F.lit(float("-inf"))), "log_eta"
                    ).alias("lo"),
                )
                .select(
                    "term_id",
                    "topic",
                    (
                        F.col("hi")
                        + F.log1p(F.exp(F.col("lo") - F.col("hi")))
                    ).alias("log_lambda"),
                )
            )
        norms = logsumexp_agg(lam, ["topic"], "log_lambda", "log_norm")
        beta_next = (
            lam.join(F.broadcast(norms), "topic")
            .select(
                "term_id",
                "topic",
                (
                    digamma_udf(F.exp("log_lambda"))
                    - digamma_udf(F.exp("log_norm"))
                ).alias("elog"),
            )
            .groupBy("term_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("topic", "elog"))).alias("p")
            )
            .select("term_id", F.col("p.elog").alias("beta"))
        )
        beta_next = ckpt_gc.cut(
            beta_next.repartition(
                shuffle_partitions
                or spark.sparkContext.defaultParallelism,
                "term_id",
            ),
            corpus_checkpoint,
            slot="beta",
        )

        # --- α stats + ELBO: plain aggregations, K+1 numbers pulled ---
        alpha_rows = (
            out.filter(F.col("kind") == "alpha")
            .select(F.posexplode("vec").alias("k", "v"))
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        alpha_ss = np.zeros(K)
        for r in alpha_rows:
            alpha_ss[r["k"]] = r["s"]
        elbo = (
            out.filter(F.col("kind") == "doc").agg(F.sum("ll")).collect()[0][0]
        )
        gamma_df = ckpt_gc.cut(
            out.filter(F.col("kind") == "doc").select(
                F.col("id").alias("doc_id"), F.col("vec").alias("gamma")
            ),
            corpus_checkpoint,
            slot="gamma",
        )
        out.unpersist()
        beta_df = beta_next

        if symmetric_alpha:
            # scalar update on the summed statistic (same rule as the
            # broadcast path, plans/lda.py:533 — ADVICE r6: the CLI
            # flag was silently ignored in join mode)
            from mr_lda_spark.functions.alpha import update_alpha_scalar

            a = update_alpha_scalar(
                K, num_docs, float(state.alpha[0]), float(alpha_ss.sum())
            )
            state.alpha = np.full(K, a)
        else:
            state.alpha = update_alpha_vector(num_docs, state.alpha, alpha_ss)
        state.elbo = float(elbo)
        state.history.append(float(elbo))
        if state.total_tokens > 0:
            state.perplexity_history.append(
                float(math.exp(-elbo / state.total_tokens))
            )
        state.iter_seconds.append(
            round(_time.perf_counter() - iter_t0, 3)
        )
        if prev_elbo is not None and abs((elbo - prev_elbo) / prev_elbo) <= converge:
            break
        prev_elbo = elbo

    ckpt_gc.sweep()  # last superseded generation; the live one backs
    # the returned gamma_df / beta_df
    # API parity: expose β as a matrix (model-sized pull; the loop
    # above never needed it on the driver).
    mat = np.full((num_terms + 1, K), DEFAULT_LOG_ETA)
    for r in beta_df.collect():
        mat[r["term_id"]] = np.asarray(r["beta"])
    state.elog_beta = mat
    return gamma_df, state


def beta_relation(beta_tall: DataFrame) -> DataFrame:
    """Fold the tall BETA table (term_id, topic, log_beta — the
    engine's stored model layout) into the join path's row form
    (term_id, beta ARRAY<DOUBLE>[K]).  One shuffle on term_id, K rows
    per key — the relational inverse of ``lda.beta_dataframe``; never
    touches the driver."""
    return (
        beta_tall.groupBy("term_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("topic", "log_beta"))
            ).alias("p")
        )
        .select("term_id", F.col("p.log_beta").alias("beta"))
    )


def infer_join(
    spark: SparkSession,
    corpus_tall: DataFrame,
    beta_df: DataFrame,
    alpha: np.ndarray,
    max_gamma_iter: int = 50,
    gamma_tol: float = 0.0,
) -> DataFrame:
    """Held-out/test inference with DISTRIBUTED β (the reference's
    -test γ-only pass, VariationalInferenceOptions.java:166-178, with
    the broadcast requirement removed): ``corpus_tall`` (doc_id,
    term_id, term_count) joins ``beta_df`` (term_id, beta ARRAY[K]) on
    term_id, docs regroup carrying their terms' β slices, and the
    γ-only kernel scores each doc.  Returns (doc_id, gamma, doc_ll).

    β stays a DataFrame end-to-end — below the broadcast threshold AQE
    turns the join into a broadcast join on its own; above it, the
    shuffle join is the plan that survives.  Terms absent from β score
    at the η floor (left join + coalesce), matching broadcast-mode
    ``lda.infer``'s DEFAULT_LOG_ETA-filled matrix exactly."""
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    alpha = np.asarray(alpha, dtype=np.float64)
    K = len(alpha)
    floor = F.array_repeat(F.lit(float(DEFAULT_LOG_ETA)), K)
    joined = corpus_tall.join(beta_df, "term_id", "left").withColumn(
        "beta", F.coalesce(F.col("beta"), floor)
    )
    docs = joined.groupBy("doc_id").agg(
        F.collect_list("term_id").alias("term_ids"),
        F.collect_list("term_count").alias("term_counts"),
        F.collect_list("beta").alias("betas"),
    )
    kernel = _join_estep_kernel(
        alpha, max_gamma_iter, learning=False, gamma_tol=gamma_tol
    )
    out = docs.mapInPandas(kernel, schema=_JOIN_ESTEP_SCHEMA)
    return out.filter(F.col("kind") == "doc").select(
        F.col("id").alias("doc_id"),
        F.col("vec").alias("gamma"),
        F.col("ll").alias("doc_ll"),
    )
