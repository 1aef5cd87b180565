"""Polylingual LDA (the reference's `polylda` package, SURVEY.md §1.1,
§2, §7.1 step 9): one vocabulary and one topic–word matrix β per
language, a single shared per-document topic posterior γ.

Kernel semantics follow polylda/DocumentMapper.java with one deliberate
divergence: the α sufficient statistic uses ψ(γ_k) − ψ(Σγ) on the
*actual* γ (the vanilla form) — the reference's polylda mapper applies
digamma to a log-γ buffer (polylda/DocumentMapper.java:299-304), which
SURVEY.md §7.3 flags as a reference bug.

Data model: doc-form rows carry one term-id/count array pair per
language slot (empty slot = language missing — the P6 semantics of
literal-null languages), plus the shared γ.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mr_lda_spark.functions.alpha import update_alpha_vector
from mr_lda_spark.functions.special import digamma, gammaln
from mr_lda_spark.plans.lda import init_elog_beta, _mstep_beta

_POLY_ESTEP_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.IntegerType()),
        T.StructField("lang_term_ids", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("lang_term_counts", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
        T.StructField("ll", T.DoubleType()),
    ]
)


@dataclass
class PolyLdaState:
    alpha: np.ndarray  # (K,)
    elog_betas: list  # per language: (V_l+1, K)
    elbo: float = float("-inf")
    history: list = field(default_factory=list)
    iter_seconds: list = field(default_factory=list)
    perplexity_history: list = field(default_factory=list)
    total_tokens: float = 0.0


def poly_corpus_from_tall(
    poly_tall: DataFrame, n_languages: int
) -> DataFrame:
    """(doc_id, lang, term_id, term_count) → doc-form with one dense
    array slot per language (empty array = missing language)."""
    per_lang = (
        poly_tall.groupBy("doc_id", "lang")
        .agg(
            F.array_sort(F.collect_list(F.struct("term_id", "term_count"))).alias(
                "pairs"
            )
        )
        .select(
            "doc_id",
            "lang",
            F.col("pairs.term_id").alias("tids"),
            F.col("pairs.term_count").alias("tcts"),
        )
    )
    slots_ids = F.array(
        *[
            F.coalesce(
                F.max(F.when(F.col("lang") == i, F.col("tids"))),
                F.array().cast("array<int>"),
            )
            for i in range(n_languages)
        ]
    )
    slots_cts = F.array(
        *[
            F.coalesce(
                F.max(F.when(F.col("lang") == i, F.col("tcts"))),
                F.array().cast("array<int>"),
            )
            for i in range(n_languages)
        ]
    )
    return (
        per_lang.groupBy("doc_id")
        .agg(slots_ids.alias("lang_term_ids"), slots_cts.alias("lang_term_counts"))
        .withColumn("gamma", F.lit(None).cast("array<double>"))
    )


def _poly_estep_kernel(
    alpha: np.ndarray,
    elog_betas: list,
    max_gamma_iter: int,
    learning: bool,
):
    K = len(alpha)
    L = len(elog_betas)
    l_alpha = float(gammaln(alpha.sum()) - gammaln(alpha).sum())
    log_alpha = np.log(alpha)

    def run(batches):
        phi_accs = (
            [np.full(eb.shape, -np.inf) for eb in elog_betas] if learning else None
        )
        alpha_ss = np.zeros(K)
        seen = False

        for pdf in batches:
            # Batch-vectorized like plans.lda: per language, pad the
            # docs that HAVE that language to (B_l, n_max_l) tensors;
            # the shared gamma couples languages inside each sweep.
            # Gamma accumulates in exp space (sums of non-negative
            # c·phi terms — stable without the log-space chain).
            lang_terms = [[] for _ in range(L)]
            lang_counts = [[] for _ in range(L)]
            doc_rows = []
            for i, row in enumerate(pdf.itertuples(index=False)):
                tl = [np.asarray(a, dtype=np.int64) for a in row.lang_term_ids]
                cl = [np.asarray(a, dtype=np.float64) for a in row.lang_term_counts]
                if sum(c.sum() for c in cl) == 0:
                    continue
                doc_rows.append((i, row, tl, cl))
            if not doc_rows:
                continue
            seen = True
            B = len(doc_rows)

            # Per-language padded views (idx maps back into the batch).
            lang_pack = []
            for lang in range(L):
                idx = [j for j, (_, _, tl, _) in enumerate(doc_rows) if tl[lang].size]
                if not idx:
                    lang_pack.append(None)
                    continue
                lens = [doc_rows[j][2][lang].size for j in idx]
                n_max = max(lens)
                t_pad = np.zeros((len(idx), n_max), dtype=np.int64)
                c_pad = np.zeros((len(idx), n_max))
                for r, j in enumerate(idx):
                    t_pad[r, : lens[r]] = doc_rows[j][2][lang]
                    c_pad[r, : lens[r]] = doc_rows[j][3][lang]
                valid = c_pad > 0
                with np.errstate(divide="ignore"):
                    log_c = np.where(valid, np.log(c_pad), -np.inf)
                lang_pack.append(
                    (np.array(idx), t_pad, c_pad, log_c, valid,
                     elog_betas[lang][t_pad])
                )

            n_total = np.zeros(B)
            for pack in lang_pack:
                if pack is None:
                    continue
                idx, _, c_pad, _, _, _ = pack
                n_total[idx] += c_pad.sum(axis=1)
            gamma = np.tile(alpha, (B, 1)) + n_total[:, None] / K
            for j, (i, row, _, _) in enumerate(doc_rows):
                g = getattr(row, "gamma", None)
                if g is not None and len(g) == K:
                    gamma[j] = np.asarray(g, dtype=np.float64)

            lpns = [None] * L
            ll_phi = np.zeros(B)
            for _ in range(max_gamma_iter):
                dg = digamma(gamma)
                new_gamma = np.tile(alpha, (B, 1))
                ll_phi = np.zeros(B)
                for lang in range(L):
                    pack = lang_pack[lang]
                    if pack is None:
                        continue
                    idx, t_pad, c_pad, log_c, valid, elb = pack
                    lp = elb + dg[idx][:, None, :]
                    m = lp.max(axis=2, keepdims=True)
                    norm = m + np.log(np.exp(lp - m).sum(axis=2, keepdims=True))
                    lpn = lp - norm
                    phi = np.exp(lpn)
                    ll_phi[idx] += (c_pad[:, :, None] * phi * (elb - lpn)).sum(
                        axis=(1, 2)
                    )
                    new_gamma[idx] += (c_pad[:, :, None] * phi).sum(axis=1)
                    lpns[lang] = lpn + log_c[:, :, None]
                gamma = new_gamma

            sum_gamma = gamma.sum(axis=1)
            ll_gamma = gammaln(gamma).sum(axis=1) - gammaln(sum_gamma)
            doc_ll = l_alpha + ll_gamma + ll_phi
            alpha_ss += (digamma(gamma) - digamma(sum_gamma)[:, None]).sum(axis=0)

            if learning:
                for lang in range(L):
                    pack = lang_pack[lang]
                    if pack is None or lpns[lang] is None:
                        continue
                    _, t_pad, _, _, valid, _ = pack
                    np.logaddexp.at(
                        phi_accs[lang], t_pad[valid], lpns[lang][valid]
                    )

            # Doc rows carry only gamma + ll; the static per-language
            # term arrays never round-trip back through Arrow.
            yield pd.DataFrame(
                {
                    "kind": "doc",
                    "doc_id": [int(r.doc_id) for _, r, _, _ in doc_rows],
                    "lang": -1,
                    "lang_term_ids": None,
                    "lang_term_counts": None,
                    "vec": list(gamma),
                    "ll": doc_ll,
                }
            )

        if not seen:
            return
        tail = {k: [] for k in (
            "kind", "doc_id", "lang", "lang_term_ids",
            "lang_term_counts", "vec", "ll",
        )}
        if learning:
            for lang in range(L):
                acc = phi_accs[lang]
                nonzero = np.where(~np.all(np.isneginf(acc), axis=1))[0]
                for t in nonzero:
                    tail["kind"].append("phi")
                    tail["doc_id"].append(int(t))
                    tail["lang"].append(lang)
                    tail["lang_term_ids"].append(None)
                    tail["lang_term_counts"].append(None)
                    tail["vec"].append([float(x) for x in acc[t]])
                    tail["ll"].append(None)
        tail["kind"].append("alpha")
        tail["doc_id"].append(-1)
        tail["lang"].append(-1)
        tail["lang_term_ids"].append(None)
        tail["lang_term_counts"].append(None)
        tail["vec"].append([float(x) for x in alpha_ss])
        tail["ll"].append(None)
        yield pd.DataFrame(tail)

    return run


def train_poly(
    spark: SparkSession,
    poly_corpus_doc: DataFrame,
    num_terms_per_lang: list,
    num_topics: int,
    max_iterations: int = 30,
    max_gamma_iter: int = 50,
    alpha_init=None,
    seed: int = 42,
    converge: float = 1e-6,
) -> tuple[DataFrame, PolyLdaState]:
    """EM loop for polylingual LDA; mirrors plans.lda.train but with a
    (lang, term, topic)-keyed M-step (the TripleOfInts shuffle key of
    polylda/DocumentMapper.java:31-32 becomes a lang-partitioned
    aggregation)."""
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    K = num_topics
    L = len(num_terms_per_lang)
    alpha = (
        np.full(K, 1.0 / K)
        if alpha_init is None
        else np.asarray(alpha_init, dtype=np.float64).copy()
        if not np.isscalar(alpha_init)
        else np.full(K, float(alpha_init))
    )
    state = PolyLdaState(
        alpha=alpha,
        elog_betas=[
            init_elog_beta(v, K, seed + lang)
            for lang, v in enumerate(num_terms_per_lang)
        ],
    )

    # Same carry strategy as plans.lda: static corpus checkpointed
    # once, only gamma flows between iterations.
    n_parts = spark.sparkContext.defaultParallelism
    has_gamma = "gamma" in poly_corpus_doc.columns
    cols = ["doc_id", "lang_term_ids", "lang_term_counts"] + (
        ["gamma"] if has_gamma else []
    )
    base = (
        poly_corpus_doc.select(*cols)
        .repartition(n_parts, "doc_id")
        .localCheckpoint()
    )
    static_corpus = base.select("doc_id", "lang_term_ids", "lang_term_counts")
    gamma_df = base.select("doc_id", "gamma") if has_gamma else None
    num_docs = base.count()
    state.total_tokens = float(
        base.select(
            F.aggregate(
                F.flatten("lang_term_counts"), F.lit(0), lambda a, x: a + x
            ).cast("double").alias("n")
        ).agg(F.sum("n")).collect()[0][0]
        or 0.0
    )

    import time as _time

    prev_elbo = None
    for _ in range(max_iterations):
        iter_t0 = _time.perf_counter()
        kernel = _poly_estep_kernel(
            state.alpha, state.elog_betas, max_gamma_iter, learning=True
        )
        if gamma_df is None:
            inp = static_corpus.withColumn(
                "gamma", F.lit(None).cast("array<double>")
            )
        else:
            inp = static_corpus.join(gamma_df, "doc_id", "left")
        out = inp.mapInPandas(kernel, schema=_POLY_ESTEP_SCHEMA).persist()

        phi_by_lang: dict[int, list] = {lang: [] for lang in range(L)}
        for r in (
            out.filter(F.col("kind") == "phi")
            .select("lang", "doc_id", "vec")
            .collect()
        ):
            phi_by_lang[r["lang"]].append((r["doc_id"], r["vec"]))
        alpha_ss = np.sum(
            [
                np.asarray(r["vec"])
                for r in out.filter(F.col("kind") == "alpha").select("vec").collect()
            ],
            axis=0,
        )
        elbo = out.filter(F.col("kind") == "doc").agg(F.sum("ll")).collect()[0][0]
        next_gamma = (
            out.filter(F.col("kind") == "doc")
            .select("doc_id", F.col("vec").alias("gamma"))
            .localCheckpoint()
        )
        out.unpersist()
        gamma_df = next_gamma

        state.elog_betas = [
            _mstep_beta(phi_by_lang[lang], num_terms_per_lang[lang], K, None)
            for lang in range(L)
        ]
        state.alpha = update_alpha_vector(num_docs, state.alpha, alpha_ss)
        state.elbo = float(elbo)
        state.history.append(float(elbo))
        state.iter_seconds.append(round(_time.perf_counter() - iter_t0, 3))
        if state.total_tokens > 0:
            state.perplexity_history.append(
                float(np.exp(-elbo / state.total_tokens))
            )
        if prev_elbo is not None and abs((elbo - prev_elbo) / prev_elbo) <= converge:
            break
        prev_elbo = elbo

    final = (
        static_corpus.join(gamma_df, "doc_id", "left")
        if gamma_df is not None
        else static_corpus.withColumn("gamma", F.lit(None).cast("array<double>"))
    )
    return final, state
