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

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mr_lda_spark.functions.alpha import update_alpha_vector
from mr_lda_spark.functions.special import digamma, gammaln
from mr_lda_spark.plans.lda import DEFAULT_LOG_ETA, init_elog_beta, _mstep_beta

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
            out = {k: [] for k in (
                "kind", "doc_id", "lang", "lang_term_ids",
                "lang_term_counts", "vec", "ll",
            )}
            for row in pdf.itertuples(index=False):
                lang_terms = [np.asarray(a, dtype=np.int64) for a in row.lang_term_ids]
                lang_counts = [
                    np.asarray(a, dtype=np.float64) for a in row.lang_term_counts
                ]
                n_total = sum(c.sum() for c in lang_counts)
                if n_total == 0:
                    continue
                seen = True
                g = getattr(row, "gamma", None)
                gamma = (
                    np.asarray(g, dtype=np.float64).copy()
                    if g is not None and len(g) == K
                    else alpha + n_total / K
                )
                elbs = [
                    elog_betas[lang][lang_terms[lang]] if lang_terms[lang].size else None
                    for lang in range(L)
                ]
                lpns = [None] * L
                ll_phi = 0.0
                for _ in range(max_gamma_iter):
                    dg = digamma(gamma)
                    parts = [log_alpha[None, :]]
                    ll_phi = 0.0
                    for lang in range(L):
                        if elbs[lang] is None:
                            continue
                        lp = elbs[lang] + dg[None, :]
                        norm = lp.max(axis=1)
                        norm = norm + np.log(
                            np.exp(lp - norm[:, None]).sum(axis=1)
                        )
                        lpn = lp - norm[:, None]
                        counts = lang_counts[lang]
                        ll_phi += float(
                            (counts[:, None] * np.exp(lpn) * (elbs[lang] - lpn)).sum()
                        )
                        lpns[lang] = lpn + np.log(counts)[:, None]
                        parts.append(lpns[lang])
                    stacked = np.vstack(parts)
                    m = stacked.max(axis=0)
                    gamma = np.exp(
                        m + np.log(np.exp(stacked - m[None, :]).sum(axis=0))
                    )

                sum_gamma = gamma.sum()
                ll_gamma = float(gammaln(gamma).sum() - gammaln(sum_gamma))
                alpha_ss += digamma(gamma) - digamma(sum_gamma)

                if learning:
                    for lang in range(L):
                        if lpns[lang] is None:
                            continue
                        acc = phi_accs[lang]
                        terms = lang_terms[lang]
                        contrib = lpns[lang]
                        cur = acc[terms]
                        hi = np.maximum(cur, contrib)
                        lo = np.minimum(cur, contrib)
                        with np.errstate(invalid="ignore"):
                            merged = hi + np.log1p(np.exp(lo - hi))
                        acc[terms] = np.where(np.isneginf(cur), contrib, merged)

                out["kind"].append("doc")
                out["doc_id"].append(int(row.doc_id))
                out["lang"].append(-1)
                out["lang_term_ids"].append(row.lang_term_ids)
                out["lang_term_counts"].append(row.lang_term_counts)
                out["vec"].append([float(x) for x in gamma])
                out["ll"].append(l_alpha + ll_gamma + ll_phi)
            if out["doc_id"]:
                yield pd.DataFrame(out)

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

    current = poly_corpus_doc.select(
        "doc_id", "lang_term_ids", "lang_term_counts", "gamma"
    ).localCheckpoint()
    num_docs = current.count()

    prev_elbo = None
    for _ in range(max_iterations):
        kernel = _poly_estep_kernel(
            state.alpha, state.elog_betas, max_gamma_iter, learning=True
        )
        out = current.mapInPandas(kernel, schema=_POLY_ESTEP_SCHEMA).persist()

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
        next_corpus = (
            out.filter(F.col("kind") == "doc")
            .select(
                "doc_id",
                "lang_term_ids",
                "lang_term_counts",
                F.col("vec").alias("gamma"),
            )
            .localCheckpoint()
        )
        out.unpersist()
        current = next_corpus

        state.elog_betas = [
            _mstep_beta(phi_by_lang[lang], num_terms_per_lang[lang], K, None)
            for lang in range(L)
        ]
        state.alpha = update_alpha_vector(num_docs, state.alpha, alpha_ss)
        state.elbo = float(elbo)
        state.history.append(float(elbo))
        if prev_elbo is not None and abs((elbo - prev_elbo) / prev_elbo) <= converge:
            break
        prev_elbo = elbo

    return current, state
