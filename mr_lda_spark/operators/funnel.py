"""Ordered-funnel analysis — does each user's event stream contain the
step sequence s1 → s2 → … → sk with strictly increasing timestamps?
(The conversion-funnel workload of event-analytics engines.)

Greedy earliest-match is exact for subsequence existence: if ANY
occurrence chain exists, the chain built from the earliest occurrence
of step 1, then the earliest step-2 occurrence after it, etc., also
exists (exchange argument) — so the operator computes one conditional
min-timestamp per step.

Plan shape: one filtered aggregation + one user-keyed join per step —
every shuffle is on the user key, no windows over whole users, no
per-user event buffering; k steps = k joins over step-filtered (i.e.
pushdown-pruned) slices.  At 100 TB each step's slice is a filtered
scan and the join relations are user-sized, not event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mr_lda_spark.operators.lifecycle import cut_lineage

__all__ = [
    "funnel_steps", "funnel_steps_windowed", "touch_attribution",
    "markov_transitions",
]


def funnel_steps_windowed(
    events: DataFrame,
    steps: list[str],
    max_gap_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    materialize: bool | str = True,
) -> DataFrame:
    """Conversion funnel with a PER-STEP DEADLINE.  NOTE:
    materialize=True (the default) runs Spark jobs EAGERLY at call
    time and returns a localCheckpoint scan — pass materialize=False
    for lazy composition / plan inspection (ADVICE r10), or
    ``materialize="reliable"`` for the executor-churn tier (final
    cut via persist+count instead of localCheckpoint — recomputable
    through retained lineage; see ``operators/lifecycle.py``).

    Step i must occur
    strictly after step i-1 and within ``max_gap_us`` microseconds of
    it.  Greedy earliest-match is NOT exact here (an early step-1
    whose window expires can mask a later step-1 that would convert),
    so this computes the exact feasibility closure instead: an event
    of step i is *feasible* iff some feasible step-(i-1) event
    precedes it within the gap; per user the output keeps the
    earliest feasible timestamp per step (null once infeasible).

    Plan shape: one user-keyed range join per step between the step's
    event slice and the previous FEASIBLE set (both pushdown-pruned
    slices), then a per-user min — k steps = k range joins; the
    feasible relations are event-sliced, never whole-stream buffers.
    The joins carry an equi-key (the user) plus the time-range
    residual, so they shuffle-hash-join with a filter — no
    CartesianProduct.
    """
    assert steps, "need at least one step"
    ts_us = F.unix_micros(F.col(ts_col))
    slices = [
        events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("__u"), ts_us.alias("__ts")
        )
        for s in steps
    ]
    # each feasible relation is persisted: it feeds BOTH the next
    # step's range join and its own min-aggregate, and without the
    # persist every firsts[i] re-derives the whole prior join chain
    # (k(k+1)/2 joins instead of k — caught in the r9 self-review).
    # Handles are tracked and unpersisted once the (small, per-user)
    # result is materialized below — a long-lived session running the
    # whole registry otherwise accumulates one cached slice per step
    # per invocation until storage evicts (ADVICE r9 #1).  With
    # materialize=False nothing is persisted at all: that path exists
    # for plan inspection, where the plan never executes and a
    # persist would register CacheManager entries no caller could
    # ever release.
    maybe_persist = (lambda df: df.persist()) if materialize else (lambda df: df)
    feasible = maybe_persist(slices[0])
    cached = [feasible]
    firsts = [feasible.groupBy("__u").agg(F.min("__ts").alias("t_1"))]
    for i in range(1, len(steps)):
        prev = feasible.select("__u", F.col("__ts").alias("__pts"))
        feasible = maybe_persist(
            slices[i]
            .join(prev, "__u")
            .filter(
                (F.col("__ts") > F.col("__pts"))
                & (F.col("__ts") <= F.col("__pts") + max_gap_us)
            )
            .select("__u", "__ts")
            .distinct()
        )
        cached.append(feasible)
        firsts.append(
            feasible.groupBy("__u").agg(
                F.min("__ts").alias(f"t_{i + 1}")
            )
        )
    out = firsts[0]
    for i in range(1, len(steps)):
        out = out.join(firsts[i], "__u", "left")
    k = len(steps)
    completed = sum(
        (F.col(f"t_{i}").isNotNull()).cast("int") for i in range(1, k + 1)
    )
    result = out.select(
        F.col("__u").alias(user_col),
        *[f"t_{i}" for i in range(1, k + 1)],
        completed.cast("int").alias("steps_completed"),
        (F.col(f"t_{k}").isNotNull()).alias("converted"),
    )
    if not materialize:
        # Plan-inspection path: fully lazy, nothing was persisted.
        return result
    # Materialize the per-user result (≤ one row per user — the small
    # end of the funnel) so the feasible caches can be released now;
    # localCheckpoint blocks are GC-managed, unlike CacheManager
    # entries keyed by logical plan.  Reliable tier: persist+count —
    # a lost block recomputes (the released feasible caches re-fill
    # lazily on that path).
    result = cut_lineage(result, materialize)
    for h in cached:
        h.unpersist()
    return result


def funnel_dropoff(funnel: DataFrame, steps: list[str]) -> DataFrame:
    """Per-step loss attribution over an already-computed funnel
    relation (the output of :func:`funnel_steps` /
    :func:`funnel_steps_windowed`): one row per step with how many
    users reached it, how many it lost before the next step, and the
    step-to-step retention in integer ppm — "which step loses users",
    the question the conversion rate alone can't answer.

    One global aggregate over the (per-user, small) funnel relation,
    then a k-row explode — no second pass over the event stream.  The
    last step retains everyone who reached it (dropped_next 0,
    retained_ppm 1,000,000) by construction."""
    k = len(steps)
    row = funnel.agg(
        *[
            # count(col) counts non-nulls — same semantics as the
            # oracle's count(t_i).
            F.count(F.col(f"t_{i}")).alias(f"r_{i}")
            for i in range(1, k + 1)
        ]
    )
    structs = []
    for i in range(1, k + 1):
        nxt = f"r_{i + 1}" if i < k else f"r_{i}"
        structs.append(
            F.struct(
                F.lit(i).alias("step"),
                F.lit(steps[i - 1]).alias("event_type"),
                F.col(f"r_{i}").cast("bigint").alias("reached"),
                (F.col(f"r_{i}") - F.col(nxt)).cast("bigint").alias(
                    "dropped_next"
                ),
                F.expr(
                    f"CASE WHEN r_{i} = 0 THEN NULL "
                    f"ELSE CAST(({nxt} * 1000000) div r_{i} AS BIGINT) END"
                ).alias("retained_ppm"),
            )
        )
    return row.select(
        F.explode(F.array(*structs)).alias("s")
    ).select("s.step", "s.event_type", "s.reached", "s.dropped_next",
             "s.retained_ppm")


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: (src, dst, n, n_src, p_ppm) for every observed consecutive
    event-type pair, with the empirical transition probability in
    INTEGER parts-per-million (floor division — cross-engine exact,
    like the PageRank micro-units).

    One lead() window pass (user-keyed shuffle, total order by
    (ts, id)) + one K²-sized groupBy — state-type cardinality is tiny
    by definition, so the transition relation never grows with the
    corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return pairs.join(totals, "src").select(
        "src",
        "dst",
        "n",
        "n_src",
        F.expr("(n * 1000000) div n_src").alias("p_ppm"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str,
    channel_types: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """First-/last-touch marketing attribution: one row per
    conversion event with the first and the most recent STRICTLY
    PRECEDING channel event's type (null ⇒ no prior touch, i.e.
    "direct"), plus the conversion value in integer cents.

    Single window pass over (user, time): ``first/last(..., ignore
    nulls)`` over an unbounded-preceding-to-1-preceding frame — no
    self-join, no per-user buffering; the only shuffle is the user
    key.  Ordering is (ts, event_id): a total order, so simultaneous
    events attribute deterministically.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.when(
        F.col(type_col).isin(list(channel_types)), F.col(type_col)
    )
    touched = events.select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_t"),
        F.first(channel, ignorenulls=True).over(w).alias("first_touch"),
        F.last(channel, ignorenulls=True).over(w).alias("last_touch"),
        F.round(F.col(value_col) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return touched.filter(F.col("_t") == conversion_type).drop("_t")


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel progress over ``steps`` (event-type names, in
    order): (user, t_1 … t_k, steps_completed, converted) where t_i is
    the microsecond timestamp of the greedy i-th step match (null once
    the funnel stalls).  Strictly increasing timestamps: a tie does
    not advance the funnel (simultaneous events are unordered).
    """
    assert steps, "need at least one step"
    ts_us = F.unix_micros(F.col(ts_col))
    out = None
    prev = None
    for i, step in enumerate(steps, 1):
        slice_i = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), ts_us.alias("__ts")
        )
        if prev is None:
            agg = slice_i.groupBy("__u").agg(F.min("__ts").alias(f"t_{i}"))
            out = agg
        else:
            agg = (
                slice_i.join(prev, "__u")
                .filter(F.col("__ts") > F.col(f"t_{i - 1}"))
                .groupBy("__u")
                .agg(F.min("__ts").alias(f"t_{i}"))
            )
            out = out.join(agg, "__u", "left")
        prev = out.select("__u", f"t_{i}").filter(
            F.col(f"t_{i}").isNotNull()
        )
    k = len(steps)
    completed = sum(
        (F.col(f"t_{i}").isNotNull()).cast("int") for i in range(1, k + 1)
    )
    return out.select(
        F.col("__u").alias(user_col),
        *[f"t_{i}" for i in range(1, k + 1)],
        completed.cast("int").alias("steps_completed"),
        (F.col(f"t_{k}").isNotNull()).alias("converted"),
    )
