"""Exact distributed quantiles WITHOUT a global sort — iterative
histogram refinement (the classic distributed-selection algorithm:
Blum et al. selection generalized to buckets, as used by external
median finders).

``percentile()``-style exact aggregates pull every value into one
reducer; ``approxQuantile`` is fast but inexact.  This operator is
both exact and scale-shaped: each round is ONE map-side-combined
aggregation over the column (no shuffle of values — only
states × buckets partial rows), the driver holds scalar state per
(group, quantile), and the range shrinks ~buckets× per round, so a
100 TB column needs ~3-4 passes before the survivor set fits a single
window partition for the final exact rank.

Exactness against float fuzz: a row's bucket membership across rounds
is decided by the SAME clamped-floor expression chain used for
counting (never by recomputed float boundaries, which can disagree by
1 ulp and silently drop a boundary value — an off-by-one rank is a
wrong element), and each round re-reads the selected bucket's TRUE
[min, max] from the aggregation itself, which both kills accumulated
boundary drift and terminates immediately when the bucket collapses
to a single value (heavy-tie columns).

Rank convention: the k-th smallest with ``k = max(1, ceil(p * n))``
in IEEE double — empirically DuckDB's ``quantile_disc`` rule (probed
across n = 4, 5, 6, 10 at six quantiles each), which makes the
operator oracle-checkable bit-for-bit.

Grouped mode (``by=[...]``): one selection state per (group, p),
all groups refined simultaneously in the SAME per-round pass — the
driver holds |groups|×|ps| scalar triples and the round expression
carries that many when-branches, so it suits low-cardinality
dimension groupings (the GROUP BY quantile shape), not million-key
groups (those want the t-digest/approx family instead).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mr_lda_spark.operators.localrel import local_df

__all__ = ["exact_quantiles"]


def _bucket_expr(col, lo: float, width: float, n_buckets: int):
    """Clamped-floor bucket id — THE membership definition, reused
    verbatim as both the histogram key and the next round's filter."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.greatest(
        F.lit(0), F.least(F.lit(n_buckets - 1), raw)
    ).cast("int")


class _State:
    __slots__ = ("grp", "p", "k", "chain", "lo", "hi", "remaining",
                 "value")

    def __init__(self, grp, p, k, lo, hi, remaining):
        self.grp, self.p, self.k = grp, p, k
        self.chain: list = []  # [(lo, width, j, n_buckets), ...]
        self.lo, self.hi = lo, hi
        self.remaining = remaining
        self.value = None  # set -> done

    def pred(self, col):
        out = F.lit(True)
        for g, v in self.grp:
            out = out & (F.col(g) == F.lit(v))
        for lo, width, j, nb in self.chain:
            out = out & (_bucket_expr(col, lo, width, nb) == F.lit(j))
        return out


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    by: list[str] | None = None,
    n_buckets: int = 1024,
    threshold: int = 8192,
    max_rounds: int = 40,
) -> DataFrame:
    """(*by, p, value) rows: for each group and each ``p`` in ``ps``,
    the exact ``ceil(p*n)``-th smallest non-null value of ``df[col]``
    within the group (one global group when ``by`` is None/empty).

    Driver state is scalars only (one (lo, hi, k) triple per state);
    every Spark round aggregates at most ``states × n_buckets``
    partial rows.  The final exact step ranks the ≤ ``threshold``
    survivors of each state in one per-state window (bounded
    partitions by construction).
    """
    by = list(by or [])
    spark = df.sparkSession
    base = df.filter(F.col(col).isNotNull()).select(
        *by, F.col(col).cast("double").alias(col)  # one value type
    )
    c = F.col(col)
    head = (
        base.groupBy(*by) if by else base.groupBy()
    ).agg(
        F.count(col).alias("__n"),
        F.min(col).alias("__mn"),
        F.max(col).alias("__mx"),
    ).collect()

    grp_fields = base.select(*by).schema.fields if by else []
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in grp_fields]
        + ["p double", "value double"]
    )
    states: list[_State] = []
    for row in head:
        n = int(row["__n"])
        if n == 0:
            continue
        grp = tuple((g, row[g]) for g in by)
        for p in ps:
            k = max(1, math.ceil(p * n))  # DuckDB quantile_disc's rule
            s = _State(grp, float(p), k, float(row["__mn"]),
                       float(row["__mx"]), n)
            if s.lo == s.hi:
                s.value = s.lo
            states.append(s)
    if not states:
        return local_df(spark, [], out_schema)

    for _ in range(max_rounds):
        active = [
            s for s in states
            if s.value is None and s.remaining > threshold
        ]
        if not active:
            break
        # one pass: histogram every active state's survivor set, with
        # true per-bucket bounds (exact refinement + tie termination)
        entries = [
            F.when(
                s.pred(c),
                F.struct(
                    F.lit(i).alias("sid"),
                    _bucket_expr(
                        c, s.lo, max((s.hi - s.lo) / n_buckets, 1e-323),
                        n_buckets,
                    ).alias("b"),
                    c.alias("v"),
                ),
            )
            for i, s in enumerate(active)
        ]
        hist = (
            base.select(F.explode(F.array(*entries)).alias("e"))
            .filter(F.col("e").isNotNull())
            .groupBy("e.sid", "e.b")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min("e.v").alias("bmn"),
                F.max("e.v").alias("bmx"),
            )
            .collect()
        )
        per_state: dict[int, list] = {}
        for row in hist:
            per_state.setdefault(int(row["sid"]), []).append(row)
        for i, s in enumerate(active):
            width = max((s.hi - s.lo) / n_buckets, 1e-323)
            rows = sorted(per_state.get(i, []), key=lambda r: r["b"])
            acc = 0
            for row in rows:
                if acc + int(row["cnt"]) >= s.k:
                    s.chain.append((s.lo, width, int(row["b"]), n_buckets))
                    s.k -= acc
                    s.remaining = int(row["cnt"])
                    s.lo, s.hi = float(row["bmn"]), float(row["bmx"])
                    if s.lo == s.hi:  # single distinct value left
                        s.value = s.lo
                    break
                acc += int(row["cnt"])
            else:  # pragma: no cover - rank > survivors means a bug
                raise AssertionError("rank fell off the histogram")

    done = [
        tuple(v for _, v in s.grp) + (s.p, s.value)
        for s in states if s.value is not None
    ]
    open_states = [
        (i, s) for i, s in enumerate(states) if s.value is None
    ]
    results = local_df(spark, done, out_schema) if done else None
    if open_states:
        entries = [
            F.when(
                s.pred(c),
                F.struct(F.lit(i).alias("sid"), c.alias("v")),
            )
            for i, (_, s) in enumerate(open_states)
        ]
        survivors = (
            base.select(F.explode(F.array(*entries)).alias("e"))
            .filter(F.col("e").isNotNull())
            .select(F.col("e.sid").alias("sid"), F.col("e.v").alias("v"))
        )
        w = Window.partitionBy("sid").orderBy("v")
        ranked = survivors.withColumn("r", F.row_number().over(w))
        ks = local_df(
            spark,
            [
                (i,) + tuple(v for _, v in s.grp) + (s.k, s.p)
                for i, (_, s) in enumerate(open_states)
            ],
            ", ".join(
                ["sid int"]
                + [f"`{f.name}` {f.dataType.simpleString()}"
                   for f in grp_fields]
                + ["k int", "p double"],
            ),
        )
        finals = (
            ranked.join(F.broadcast(ks), "sid")
            .filter(F.col("r") == F.col("k"))
            .select(*by, "p", F.col("v").alias("value"))
        )
        results = finals if results is None else results.unionByName(finals)
    return results
