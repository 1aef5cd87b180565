"""Time-series operators: range-interval rolling aggregates and
gap-fill over per-group time spines — the hypertable / continuous-
aggregate family (no counterpart in the reference; part of the
training-data-pipeline extension surface, like `asof.py`).

All three operators are pure DataFrame compositions (SURVEY.md 'custom
operators' rule (a)): no UDF, no driver loop, no collect.

Scale notes (100 TB):
- ``rolling_range_agg`` is ONE shuffle on the partition key followed by
  a sort-within-partition and a streaming range frame — identical cost
  to any window aggregation; skew follows the key's own skew (salt the
  key upstream if one user owns the stream).
- ``time_spine`` derives each group's [min, max] bucket from a partial
  aggregation and EXPLODES the spine executor-side via
  ``sequence(min, max, interval)`` — the spine never exists on the
  driver, so a million groups × a year of hours is just another
  distributed relation.  Spark caps a single ``sequence()`` at
  ~2.5M elements per row — far beyond any sane bucket count per group
  (a decade of seconds per group is the wrong data model anyway).
- ``gap_fill`` left-joins real buckets onto the spine (shuffle on
  (group, bucket) — co-partitioned with the spine's own explode) and
  forward-fills with ``last(ignorenulls)`` over an unbounded-preceding
  frame: one more window pass, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_agg(
    df: DataFrame,
    by: str,
    ts_col: str,
    window_us: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Per-``by``-key rolling aggregates over a trailing TIME window:
    for every row, aggregate all rows of the same key with
    ``ts ∈ [row.ts - window_us, row.ts]`` (both ends inclusive —
    matching SQL ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``).

    ``aggs`` maps output column name → aggregate Column (e.g.
    ``{"cents_24h": F.sum("cents")}``).  The frame is a RANGE frame
    over ``unix_micros(ts)``, so rows with equal timestamps are peers
    and see each other regardless of tie order — the result is
    deterministic without a tiebreak column.

    Skew warning: one window partition per key, and Spark's SLIDING
    frame re-aggregates the frame contents as the lower bound moves
    (no inverse-function subtraction) — a hot key costs
    O(rows × rows-per-window) in ONE task, which AQE cannot split.
    For sum/count under a hot key use
    :func:`rolling_range_sum_salted` (exact same results; measured in
    SCALING_r09_rolling_skew).
    """
    w = (
        Window.partitionBy(by)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_us, 0)
    )
    # ONE select for every aggregate: sequential withColumns interleave
    # Projects between the Window nodes, which blocks Catalyst's
    # CollapseWindow and pays one Sort+Window pass PER aggregate
    # (caught in the r9 PLANS.md audit — two aggs planned two sorts).
    return df.select(
        "*", *[agg.over(w).alias(name) for name, agg in aggs.items()]
    )


def rolling_range_sum_salted(
    df: DataFrame,
    by: str,
    ts_col: str,
    window_us: int,
    sums: dict[str, str | None],
) -> DataFrame:
    """Hot-key-safe EXACT equivalent of :func:`rolling_range_agg` for
    invertible aggregates (sum / count): same trailing
    ``RANGE BETWEEN window_us PRECEDING AND CURRENT ROW`` semantics
    (inclusive both ends, equal-timestamp rows are peers), but no
    single partition ever holds a whole key.

    ``sums`` maps output column → input column to sum, or ``None`` for
    a ``count(*)`` (summed ones).

    Why: a window ``partitionBy(key)`` puts EVERY row of a key in one
    task — at 100 TB one hot user is one hot partition, and AQE cannot
    split a window the way it splits a skewed join (VERDICT r8 "Next
    round" #6).  This operator decomposes the trailing window by
    time-bucketing with bucket width = ``window_us``, so a trailing
    window spans at most two buckets, and every per-row frame becomes
    bucket-local::

        b       = floor(ts / W)                     -- row's bucket
        ans(t)  = prefix_cur(t)                     -- bucket b, ts' <= t
                + total(b-1)                        -- whole prev bucket
                - prefix_strict_prev(t - W)         -- prev, ts' < t - W

    (every bucket-b row with ts' <= t satisfies ts' > t - W because
    t < (b+1)·W, and every bucket-(b-2) row satisfies ts' < t - W
    because t >= b·W — so the three terms are exactly the frame).

    All heavy steps partition by **(key, bucket)**: the two in-bucket
    prefix windows, the bucket-total groupBy (map-side combine), and
    the two value joins — a hot key active over M window-lengths
    spreads across M partitions instead of one.  The strict prefix at
    the window's left edge is computed by UNIONING one probe event per
    distinct (key, t-W) into the previous bucket and running a
    ``rangeBetween(unboundedPreceding, -1)`` frame (integer
    microseconds, so ``-1`` is exactly "strictly earlier"); probes
    contribute nothing to the running sums and tied rows share one
    probe (RANGE peers have equal answers), so results come back on
    the natural key (key, ts) with no row-id bookkeeping.

    Limits: only sum/count (the prev-bucket term needs subtraction —
    max/min don't invert); if a key's entire history fits inside ONE
    window length there is only one bucket and no split to exploit
    (but then the plain window's partition is window-sized, i.e. small
    by assumption).  Needs non-null timestamps.
    """
    W = int(window_us)
    ts_us = F.unix_micros(F.col(ts_col))
    pairs = [
        (out, F.lit(1) if col is None else F.col(col))
        for out, col in sums.items()
    ]

    base = df.withColumn("__ts_us", ts_us).withColumn(
        "__b", F.floor(F.col("__ts_us") / W)
    )

    # 1) in-bucket inclusive prefix (peers included: RANGE frame).
    w_cur = (
        Window.partitionBy(by, "__b")
        .orderBy("__ts_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cur = base.select(
        "*",
        *[F.sum(val).over(w_cur).alias(f"__cur_{out}")
          for out, val in pairs],
    )  # one Window node for all aggs (CollapseWindow-friendly)

    # 2) per-(key, bucket) totals — partial-aggregated before shuffle.
    tot = base.groupBy(by, "__b").agg(
        *[F.sum(val).alias(f"__tot_{out}") for out, val in pairs]
    )

    # 3) strict prefix at each row's left edge, inside the PREVIOUS
    # bucket, via unioned zero-weight probe events.  floor((t-W)/W)
    # is exactly b-1, so every probe lands in the right partition.
    probes = base.select(
        by, (F.col("__ts_us") - W).alias("__ts_us"),
        (F.col("__b") - 1).alias("__b"),
    ).distinct()
    real = base.select(
        by, "__ts_us", "__b",
        *[val.alias(f"__v_{out}") for out, val in pairs],
        F.lit(0).alias("__probe"),
    )
    # typed nulls so the union resolves without coercion surprises
    vtypes = {f"__v_{out}": t for (out, _), t in zip(
        pairs, [f.dataType for f in real.schema.fields[3:-1]])}
    events = real.unionByName(
        probes.select(
            by, "__ts_us", "__b",
            *[F.lit(None).cast(vtypes[f"__v_{out}"]).alias(f"__v_{out}")
              for out, _ in pairs],
            F.lit(1).alias("__probe"),
        )
    )
    w_prev = (
        Window.partitionBy(by, "__b")
        .orderBy("__ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    events = events.select(
        "*",
        *[F.sum(f"__v_{out}").over(w_prev).alias(f"__pre_{out}")
          for out, _ in pairs],
    )
    edge = events.filter(F.col("__probe") == 1).select(
        by,
        (F.col("__ts_us") + W).alias("__ts_us"),  # back to the row's t
        *[F.coalesce(f"__pre_{out}", F.lit(0)).alias(f"__pre_{out}")
          for out, _ in pairs],
    )

    # 4) stitch: (key, bucket-1) totals + (key, ts) edge prefixes.
    prev_tot = tot.select(
        F.col(by), (F.col("__b") + 1).alias("__b"),
        *[F.col(f"__tot_{out}").alias(f"__ptot_{out}")
          for out, _ in pairs],
    )
    out_df = (
        cur.join(prev_tot, [by, "__b"], "left")
        .join(edge, [by, "__ts_us"], "left")
    )
    for out, _ in pairs:
        out_df = out_df.withColumn(
            out,
            F.col(f"__cur_{out}")
            + F.coalesce(F.col(f"__ptot_{out}"), F.lit(0))
            - F.coalesce(F.col(f"__pre_{out}"), F.lit(0)),
        )
    drop = ["__ts_us", "__b"] + [
        f"__{p}_{out}" for out, _ in pairs for p in ("cur", "ptot", "pre")
    ]
    return out_df.drop(*drop)


def rolling_count_anomalies(
    buckets: DataFrame,
    by: str,
    bucket_col: str,
    count_col: str,
    step: int,
    lookback: int = 24,
    z: int = 3,
    min_periods: int = 8,
) -> DataFrame:
    """Trailing-window z-score anomaly flags over a bucketed count
    series — INTEGER-EXACT, so two engines agree on every bit (the
    same design rule as the integer PageRank / ADC oracles): with
    k = trailing bucket count, Sx = Σcnt, Sx2 = Σcnt², the test

        |cnt - mean| > z·σ   ⇔   (k·cnt - Sx)² > z²·(k·Sx2 - Sx²)

    multiplies through by k² so no mean, variance, sqrt, or division
    is ever computed — only BIGINT products.  σ is the POPULATION
    deviation of the trailing frame; the frame excludes the current
    bucket (self-exclusion keeps a spike from masking itself); frames
    shorter than ``min_periods`` never flag; a zero-variance frame
    flags any deviation (rhs = 0 < lhs).

    Missing buckets count as zero: the series is first densified onto
    each group's integer spine (``sequence`` executor-side, like
    :func:`time_spine`) — without this, a ROWS frame would silently
    skip empty hours and the window would not be time-true.

    Scale: one shuffle on the group key; the spine join is
    co-partitioned; the window is a streaming ROWS frame.  Bucket
    counts per group are corpus-size / step, so even a year of hourly
    buckets is ~9k rows per group — group skew is structurally capped.
    """
    # floor-align input buckets to the step grid FIRST: a bucket not
    # at min + k*step would otherwise miss the generated spine and be
    # silently dropped by the left join (aligned inputs — the usual
    # date_trunc output — pass through unchanged).
    aligned = buckets.groupBy(
        by,
        F.expr(f"({bucket_col} div {int(step)}) * {int(step)}").alias(
            bucket_col
        ),
    ).agg(F.sum(count_col).alias("__n_aligned"))
    bounds = aligned.groupBy(by).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    spine = bounds.select(
        by,
        F.explode(
            F.sequence("__mn", "__mx", F.lit(int(step)))
        ).alias(bucket_col),
    )
    filled = spine.join(aligned, [by, bucket_col], "left").select(
        by,
        bucket_col,
        F.coalesce(F.col("__n_aligned"), F.lit(0))
        .cast("long")
        .alias("cnt"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(bucket_col)
        .rowsBetween(-lookback, -1)
    )
    win = filled.select(
        "*",
        F.count(F.lit(1)).over(w).alias("__k"),
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("sx"),
        F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(w), F.lit(0))
        .alias("sx2"),
    )
    k, cnt = F.col("__k"), F.col("cnt")
    lhs = (k * cnt - F.col("sx")) * (k * cnt - F.col("sx"))
    rhs = F.lit(z * z) * (k * F.col("sx2") - F.col("sx") * F.col("sx"))
    return win.select(
        by,
        bucket_col,
        "cnt",
        k.cast("int").alias("lookback"),
        "sx",
        "sx2",
        ((k >= min_periods) & (lhs > rhs)).alias("is_anomaly"),
    )


def time_spine(
    buckets: DataFrame,
    by: list[str],
    bucket_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-group contiguous time spine: one row per ``step`` between
    each group's min and max bucket (inclusive).  ``buckets`` is an
    already-bucketed relation (e.g. an hourly aggregate); the spine is
    generated executor-side with ``sequence()`` — no driver collect.
    """
    bounds = buckets.groupBy(*by).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    return bounds.select(
        *by,
        F.explode(
            F.sequence("__mn", "__mx", F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )


def gap_fill(
    buckets: DataFrame,
    by: list[str],
    bucket_col: str,
    value_cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """Fill holes in a bucketed time series: left-join the real buckets
    onto the per-group spine, mark gaps, and forward-fill each value
    column with the most recent real value (``<col>_ff``; the raw
    column keeps its null so both gap-aware and carried readings are
    available).  The first buckets of a group are never gaps (the
    spine starts at the group's min), so every ``_ff`` is non-null.
    """
    spine = time_spine(buckets, by, bucket_col, step)
    joined = spine.join(buckets, [*by, bucket_col], "left")
    w = (
        Window.partitionBy(*by)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "was_gap", F.col(value_cols[0]).isNull()
    )
    for c in value_cols:
        out = out.withColumn(f"{c}_ff", F.last(c, ignorenulls=True).over(w))
    return out
