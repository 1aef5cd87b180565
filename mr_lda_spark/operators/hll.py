"""Deterministic HyperLogLog distinct-count sketch.

Third member of the sketch family (``bloom.py``, ``sketch.py`` — none
exist in the reference, lintool/Mr.LDA; all belong to the
LLM-data-pipeline suite).  An exact ``count(DISTINCT key)`` shuffles
every distinct key; at 100 TB the key space (shingles, tokens, user
ids) dwarfs the answer.  The HLL route reduces the corpus to ``m``
integer registers:

1. HASH — each key maps to a 60-bit integer via ``md5`` (NOT
   ``xxhash64``: the whole point of this implementation is that the
   oracle can recompute the identical sketch in ANSI SQL, and md5 is
   the one hash both engines share bit-for-bit).  The top ``p`` bits
   pick a register; ``rho`` = 1 + leading zeros of the remaining
   ``60-p`` bits, computed exactly as ``(61-p) - length(bin(rem))``
   (integer, no floating log).
2. REGISTERS — ``groupBy(bucket).max(rho)``: the shuffle after partial
   aggregation is at most ``m`` rows PER PARTITION no matter the
   corpus, and ``max`` is the associative merge — two sketches of two
   shards combine by register-wise max, which is what makes the
   estimator a one-pass distributed aggregate (and what
   ``hll_merge`` proves against the driver oracle).
3. ESTIMATE — kept integer-exact for the cross-engine hash gate:
   ``sum(2^-rho)`` is scaled by ``2^(61-p)`` so every term is an
   integer (``S`` fits int64 for p ≥ 3) and the only float op is ONE
   literal-by-int64 division + round, which IEEE 754 makes identical
   in Spark and DuckDB.  The small-range branch (linear counting,
   ``m·ln(m/zero_buckets)``) exists per the published algorithm but is
   intentionally the SECOND branch of the CASE: the registered queries
   operate in the plain-HLL regime at every shipped SF, so the
   libm-``ln`` (whose last ulp is not contractually identical across
   engines) never decides a shipped row.

Standard-error ~ 1.04/sqrt(m): p=8 → ±6.5%.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_alpha", "hll_rho", "hll_registers", "hll_estimate",
    "hll_distinct", "hll_merge", "hll_pairwise_sets",
]

_HASH_BITS = 60  # 15 hex chars of md5 — fits signed int64 in both engines


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant for m ≥ 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rho(key: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) for one key: bucket = top ``p`` bits of the 60-bit
    md5-derived hash; rho = 1 + leading zeros of the low ``60-p`` bits
    (``rem == 0`` → all-zeros → ``61-p``).  Integer-only: bit length
    via ``length(bin(x))``, never a floating log2."""
    rem_bits = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    bucket = F.shiftright(h, rem_bits)
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(rem))
    )
    return bucket.cast("int").alias("bucket"), rho.cast("int").alias("rho")


def hll_registers(
    keys: DataFrame, key_col: str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """The sketch as a relation: (group…, bucket, r) — at most
    ``m = 2**p`` rows per group, reached through partial aggregation
    (map side emits ≤ m rows per partition per group; keys never
    shuffle)."""
    bucket, rho = hll_rho(F.col(key_col), p)
    return (
        keys.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Estimate per group from a register relation.

    Integer-exact interior: ``s_scaled = Σ 2^(B - r)`` over all m
    registers (absent register ⇒ r = 0 ⇒ term 2^B), B = 61 - p, an
    int64.  ``hll_raw = round(NUM / s_scaled)`` where NUM =
    alpha·m²·2^B is a single Python-computed double literal — one IEEE
    division, identical across engines.  ``est_distinct`` applies the
    published small-range (linear-counting) correction branch."""
    m = 1 << p
    big = _HASH_BITS - p + 1  # B
    num = hll_alpha(m) * m * m * float(1 << big)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {big} - r)")
    # coalesce: a group with ZERO registers (global agg over an empty
    # relation) must flow through as used_buckets = 0, s = m·2^B — the
    # linear-counting branch then yields est_distinct = m·ln(m/m) = 0,
    # the correct empty-input answer (a null sum would poison s).
    per_group = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used_buckets"),
        F.coalesce(F.sum(term), F.lit(0)).alias("s_present"),
    )
    s = (
        F.col("s_present")
        + (F.lit(m) - F.col("used_buckets")) * F.lit(1 << big)
    ).cast("bigint")
    raw = F.round(F.lit(num) / s).cast("bigint")
    zeros = (F.lit(m) - F.col("used_buckets")).cast("bigint")
    lc = F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)).cast(
        "bigint"
    )
    out = per_group.select(
        *group_cols,
        F.col("used_buckets").cast("int").alias("used_buckets"),
        s.alias("s_scaled"),
        raw.alias("hll_raw"),
        F.when((zeros > 0) & (raw <= F.lit(int(2.5 * m))), lc)
        .otherwise(raw)
        .alias("est_distinct"),
    )
    return out


def hll_distinct(
    keys: DataFrame, key_col: str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """registers → estimate in one call (the normal entry point)."""
    return hll_estimate(
        hll_registers(keys, key_col, group_cols, p), group_cols, p
    )


def hll_merge(
    registers: DataFrame, drop_cols: list[str], p: int = 8
) -> DataFrame:
    """Merge sketches across ``drop_cols`` by register-wise max — the
    associativity that lets 1000 executors sketch 1000 shards and
    combine: merged registers are IDENTICAL to the sketch of the
    unioned keys (max is insensitive to grouping), so the merged
    estimate equals the direct estimate bit-for-bit."""
    merged = registers.groupBy(
        *[c for c in registers.columns if c not in set(drop_cols) | {"r"}]
    ).agg(F.max("r").alias("r"))
    remaining = [
        c for c in merged.columns if c not in ("bucket", "r")
    ]
    return hll_estimate(merged, remaining, p)


def hll_pairwise_sets(
    registers: DataFrame, label_col: str, p: int = 8
) -> DataFrame:
    """Set-operation cardinalities for every label pair from ONE
    register relation: union by register-wise max (exact sketch
    algebra — the union sketch IS the sketch of the union), then
    intersection by inclusion-exclusion
    ``|A∩B| ≈ max(0, |A| + |B| - |A∪B|)`` on the integer estimates.

    This is the theta-sketch use case (cross-source overlap audits)
    done with the sketches already built for per-source counting —
    no second corpus pass: everything below operates on the
    labels × m register relation.  Pair generation is two equi-joins
    of the (a < b) label pairs against the registers (never an
    OR-join), and the estimator is the shared integer-exact path.

    Accuracy caveat (stated, not hidden): inclusion-exclusion
    compounds the ±1.04/√m relative errors of three estimates of the
    LARGE sets, so a small true intersection of two large sets can be
    swamped by estimator noise — the clamp at 0 is doing real work.
    Exact verification on candidates (as the registered query's audit
    column does) is the production answer when the overlap decision
    matters.
    """
    labels = registers.select(F.col(label_col).alias("a")).distinct()
    # broadcast: the label relation is tiny by construction, and an
    # unhinted tiny×tiny cross join still plans a CartesianProduct —
    # the plan-shape suite (rightly) bans that node everywhere.
    pairs = labels.crossJoin(
        F.broadcast(labels.select(F.col("a").alias("b")))
    ).filter(F.col("a") < F.col("b"))
    ra = pairs.join(
        registers.select(
            F.col(label_col).alias("a"), "bucket", "r"
        ),
        "a",
    ).select("a", "b", "bucket", "r")
    rb = pairs.join(
        registers.select(
            F.col(label_col).alias("b"), "bucket", "r"
        ),
        "b",
    ).select("a", "b", "bucket", "r")
    merged = (
        ra.unionByName(rb)
        .groupBy("a", "b", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est_union = hll_estimate(merged, ["a", "b"], p).select(
        "a", "b", F.col("est_distinct").alias("est_union")
    )
    singles = hll_estimate(registers, [label_col], p)
    ea = singles.select(
        F.col(label_col).alias("a"),
        F.col("est_distinct").alias("est_a"),
    )
    eb = singles.select(
        F.col(label_col).alias("b"),
        F.col("est_distinct").alias("est_b"),
    )
    out = est_union.join(ea, "a").join(eb, "b")
    inter = F.greatest(
        F.lit(0).cast("long"),
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
    )
    return out.select(
        "a", "b", "est_a", "est_b", "est_union",
        inter.alias("est_intersection"),
    )
