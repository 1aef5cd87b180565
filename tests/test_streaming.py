"""Streaming ≡ batch equivalence on the events table."""

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.session import read_table
from mr_lda_spark.streaming import events as se

SF = "/root/testdata/sf0.001"


def test_hourly_stream_matches_batch(spark):
    stream = se.read_events_stream(spark, SF)
    agg = se.hourly_agg_stream(stream)
    result = se.run_stream_to_batch(agg, "hourly_test")

    batch = read_table(spark, SF, "events").groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    got = sorted(tuple(r) for r in result.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_sessionize_batch_properties(spark):
    ev = read_table(spark, SF, "events")
    sessions = se.sessionize(ev, gap_minutes=30)
    rows = sessions.collect()
    assert rows
    # Sessions partition the events: counts add up.
    assert sum(r["n_events"] for r in rows) == ev.count()
    # No session spans a gap: end-start bounded sanity.
    for r in rows:
        assert r["session_end_epoch"] >= r["session_start_epoch"]


def test_session_stream_matches_batch_starts(spark):
    """Streaming session_window vs batch islands: same (user, start,
    n_events) sets."""
    stream = se.read_events_stream(spark, SF)
    result = se.run_stream_to_batch(
        se.sessionize_stream(stream, gap_minutes=30), "sessions_test"
    )
    batch = se.sessionize(read_table(spark, SF, "events"), gap_minutes=30)
    got = sorted(
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["sum_value"])
        for r in result.collect()
    )
    want = sorted(
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    )
    assert got == want


def test_segment_revenue_stream_matches_batch(spark):
    """Stream-static enrichment join ≡ its batch twin (same join, same
    window) — proves the broadcast dim join is stateless-correct under
    micro-batching."""
    import pyspark.sql.functions as F

    stream = se.read_events_stream(spark, SF)
    customer = read_table(spark, SF, "customer")
    result = se.run_stream_to_batch(
        se.segment_revenue_stream(stream, customer), "segrev_test"
    )
    ev = read_table(spark, SF, "events")
    batch = (
        ev.join(
            customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
            "user_id",
        )
        .groupBy(
            F.date_trunc("hour", "ts").alias("h"), "c_mktsegment"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "c_mktsegment",
            F.unix_timestamp("h").alias("hour_epoch"),
            "n_events",
            "sum_value",
        )
    )
    assert sorted(map(tuple, result.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_session_window_exact_gap_merges(spark):
    """Pins the boundary rule the events_sessionize_stream oracle
    depends on: an event exactly ``gap`` after the previous one MERGES
    into the session (so new-session requires a STRICTLY greater
    gap)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(seconds=1800)),  # exact gap -> merge
        (2, base),
        (2, base + dt.timedelta(seconds=1800.000001)),  # just over -> split
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n"])
    assert per_user[1] == [2]
    assert sorted(per_user[2]) == [1, 1]


def test_stream_hll_registers_equal_batch(spark, sf_dir):
    """The streaming register relation must equal the batch one
    bit-for-bit (same hash family, max is order-insensitive) — the
    property that makes the sketch safe to maintain incrementally."""
    import uuid

    from mr_lda_spark.operators import hll
    from mr_lda_spark.operators.textops import shingles
    from mr_lda_spark.streaming.dedup_stream import read_documents_stream
    from mr_lda_spark.streaming.hll_stream import shingle_lang_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_keys = shingles(docs, n=5).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    batch_regs = {
        (r["lang"], r["bucket"]): r["r"]
        for r in hll.hll_registers(
            batch_keys, "shingle", ["lang"], p=8
        ).collect()
    }

    stream = shingle_lang_stream(read_documents_stream(spark, sf_dir), n=5)
    regs = hll.hll_registers(stream, "shingle", ["lang"], p=8)
    name = f"t_hll_{uuid.uuid4().hex[:8]}"
    q = (
        regs.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_regs = {
        (r["lang"], r["bucket"]): r["r"]
        for r in spark.table(name).collect()
    }
    assert stream_regs == batch_regs
    # bounded state: at most langs x 256 rows
    langs = {k[0] for k in stream_regs}
    assert len(stream_regs) <= 256 * len(langs)
