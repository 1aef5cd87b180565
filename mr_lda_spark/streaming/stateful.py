"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming aggregations (window / session_window) cover
time-keyed state; this is the escape hatch for state the built-ins
can't express — here a per-user lifetime spend tracker that carries
(count, total) across triggers and flags users crossing a spend
threshold.  The reference engine has no streaming surface at all
(SURVEY.md §2.8); this is the "custom stateful operator" tier of the
Structured Streaming story.

Scale: state is two scalars per user key, partitioned by user_id across
executors by the streaming state store; watermarkless NoTimeout state
is appropriate for a lifetime aggregate (bounded by |users|, not by
time).  Arrow batches flow into pandas per key group — no row-at-a-time
Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, n_events int, total_value double, over_threshold int"
)
STATE_SCHEMA = "n long, total double"


def _tracker(threshold: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # Deterministic accumulation order for bit-stable reruns.
            total += float(pdf.sort_values("event_id")["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "over_threshold": [int(total > threshold)],
            }
        )

    return fn


def user_spend_tracker_stream(
    events: DataFrame, threshold: float = 100.0
) -> DataFrame:
    """Per-user running (n_events, total_value, over_threshold) carried
    in explicit GroupState across triggers."""
    return events.select("user_id", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _tracker(threshold),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROLLING_OUT_SCHEMA = (
    "event_id long, user_id long, ts_us long, n_24h int, cents_24h long"
)
ROLLING_STATE_SCHEMA = "ts array<long>, cents array<long>"


def _rolling(window_us: int, evict_before_us: int | None):
    import numpy as np

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ots, ocents = state.get if state.exists else ([], [])
        ots = np.asarray(ots, dtype=np.int64)
        ocents = np.asarray(ocents, dtype=np.int64)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts_us", kind="mergesort")
            nts = pdf["ts_us"].to_numpy(np.int64)
            ncents = pdf["cents"].to_numpy(np.int64)
            merged_ts = np.concatenate([ots, nts])
            merged_cents = np.concatenate([ocents, ncents])
            order = np.argsort(merged_ts, kind="mergesort")
            merged_ts = merged_ts[order]
            merged_cents = merged_cents[order]
            csum = np.concatenate(
                [[0], np.cumsum(merged_cents, dtype=np.int64)]
            )
            # RANGE frame [t - W, t], both ends inclusive, ties peers:
            # vectorized rank arithmetic over the merged history.
            hi = np.searchsorted(merged_ts, nts, side="right")
            lo = np.searchsorted(merged_ts, nts - window_us, side="left")
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(np.int64),
                    "user_id": np.full(len(pdf), key[0], dtype=np.int64),
                    "ts_us": nts,
                    "n_24h": (hi - lo).astype(np.int32),
                    "cents_24h": csum[hi] - csum[lo],
                }
            )
            ots, ocents = merged_ts, merged_cents
        if evict_before_us is not None and len(ots):
            keep = ots >= (ots.max() - evict_before_us)
            ots, ocents = ots[keep], ocents[keep]
        state.update((ots.tolist(), ocents.tolist()))

    return fn


def rolling_spend_stream(
    events: DataFrame,
    window_us: int = 86_400_000_000,
    evict_before_us: int | None = None,
) -> DataFrame:
    """Streaming twin of the batch trailing-24h RANGE window
    (`operators/timeseries.rolling_range_agg` /
    `events_rolling_24h_spend`): every purchase event emits its
    per-user (count, cents) over [ts − window, ts] — the online
    velocity / rate-limit feature.

    State per user is the (ts, cents) event history as arrays; each
    trigger merges the new Arrow batch, answers all new rows with two
    vectorized ``searchsorted``s against the merged history (no
    per-row Python), and stores the merge back.  Exact against the
    batch window whenever each key's rows arrive in event-time order
    across triggers (single-trigger availableNow drains trivially
    qualify); by default state is unbounded for bit-exactness — set
    ``evict_before_us`` (a watermark-style horizon, e.g. the window
    itself) to bound state in production, accepting the standard
    late-data truncation."""
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return p.groupBy("user_id").applyInPandasWithState(
        _rolling(window_us, evict_before_us),
        outputStructType=ROLLING_OUT_SCHEMA,
        stateStructType=ROLLING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
