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
