"""Bounded-state shuffle sizing for the sketch-on-stream drains.

The sketch drains (HLL registers, CMS/AMS cells, KMV heaps, Gram
moments) exist BECAUSE their state is bounded by construction —
``groups × m`` registers, ``depth × width`` cells, ``d(d+1)/2 + d + 1``
moments — never a function of the stream length.  Structured
Streaming nevertheless sizes their ONE stateful aggregation stage at
``spark.sql.shuffle.partitions`` (the session's generic shuffle
width, which tracks the CLUSTER, not the state): on any host that
means one state-store instance per shuffle partition — each with its
own init, delta-file write and fsync against the checkpoint PER
MICRO-BATCH — to hold a few thousand rows of state (measured here:
the stateful drain's ``addBatch`` runs 2.8–4.5 s where the stateless
twin pays 0.8–1.3 s, and the gap is the per-store fixed cost, not
compute).

``bounded_state_shuffle`` pins the state stage to ONE partition when
the operator's DOCUMENTED state bound fits a single store
(state_rows ≤ rows_per_store), and otherwise leaves the session
width alone.  This is a scale decision, not a local-mode tune: the
state bound is the same at 100 TB as at sf0.001 (that is the point
of a sketch), so carrying cluster-width state stores for a
few-thousand-row state is pure per-batch fixed cost at ANY size.
Map-side parallelism is untouched — the partial aggregation upstream
of the exchange still runs at the scan/spread width; only the tiny
post-shuffle state stage narrows.

The single-store-or-nothing shape is MEASURED, not assumed: the
intermediate point loses.  Isolated interleaved A/B at sf0.1 (4
clean reps, this round): the CMS drain (depth×width = 40 960 state
rows) at ceil(40960/8192) = 5 stores ran a consistent ~7% SLOWER
than at session width — with tens of thousands of state rows the
merge parallelism pays for the extra stores — while the genuinely
tiny states (Gram 2 145 rows, HLL registers ≲1 500, KMV ≤64 groups)
won 0.74–0.86× at one store.  ``SPARK_GRAFT_STATE_ROWS_PER_STORE``
(default 8192) parameterises the one-store threshold for production
re-tuning.

Result-identical by construction: every drain this wraps is an exact
integer/max aggregate (combine order irrelevant), and the conf is
restored immediately after ``start()`` captures it, so nothing else
in the session sees the narrowed width.  The streaming query pins its
own value in the checkpoint at start, and every drain here creates a
fresh checkpoint per call.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

__all__ = ["bounded_state_shuffle"]

_ROWS_PER_STORE_ENV = "SPARK_GRAFT_STATE_ROWS_PER_STORE"


@contextmanager
def bounded_state_shuffle(spark, state_rows: int):
    """Temporarily derive ``spark.sql.shuffle.partitions`` from a
    bounded-state operator's state-row bound (see module docstring).
    Wrap exactly the ``writeStream...start()`` call; the query
    captures the value at start."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    per = max(1, int(os.environ.get(_ROWS_PER_STORE_ENV, "8192")))
    if int(state_rows) > per:
        # Mid/large bounded states keep the session width: the A/B
        # showed the few-stores middle ground losing merge
        # parallelism (module docstring).
        yield
        return
    spark.conf.set(key, "1")
    try:
        yield
    finally:
        spark.conf.set(key, prev)
