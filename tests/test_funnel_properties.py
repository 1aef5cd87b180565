"""Property tests: the windowed funnel's relational feasibility
closure vs a brute-force per-user reference, and SCD2 run collapsing
vs a direct simulation.  Spark round-trips are expensive, so each
property draws ONE batched corpus of many small users/keys per
example and keeps example counts low — the variety lives in the rows,
not the examples."""
import pytest

import datetime

from hypothesis import given, settings, strategies as st

from mr_lda_spark.operators.funnel import funnel_steps_windowed
from mr_lda_spark.operators.scd import scd2

_T0 = datetime.datetime(2024, 1, 1)


def _brute_funnel(events, steps, gap):
    """Reference: exhaustive DP over one user's (type, t) events —
    feasible(i) = set of step-i times with a feasible predecessor in
    (t-gap, t)."""
    feas = [sorted(t for ty, t in events if ty == steps[0])]
    for i in range(1, len(steps)):
        cur = sorted(t for ty, t in events if ty == steps[i])
        feas.append(
            [
                t
                for t in cur
                if any(p < t <= p + gap for p in feas[i - 1])
            ]
        )
    return [min(f) if f else None for f in feas]


@given(
    st.lists(  # users
        st.lists(  # events per user: (step index 0-3, minute)
            st.tuples(
                st.integers(0, 3), st.integers(0, 120)
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(5, 40),  # gap minutes
)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_windowed_funnel_matches_bruteforce(spark, users, gap_min):
    steps = ["s0", "s1", "s2"]
    gap_us = gap_min * 60 * 1_000_000
    rows = []
    eid = 0
    for u, evs in enumerate(users):
        for step_i, minute in evs:
            eid += 1
            rows.append(
                (
                    eid,
                    u,
                    f"s{step_i}",  # s3 = noise type, never a step
                    _T0 + datetime.timedelta(minutes=minute),
                    0.0,
                )
            )
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
        for r in funnel_steps_windowed(
            events, steps, max_gap_us=gap_us
        ).collect()
    }
    for u, evs in enumerate(users):
        evs_us = [
            (
                f"s{si}",
                int(
                    (_T0 + datetime.timedelta(minutes=m)).timestamp()
                    * 1_000_000
                ),
            )
            for si, m in evs
        ]
        want = _brute_funnel(evs_us, steps, gap_us)
        if want[0] is None:
            assert u not in got
        else:
            assert got[u] == tuple(want), (u, evs, gap_min)


@given(
    st.lists(  # observations: (key 0-2, state 0-2, order 0-30)
        st.tuples(
            st.integers(0, 2), st.integers(0, 2), st.integers(0, 30)
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[2]),  # unique (key, order) pairs
    )
)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_scd2_matches_simulation(spark, obs):
    rows = [
        (f"k{k}", f"st{s}", o, o) for k, s, o in obs
    ]
    df = spark.createDataFrame(rows, "k string, state string, ts long, id long")
    got = sorted(
        (r["k"], r["version"], r["state"], r["valid_from"],
         r["valid_to"], r["n_obs"])
        for r in scd2(df, "k", ["state"], ["ts", "id"], "ts").collect()
    )
    # simulate
    want = []
    bykey = {}
    for k, s, o in obs:
        bykey.setdefault(f"k{k}", []).append((o, f"st{s}"))
    for k, seq in bykey.items():
        seq.sort()
        runs = []
        for o, s in seq:
            if not runs or runs[-1][0] != s:
                runs.append([s, o, 1])
            else:
                runs[-1][2] += 1
        for i, (s, start, n) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append((k, i + 1, s, start, nxt, n))
    assert got == sorted(want)
