"""Greedy funnel matching: subsequence existence, strict-tie rule,
stall behavior, and duplicate step types."""

import datetime as dt

from mr_lda_spark.operators.funnel import funnel_steps

T0 = dt.datetime(2024, 1, 1)


def _ev(rows, spark):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(seconds=s), t, 0.0)
         for i, (u, s, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    )


def test_funnel_basic_and_stalls(spark):
    rows = [
        # user 1 converts: view(0) click(5) purchase(9)
        (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
        # user 2 stalls at click (purchase BEFORE click doesn't count)
        (2, 0, "view"), (2, 3, "purchase"), (2, 7, "click"),
        # user 3 never views (absent from output despite purchase)
        (3, 1, "purchase"),
        # user 4: view only
        (4, 2, "view"),
    ]
    got = {
        r["user_id"]: (r["steps_completed"], r["converted"])
        for r in funnel_steps(
            _ev(rows, spark), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: (3, True), 2: (2, False), 4: (1, False)}


def test_funnel_strict_ties_and_greedy_is_exact(spark):
    rows = [
        # tie: click at the same second as view -> does NOT advance,
        # but a later click does
        (1, 0, "view"), (1, 0, "click"), (1, 4, "click"),
        (1, 4, "purchase"),  # tie with the matching click -> stalls
        (1, 8, "purchase"),  # later purchase converts
        # greedy check: earliest view(0) then click(2) then purchase(3)
        # exists even though the LAST view(5) has no later click
        (2, 0, "view"), (2, 2, "click"), (2, 3, "purchase"),
        (2, 5, "view"),
    ]
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"], r["converted"])
        for r in funnel_steps(
            _ev(rows, spark), ["view", "click", "purchase"]
        ).collect()
    }
    us = 1_000_000
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * us
    assert got[1] == (base, base + 4 * us, base + 8 * us, True)
    assert got[2] == (base, base + 2 * us, base + 3 * us, True)


def test_funnel_repeated_step_type(spark):
    # view -> view: needs TWO views at distinct times
    rows = [(1, 0, "view"), (1, 3, "view"), (2, 0, "view")]
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(_ev(rows, spark), ["view", "view"]).collect()
    }
    assert got == {1: 2, 2: 1}
