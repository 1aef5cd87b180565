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


def test_touch_attribution_first_and_last(spark):
    from mr_lda_spark.operators.funnel import touch_attribution
    import datetime

    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1: view -> click -> purchase : first=view last=click
        (1, 1, "view", ts(1), 0.0),
        (2, 1, "click", ts(2), 0.0),
        (3, 1, "purchase", ts(3), 5.0),
        # user 2: purchase with no prior touch -> nulls
        (4, 2, "purchase", ts(1), 2.5),
        # user 2: then a view, then another purchase -> view/view
        (5, 2, "view", ts(2), 0.0),
        (6, 2, "purchase", ts(3), 1.0),
        # error events never attribute
        (7, 3, "error", ts(1), 0.0),
        (8, 3, "purchase", ts(2), 9.99),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    got = {
        r["conversion_id"]: (
            r["first_touch"], r["last_touch"], r["cents"]
        )
        for r in touch_attribution(
            events, "purchase", ["view", "click", "signup"]
        ).collect()
    }
    assert got == {
        3: ("view", "click", 500),
        4: (None, None, 250),
        6: ("view", "view", 100),
        8: (None, None, 999),
    }


def test_touch_attribution_tie_broken_by_event_id(spark):
    from mr_lda_spark.operators.funnel import touch_attribution
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, "view", t0, 0.0),
        (2, 1, "click", t0, 0.0),   # same ts: id orders it after view
        (3, 1, "purchase", t0, 1.0),  # same ts: sees both touches
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    row = touch_attribution(
        events, "purchase", ["view", "click", "signup"]
    ).collect()[0]
    assert (row["first_touch"], row["last_touch"]) == ("view", "click")


def test_markov_transitions_counts_and_ppm(spark):
    from mr_lda_spark.operators.funnel import markov_transitions
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, 1, "a", ts(1), 0.0),
        (2, 1, "b", ts(2), 0.0),
        (3, 1, "a", ts(3), 0.0),
        (4, 2, "a", ts(1), 0.0),
        (5, 2, "b", ts(2), 0.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    got = {
        (r["src"], r["dst"]): (r["n"], r["n_src"], r["p_ppm"])
        for r in markov_transitions(events).collect()
    }
    assert got == {
        ("a", "b"): (2, 2, 1000000),
        ("b", "a"): (1, 1, 1000000),
    }


def test_markov_transitions_no_cross_user_pair(spark):
    from mr_lda_spark.operators.funnel import markov_transitions
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, "a", t0, 0.0),
        (2, 2, "b", t0, 0.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    assert markov_transitions(events).count() == 0


def test_windowed_funnel_not_greedy(spark):
    """The case that breaks greedy earliest-match: the first view's
    window expires before the click, but a later view converts."""
    import datetime
    from mr_lda_spark.operators.funnel import funnel_steps_windowed

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    gap = 10 * 60 * 1_000_000  # 10 minutes in us
    rows = [
        (1, 1, "view", ts(0), 0.0),      # expires (click at +15)
        (2, 1, "view", ts(12), 0.0),     # feasible start
        (3, 1, "click", ts(15), 0.0),    # within 10m of view@12
        (4, 1, "purchase", ts(20), 0.0),  # within 10m of click@15
        # user 2: greedy would also fail; no rescue view -> no convert
        (5, 2, "view", ts(0), 0.0),
        (6, 2, "click", ts(30), 0.0),
        (7, 2, "purchase", ts(31), 0.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    got = {
        r["user_id"]: (r["steps_completed"], r["converted"])
        for r in funnel_steps_windowed(
            events, ["view", "click", "purchase"], max_gap_us=gap
        ).collect()
    }
    assert got[1] == (3, True)
    assert got[2] == (1, False)


def test_windowed_funnel_earliest_feasible_timestamps(spark):
    import datetime
    from mr_lda_spark.operators.funnel import funnel_steps_windowed

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    gap = 60 * 60 * 1_000_000
    rows = [
        (1, 1, "view", ts(0), 0.0),
        (2, 1, "click", ts(5), 0.0),
        (3, 1, "click", ts(10), 0.0),   # feasible but later
        (4, 1, "purchase", ts(7), 0.0),  # after click@5 -> feasible
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    row = funnel_steps_windowed(
        events, ["view", "click", "purchase"], max_gap_us=gap
    ).collect()[0]
    us = lambda m: int((t0 + datetime.timedelta(minutes=m)).timestamp() * 1_000_000)  # noqa: E731
    assert row["t_2"] == us(5)      # earliest feasible click
    assert row["t_3"] == us(7)      # purchase after the EARLIEST click


def test_funnel_dropoff_attribution(spark):
    """Per-step loss attribution: reached/dropped/retained over a
    funnel where each step loses exactly one user; the last step
    retains everyone who reached it by construction."""
    import datetime

    from mr_lda_spark.operators.funnel import (
        funnel_dropoff,
        funnel_steps_windowed,
    )

    t0 = datetime.datetime(2026, 1, 1)
    m = lambda k: t0 + datetime.timedelta(minutes=k)  # noqa: E731
    rows = [
        # u1 converts; u2 stops after click; u3 only views
        (1, 1, "view", m(0), 0.0), (2, 1, "click", m(1), 0.0),
        (3, 1, "purchase", m(2), 0.0),
        (4, 2, "view", m(0), 0.0), (5, 2, "click", m(1), 0.0),
        (6, 3, "view", m(0), 0.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    steps = ["view", "click", "purchase"]
    f = funnel_steps_windowed(events, steps, max_gap_us=10 * 60 * 1_000_000)
    out = {r["step"]: r for r in funnel_dropoff(f, steps).collect()}
    assert (out[1]["reached"], out[1]["dropped_next"]) == (3, 1)
    assert (out[2]["reached"], out[2]["dropped_next"]) == (2, 1)
    assert (out[3]["reached"], out[3]["dropped_next"]) == (1, 0)
    assert out[1]["retained_ppm"] == 666666  # 2e6 div 3
    assert out[3]["retained_ppm"] == 1000000
    assert out[2]["event_type"] == "click"


def test_funnel_dropoff_empty(spark):
    """Zero users: reached 0 everywhere and retained_ppm NULL (no
    division by zero on either engine)."""
    from mr_lda_spark.operators.funnel import (
        funnel_dropoff,
        funnel_steps_windowed,
    )

    events = spark.createDataFrame(
        [],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    steps = ["view", "click"]
    f = funnel_steps_windowed(events, steps, max_gap_us=1_000_000)
    out = sorted(funnel_dropoff(f, steps).collect(), key=lambda r: r["step"])
    assert [r["reached"] for r in out] == [0, 0]
    assert [r["retained_ppm"] for r in out] == [None, None]
