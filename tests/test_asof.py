"""As-of join unit semantics: backward match, ties, no-match nulls."""
import pytest

import datetime as dt

from mr_lda_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.mark.slow
def test_asof_backward_match_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(20)),
            (3, "u2", _ts(5)),  # no prior right row → nulls
            (4, "u1", _ts(15)),  # tie with right at 15 → matches it
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts(8)),
            (101, "u1", _ts(15)),
            (102, "u2", _ts(30)),
        ],
        "rid long, user_id string, rts timestamp",
    )
    out = {
        r["event_id"]: r["rid_right"]
        for r in asof_join(
            left, right, by="user_id", left_ts="ts", right_ts="rts",
            right_payload=["rid"],
        ).collect()
    }
    assert out == {1: 100, 2: 101, 3: None, 4: 101}
