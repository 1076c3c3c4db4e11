"""Unit tests for the analytic-window suite and the set-operation
summary — tiny crafted frames where every rank value is checkable by
hand; DuckDB parity at corpus scale lives in the oracle sweep."""

from __future__ import annotations

import datetime as dt

import pytest

from streaming_demos_spark.operators import relational as R


@pytest.fixture(scope="module")
def four_events(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "view", 10.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1), 7, "click", 12.5, "{}"),
        (3, t0 + dt.timedelta(seconds=2), 7, "buy", 12.0, "{}"),
        (4, t0 + dt.timedelta(seconds=3), 7, "view", 20.0, "{}"),
        (5, t0, 8, "view", 1.0, "{}"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_window_suite_values(four_events):
    out = {r.event_id: r for r in R.window_rank_suite(four_events).collect()}
    # lag delta: first row NULL, then pairwise differences
    assert out[1].value_delta_cents is None
    assert out[2].value_delta_cents == 250
    assert out[3].value_delta_cents == -50
    # lead: next event's type, NULL at the tail
    assert out[1].next_type == "click"
    assert out[4].next_type is None
    # ntile(4) over 4 rows = one row per quartile, in order
    assert [out[i].quartile for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    # percent_rank = (rank-1)/(n-1); cume_dist = rank/n
    assert out[1].pct_rank_e9 == 0 and out[4].pct_rank_e9 == 10 ** 9
    assert out[2].cume_e9 == 500000000
    # single-row key: percent_rank defined as 0, cume 1
    assert out[5].pct_rank_e9 == 0 and out[5].cume_e9 == 10 ** 9


def test_set_compare_counts(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(3,), (4,)], ["k"])
    row = R.set_compare(a, b).collect()[0]
    # distinct semantics throughout: duplicate 2 in a counts once
    assert (row.n_both, row.n_only_a, row.n_only_b, row.n_union) == (1, 2, 1, 4)
