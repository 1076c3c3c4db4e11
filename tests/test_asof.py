"""As-of join semantics on crafted sequences: prior-or-equal state
wins, no-prior-state yields NULL, and keys never cross."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_demos_spark.operators.relational import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "e1", 1.0),
            ("u1", 20, "e2", 2.0),
            ("u1", 30, "e3", 3.0),
            ("u2", 15, "e4", 4.0),   # u2 has no state at all
            ("u3", 5, "e5", 5.0),    # before u3's only state row
        ],
        "k string, ts long, event_id string, v double",
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, 100.0),  # exactly at e1's ts -> visible (<=)
            ("u1", 25, 200.0),
            ("u3", 7, 300.0),
        ],
        "k string, ts long, state double",
    )
    return left, right


def test_asof_prior_or_equal_state(frames):
    left, right = frames
    out = {
        r.event_id: r.state_asof
        for r in asof_join(left, right, "k", "ts", ["state"]).collect()
    }
    assert out == {
        "e1": 100.0,  # state at the same ts is visible
        "e2": 100.0,  # 25 > 20: the later state not yet visible
        "e3": 200.0,
        "e4": None,   # no state for u2 — keys don't leak
        "e5": None,   # state exists only later
    }


def test_asof_keeps_left_columns(frames):
    left, right = frames
    out = asof_join(left, right, "k", "ts", ["state"])
    assert set(out.columns) == {"k", "ts", "event_id", "v", "state_asof"}
    assert out.count() == left.count()


def test_interval_join_bucket_expansion(spark):
    from streaming_demos_spark.operators.relational import interval_join

    left = spark.createDataFrame(
        [("u1", 100, "e1"), ("u1", 250, "e2"), ("u1", 9000, "e3"),
         ("u2", 100, "e4")],
        "k string, ts long, event_id string",
    )
    # interval [50, 300] for u1 only; granularity smaller than interval
    right = spark.createDataFrame(
        [("u1", 50, 300)], "k string, s long, e long"
    )
    out = interval_join(left, right, "k", "ts", "s", "e", granularity_sec=100)
    assert sorted(r.event_id for r in out.collect()) == ["e1", "e2"]
    # boundary inclusivity on both ends
    edge = spark.createDataFrame([("u1", 50, "lo"), ("u1", 300, "hi")],
                                 "k string, ts long, event_id string")
    got = sorted(r.event_id for r in
                 interval_join(edge, right, "k", "ts", "s", "e", 100).collect())
    assert got == ["hi", "lo"]


def test_salted_join_matches_plain_join(spark):
    from streaming_demos_spark.operators.relational import salted_join

    # heavily skewed big side: one hot key
    big = spark.range(2000).select(
        F.when(F.col("id") < 1800, "hot").otherwise(F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("5", 2.0), ("1900", 3.0)], "k string, w double"
    )
    plain = big.join(small, "k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    salted = salted_join(big, small, "k", n_salts=8).agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    assert (plain.n, plain.sv, plain.sw) == (salted.n, salted.sv, salted.sw)
    # the hot key really spreads across salts
    spread = (
        big.withColumn("_s", F.pmod(F.xxhash64("k", "v"), F.lit(8)))
        .filter(F.col("k") == "hot")
        .select("_s").distinct().count()
    )
    assert spread == 8


def test_asof_single_shuffle_plan(frames, spark):
    import contextlib
    import io

    left, right = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, "k", "ts", ["state"]).explain("formatted")
    plan = buf.getvalue()
    # one hash-partitioning exchange on the key, no join operator at all
    # (the operator is union + window, not a range join)
    assert "Join" not in plan
    exchanges = [l for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(exchanges) == 1, exchanges
    assert "hashpartitioning(k" in plan


def test_funnel_requires_strict_order(spark):
    from streaming_demos_spark.operators import relational as R

    rows = [
        # u1: full ordered funnel
        (1, 1, 100.0, "view"), (2, 1, 200.0, "click"), (3, 1, 300.0, "purchase"),
        # u2: purchase BEFORE click -> stops at click (stage 2)
        (4, 2, 100.0, "view"), (5, 2, 300.0, "click"), (6, 2, 200.0, "purchase"),
        # u3: only a view (stage 1)
        (7, 3, 100.0, "view"),
        # u4: click without a prior view (stage 0)
        (8, 4, 100.0, "click"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "epoch", "event_type"]
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch")))
    out = {
        r.funnel_stage: r.n_keys
        for r in R.funnel_stages(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {3: 1, 2: 1, 1: 1, 0: 1}
