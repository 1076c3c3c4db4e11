"""Property-based invariants (SURVEY.md §5.2): aggregate partition
laws, dedup conservation, and metric bounds over hypothesis-generated
inputs. Example counts are small — each example compiles a Spark job —
but the properties are the ones that catch semantic drift:

- late + on-time partitions the input (T6/T7)
- windowed sums partition the global sum (A5)
- countDistinct <= count (A1)
- dedup groups conserve row count (exact dedup)
- AUC stays in [0, 1] and is invariant to score scaling (eval)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streaming_demos_spark.operators import dedup as D
from streaming_demos_spark.operators import linucb as LU
from streaming_demos_spark.streaming import supplier_stats as SS

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, epoch-second, price) event streams
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=400),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
)


def _events_df(spark, events):
    rows = [
        (k, i, f"2024-01-01 00:{ts // 60:02d}:{ts % 60:02d}", p)
        for i, (k, ts, p) in enumerate(events)
    ]
    return SS.with_event_time(
        spark.createDataFrame(rows, ["supplier", "seq", "bid_time", "price"])
    )


@SET
@given(events=events_strategy)
def test_late_plus_ontime_partitions_input(spark, events):
    df = _events_df(spark, events)
    tagged = SS.tag_late_batch(df, "supplier", "seq").cache()
    n_all = tagged.count()
    n_late = tagged.filter("is_late").count()
    n_ok = tagged.filter("NOT is_late").count()
    assert n_late + n_ok == n_all == len(events)


@SET
@given(events=events_strategy)
def test_window_sums_partition_global_sum(spark, events):
    df = _events_df(spark, events)
    stats = SS.supplier_stats(df).cache()
    r = stats.agg(
        F.sum("total_price").alias("tp"), F.sum("count").alias("n"),
        F.count("*").alias("windows"),
    ).collect()[0]
    direct = sum(p for _, _, p in events)
    # each window's total is rounded to 2dp at emission -> the partition
    # law holds within half a cent per window
    assert abs(r.tp - direct) <= 0.005 * r.windows + 1e-9
    assert r.n == len(events)


@SET
@given(events=events_strategy)
def test_count_distinct_le_count(spark, events):
    df = _events_df(spark, events)
    r = df.agg(
        F.countDistinct("supplier").alias("d"), F.count("*").alias("n")
    ).collect()[0]
    assert r.d <= r.n


texts_strategy = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=12), min_size=1, max_size=15
)


@SET
@given(texts=texts_strategy)
def test_exact_dedup_conserves_rows(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    groups = D.exact_dedup_groups(docs).collect()
    assert sum(g.n_copies for g in groups) == len(texts)
    assert len({g.text_hash for g in groups}) == len(groups)
    kept = D.exact_dedup(docs).count()
    assert kept == len(groups)


scores_strategy = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=2,
    max_size=20,
).filter(lambda xs: 0 < sum(l for _, l in xs) < len(xs))  # both classes


@SET
@given(scored=scores_strategy)
def test_auc_bounded_and_scale_invariant(spark, scored):
    df = spark.createDataFrame(scored, ["score", "reward"])
    a1 = LU.auc(df).collect()[0].auc
    assert 0.0 <= a1 <= 1.0
    scaled = df.select((F.col("score") * 10.0).alias("score"), "reward")
    assert LU.auc(scaled).collect()[0].auc == a1
