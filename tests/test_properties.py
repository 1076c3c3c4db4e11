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


# word-level corpora for the near-dup properties: a tiny vocabulary
# forces real shingle overlap so LSH buckets actually collide
worded_texts_strategy = st.lists(
    st.lists(
        st.sampled_from(["red", "blue", "fox", "dog", "run", "sit"]),
        min_size=0,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@SET
@given(texts=worded_texts_strategy)
def test_lsh_verified_pairs_subset_of_exact_pairs(spark, texts):
    # The verify step makes LSH precision 1: every pair MinHash banding
    # surfaces AND exact-Jaccard-verifies must appear in the exhaustive
    # exact enumeration at the same threshold (LSH may MISS pairs —
    # that's recall, measured by llm_minhash_lsh_eval — but an emitted
    # pair that the exact join wouldn't emit means the verify predicate
    # and the ground-truth predicate have drifted apart).
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    found = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_near_dup_pairs(docs, threshold=0.3).collect()
    }
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert found <= truth


@SET
@given(texts=worded_texts_strategy)
def test_near_dup_clusters_keep_exactly_one_per_component(spark, texts):
    # keep-one-per-cluster invariants: every document labeled exactly
    # once, exactly one kept doc per component, and the kept doc is the
    # component's minimum id (the canonical-representative rule).
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = D.near_dup_clusters(docs, threshold=0.3).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(texts)))
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        kept = [r for r in members if r.is_kept]
        assert len(kept) == 1 and kept[0].doc_id == comp == min(
            r.doc_id for r in members
        )
        assert all(r.n_members == len(members) for r in members)


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


# Change logs: (key 1-3, op index) sequences; lsn = position in list so
# every log is a valid total order.
changelog_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.sampled_from(["c", "u", "d"]),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=20,
)


@SET
@given(changelog_strategy)
def test_scd2_intervals_partition_history(spark, log):
    """SCD-2 invariants on arbitrary change logs: per key the surviving
    intervals chain contiguously (each valid_to equals the next
    valid_from or closes the key), at most one interval is current, and
    the current slice equals apply_changes' compacted state."""
    from streaming_demos_spark.sources import cdc

    rows = [(k, float(p), op, i) for i, (k, op, p) in enumerate(log)]
    df = spark.createDataFrame(rows, ["k", "price", "op", "lsn"])
    hist = cdc.scd2_history(df, ["k"], seq_col="lsn").collect()
    by_key: dict = {}
    for r in sorted(hist, key=lambda r: (r.k, r.valid_from)):
        by_key.setdefault(r.k, []).append(r)
    # all upserts survive; nothing else does
    assert len(hist) == sum(1 for _, op, _ in log if op != "d")
    for k, versions in by_key.items():
        currents = [v for v in versions if v.is_current]
        assert len(currents) <= 1
        closes = {r.lsn for r in df.collect() if r.k == k}
        for a, b in zip(versions, versions[1:]):
            # a's interval ends at SOME later change to the same key
            assert a.valid_to is not None and a.valid_to > a.valid_from
            assert a.valid_to in closes
        assert (versions[-1].valid_to is None) == versions[-1].is_current
    current = {r.k: r.price for r in hist if r.is_current}
    compacted = {
        r.k: r.price
        for r in cdc.apply_changes(df, ["k"], seq_col="lsn").collect()
    }
    assert current == compacted


docs_strategy = st.lists(
    st.text(alphabet="abc 01", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


@SET
@given(docs_strategy)
def test_quality_filter_passes_is_conjunction(spark, texts):
    from streaming_demos_spark.operators import curation as CU

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for r in CU.quality_filter(df).collect():
        assert r.passes == (
            r.ok_tokens and r.ok_word_len and r.ok_alpha_words and r.ok_stopwords
        )


@SET
@given(st.lists(st.tuples(st.sampled_from(["g", "h"]),
                          st.floats(min_value=-50, max_value=50,
                                    allow_nan=False)),
                min_size=1, max_size=30))
def test_value_histogram_partitions_rows(spark, rows):
    from streaming_demos_spark.operators import relational as R

    df = spark.createDataFrame([(g, float(v)) for g, v in rows], ["grp", "val"])
    out = R.value_histogram(df, "grp", "val", bins=5).collect()
    per_group: dict = {}
    for r in out:
        assert 0 <= r.bin < 5
        assert r.bin_min <= r.bin_max
        per_group[r.grp] = per_group.get(r.grp, 0) + r.n_rows
    from collections import Counter

    assert per_group == dict(Counter(g for g, _ in rows))


# --- round-3 batch-5 invariants ----------------------------------------------

kv_table = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=5)),
    min_size=0, max_size=20,
    unique_by=lambda t: t[0],
)


@SET
@given(old=kv_table, new=kv_table)
def test_snapshot_diff_applies_back_exactly(spark, old, new):
    """For ANY two keyed tables: old + diff == new (apply-back law),
    and unchanged keys never appear in the diff."""
    from streaming_demos_spark.sources.cdc import snapshot_diff

    schema = "k long, v long"
    o = spark.createDataFrame([(k, float(v)) for k, v in old], "k long, v double")
    n = spark.createDataFrame([(k, float(v)) for k, v in new], "k long, v double")
    diff = snapshot_diff(o, n, ["k"]).collect()
    ops = {r.k: r.op for r in diff}
    od, nd = dict(old), dict(new)
    for k in set(od) | set(nd):
        if k in od and k not in nd:
            assert ops.get(k) == "d"
        elif k not in od and k in nd:
            assert ops.get(k) == "i"
        elif od[k] != nd[k]:
            assert ops.get(k) == "u"
        else:
            assert k not in ops  # unchanged -> silent


@SET
@given(texts=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8)
    .map(" ".join),
    min_size=1, max_size=10))
def test_block_dedup_conserves_blocks_and_keeps_first(spark, texts):
    """Block counts are conserved, every block content survives exactly
    once corpus-wide, and the first document always keeps its first
    block."""
    from streaming_demos_spark.operators import dedup as DD

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = DD.block_dedup(df, block_words=2).collect()
    assert sum(r.n_blocks for r in out) >= len(texts)  # >= one block per doc
    total_kept = sum(r.n_kept for r in out)
    distinct_blocks = (
        df.select(F.explode(F.split("text", " ")).alias("w")).count()
    )  # coarse upper bound sanity
    assert 0 < total_kept <= distinct_blocks
    first = next(r for r in out if r.doc_id == 0)
    assert first.n_kept >= 1  # doc 0 owns the first occurrence of its block 0


@SET
@given(vals=st.lists(
    st.tuples(st.integers(min_value=0, max_value=1000),
              st.integers(min_value=0, max_value=1000)),
    min_size=2, max_size=30))
def test_zorder_key_is_injective_on_quantized_inputs(spark, vals):
    """Morton interleave is a bijection on (a, b) pairs: distinct pairs
    get distinct z-values, and z decodes back to exactly (a, b)."""
    from streaming_demos_spark.catalog import zorder_key

    df = spark.createDataFrame(list(set(vals)), "a long, b long")
    rows = df.select("a", "b", zorder_key([F.col("a"), F.col("b")]).alias("z")).collect()
    assert len({r.z for r in rows}) == len(rows)
    for r in rows:
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=12),
            st.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gapfill_grid_dense_and_bounded(spark, rows):
    """time_bucket_gapfill invariants on arbitrary sparse series:
    dense grid per key, observed rows pass through, every filled value
    lies within [min, max] of the key's observations (interpolation
    and LOCF/backfill cannot extrapolate)."""
    import datetime

    from streaming_demos_spark.operators.relational import (
        time_bucket_gapfill,
    )

    day = 86400
    data = [
        (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), v)
        for k, d, v in rows
    ]
    df = spark.createDataFrame(data, "k string, ts timestamp, v double")
    out = time_bucket_gapfill(df, "k", "ts", "v", day).collect()
    buckets = sorted({r.bucket for r in out})
    assert buckets == list(range(buckets[0], buckets[-1] + 1))
    keys = {r.k for r in out}
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    lo_all, hi_all = buckets[0], buckets[-1]
    for k, rs in by_key.items():
        assert sorted(r.bucket for r in rs) == list(
            range(lo_all, hi_all + 1)
        )
        obs = [r.filled for r in rs if r.method == "observed"]
        lo, hi = min(obs), max(obs)
        for r in rs:
            assert r.filled is not None
            assert lo - 1e-6 <= r.filled <= hi + 1e-6, (k, r)
            if r.observed is not None:
                assert r.method == "observed" and r.filled == r.observed
