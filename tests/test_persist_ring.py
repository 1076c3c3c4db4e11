"""bounded_persist ring semantics (round-11 optimization, item 12).

Spark's CacheManager keys cached data on the CANONICALIZED plan, so
two bounded_persist calls with semantically-equal frames share one
cache entry. The ring must therefore hold ONE entry per distinct plan
(LRU-refreshed on re-request) — the old one-entry-per-call ring let an
evicted duplicate unpersist the shared entry out from under newer
consumers, re-materializing a family-shared projection once per query.
"""

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from streaming_demos_spark import catalog


@pytest.fixture(autouse=True)
def clean_ring():
    """Isolate every test from ring state left by other modules."""
    with catalog._PERSIST_RING_LOCK:
        old = list(catalog._PERSIST_RING)
        catalog._PERSIST_RING.clear()
    yield
    with catalog._PERSIST_RING_LOCK:
        ring = list(catalog._PERSIST_RING)
        catalog._PERSIST_RING.clear()
        catalog._PERSIST_RING.extend(old)
    for entry in ring:
        entry[0].unpersist(blocking=False)


def _frame(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("_tag")
    )


def test_same_plan_reuses_the_ring_entry(spark):
    a = catalog.bounded_persist(_frame(spark, 10, "x"), eager=True)
    b = catalog.bounded_persist(_frame(spark, 10, "x"), eager=True)
    # the semantically-equal re-request returns the FIRST frame and
    # adds no second ring entry
    assert b is a
    assert len(catalog._PERSIST_RING) == 1
    assert a.storageLevel != StorageLevel.NONE


def test_distinct_plans_get_distinct_entries_and_lru_eviction(spark):
    frames = [
        catalog.bounded_persist(_frame(spark, 10 + i, "y"), eager=False)
        for i in range(catalog._PERSIST_RING_CAP + 1)
    ]
    # cap holds: the OLDEST distinct plan was evicted and unpersisted
    assert len(catalog._PERSIST_RING) == catalog._PERSIST_RING_CAP
    assert frames[0].storageLevel == StorageLevel.NONE
    assert frames[-1].storageLevel != StorageLevel.NONE


def test_rerequest_refreshes_lru_order(spark):
    a = catalog.bounded_persist(_frame(spark, 21, "z"), eager=False)
    for i in range(catalog._PERSIST_RING_CAP - 1):
        catalog.bounded_persist(_frame(spark, 30 + i, "z"), eager=False)
    # a is now the LRU head; re-requesting it must move it to the back
    again = catalog.bounded_persist(_frame(spark, 21, "z"), eager=False)
    assert again is a
    catalog.bounded_persist(_frame(spark, 90, "z"), eager=False)
    # the eviction hit the SECOND-oldest entry, not the refreshed one
    assert a.storageLevel != StorageLevel.NONE


def test_eager_fill_runs_once_per_entry(spark):
    df = _frame(spark, 12, "w")
    a = catalog.bounded_persist(df, eager=True)
    with catalog._PERSIST_RING_LOCK:
        entry = next(e for e in catalog._PERSIST_RING if e[0] is a)
    assert entry[1] is True  # fill recorded
    # a warm re-request must not reset the fill flag
    b = catalog.bounded_persist(_frame(spark, 12, "w"), eager=True)
    assert b is a and entry[1] is True


def test_results_unchanged_through_the_ring(spark):
    df = _frame(spark, 7, "r").withColumn("sq", F.col("id") * F.col("id"))
    direct = [tuple(r) for r in df.collect()]
    ringed = [tuple(r) for r in catalog.bounded_persist(df, eager=True).collect()]
    assert sorted(direct) == sorted(ringed)
