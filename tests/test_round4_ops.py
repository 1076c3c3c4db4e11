"""Round-4 operators: text normalization, deterministic shard
interleave, contamination matrix — semantics the synthetic corpus
can't pin down, on crafted micro-data."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


def test_normalize_text_strips_and_collapses(spark):
    from streaming_demos_spark.operators.text import normalize_text

    rows = [
        (1, "plain text"),
        (2, "  ragged \t\n  whitespace  "),
        (3, "zero​width‌ and﻿ bom"),
        (4, "ctrl\x00chars\x1fhere"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out[1].norm_text == "plain text" and not out[1].changed
    assert out[2].norm_text == "ragged whitespace" and out[2].changed
    assert out[3].norm_text == "zerowidth and bom" and out[3].changed
    assert out[4].norm_text == "ctrlcharshere" and out[4].changed
    assert out[5].norm_text == "" and not out[5].changed
    assert out[2].n_chars_raw == len(rows[1][1])
    assert out[2].n_chars_norm == len("ragged whitespace")


def test_normalize_then_hash_merges_noise_variants(spark):
    # the motivating property: byte-noise variants of one document get
    # ONE fingerprint after normalization
    from streaming_demos_spark.operators.text import normalize_text

    rows = [(1, "the same doc"), (2, " the\tsame  doc "), (3, "the same​ doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = (
        normalize_text(df)
        .select(F.md5("norm_text").alias("fp"))
        .distinct()
        .count()
    )
    assert fps == 1


def test_interleave_shards_deterministic_balanced_dense(spark):
    from streaming_demos_spark.operators.curation import interleave_shards

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    a = {r.doc_id: (r.shard, r.pos) for r in
         interleave_shards(df, n_shards=8, seed="s1").collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in
         interleave_shards(df.repartition(13), n_shards=8, seed="s1")
         .collect()}
    # layout-independent assignment
    assert a == b
    # positions are dense 1..n within each shard
    by_shard: dict = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # md5 balance: no shard is off by more than 2x from uniform
    sizes = [len(ps) for ps in by_shard.values()]
    assert len(sizes) == 8 and max(sizes) < 2 * (2000 / 8)
    # a different seed is a different permutation
    c = {r.doc_id: (r.shard, r.pos) for r in
         interleave_shards(df, n_shards=8, seed="s2").collect()}
    assert c != a


def test_contamination_matrix_hand_case(spark):
    from streaming_demos_spark.operators.curation import (
        contamination_matrix,
    )

    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps", "benchA"),
            (101, "lazy dogs sleep all day", "benchB"),
        ],
        "doc_id long, text string, bench string",
    )
    docs = spark.createDataFrame(
        [
            # leaks a 3-gram of benchA
            (1, "we saw the quick brown fox today", "s1"),
            # clean
            (2, "completely unrelated words here", "s1"),
            # leaks benchB
            (3, "lazy dogs sleep a lot", "s2"),
            # leaks BOTH
            (4, "quick brown fox and lazy dogs sleep", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source, r.benchmark): (r.n_contaminated, r.n_docs, r.rate)
        for r in contamination_matrix(
            docs, bench, bench_name_col="bench", k=3
        ).collect()
    }
    assert out[("s1", "benchA")] == (1, 2, 0.5)
    assert ("s1", "benchB") not in out
    assert out[("s2", "benchB")] == (2, 2, 1.0)
    assert out[("s2", "benchA")] == (1, 2, 0.5)
