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
    from streaming_demos_spark.operators.text import normalize_documents

    rows = [
        (1, "plain text"),
        (2, "  ragged \t\n  whitespace  "),
        (3, "zero​width‌ and﻿ bom"),
        (4, "ctrl\x00chars\x1fhere"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_documents(df).collect()}
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
    from streaming_demos_spark.operators.text import normalize_documents

    rows = [(1, "the same doc"), (2, " the\tsame  doc "), (3, "the same​ doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = (
        normalize_documents(df)
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
        (r.source, r.benchmark): (r.n_contaminated, r.n_docs, r.rate_e6)
        for r in contamination_matrix(
            docs, bench, bench_name_col="bench", k=3
        ).collect()
    }
    assert out[("s1", "benchA")] == (1, 2, 500000)
    assert ("s1", "benchB") not in out
    assert out[("s2", "benchB")] == (2, 2, 1000000)
    assert out[("s2", "benchA")] == (1, 2, 500000)


def test_gapfill_interpolation_hand_case(spark):
    import datetime

    from streaming_demos_spark.operators.relational import (
        time_bucket_gapfill,
    )

    day = 86400

    def ts(d):
        return datetime.datetime(2024, 1, 1 + d)

    rows = [
        # key 'a': observed on days 0 and 3 -> days 1,2 interpolate
        ("a", ts(0), 10.0),
        ("a", ts(3), 40.0),
        # key 'b': observed only on day 1 -> locf right, backfill left
        ("b", ts(1), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.bucket): (r.observed, r.filled, r.method)
        for r in time_bucket_gapfill(df, "k", "ts", "v", day).collect()
    }
    base = min(b for (_, b) in out)
    a = lambda d: out[("a", base + d)]  # noqa: E731
    b = lambda d: out[("b", base + d)]  # noqa: E731
    assert a(0) == (10.0, 10.0, "observed")
    assert a(1) == (None, 20.0, "interpolated")
    assert a(2) == (None, 30.0, "interpolated")
    assert a(3) == (40.0, 40.0, "observed")
    assert b(0) == (None, 7.0, "backfill")
    assert b(1) == (7.0, 7.0, "observed")
    assert b(2) == (None, 7.0, "locf")
    assert b(3) == (None, 7.0, "locf")
    # dense grid: every key covers the full observed range
    assert len(out) == 8


def test_textrank_hub_word_ranks_first(spark):
    from streaming_demos_spark.operators.text import textrank_keywords

    # 'hub' is adjacent to every other content word; stopwords and short
    # tokens never appear as nodes
    rows = [
        (1, "hub alpha the hub beta"),
        (2, "gamma hub of hub delta"),
        (3, "alpha beta it gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_keywords(df, k=10).collect()
    assert out[0].term == "hub"
    terms = {r.term for r in out}
    assert "the" not in terms and "of" not in terms and "it" not in terms
    # deterministic across layouts
    out2 = textrank_keywords(df.repartition(5), k=10).collect()
    assert [(r.term, r.rank) for r in out] == [
        (r.term, r.rank) for r in out2
    ]


def test_pivot_declared_values_and_zero_cells(spark):
    from streaming_demos_spark.operators.relational import pivot_metric

    rows = [("p1", "x", 1.0), ("p1", "x", 2.0), ("p2", "y", 5.0)]
    df = spark.createDataFrame(rows, "r string, c string, v double")
    out = {r.r: r for r in
           pivot_metric(df, "r", "c", "v", ["x", "y", "z"]).collect()}
    assert out["p1"].x == 3.0 and out["p1"].y == 0.0 and out["p1"].z == 0.0
    assert out["p2"].y == 5.0 and out["p2"].x == 0.0
    # an undeclared category is dropped, not a new column
    assert set(out["p1"].asDict()) == {"r", "x", "y", "z"}


def test_unpivot_roundtrip(spark):
    from streaming_demos_spark.operators.relational import (
        pivot_metric,
        unpivot_metrics,
    )

    rows = [(1, 2.0, 3.0), (2, 5.0, 7.0)]
    df = spark.createDataFrame(rows, "id long, m1 double, m2 double")
    tidy = unpivot_metrics(df, "id", ["m1", "m2"])
    assert tidy.count() == 4
    back = pivot_metric(tidy, "id", "metric", "value", ["m1", "m2"])
    got = {r.id: (r.m1, r.m2) for r in back.collect()}
    assert got == {1: (2.0, 3.0), 2: (5.0, 7.0)}


def test_correlation_matrix_known_values(spark):
    from streaming_demos_spark.operators.relational import (
        correlation_matrix,
    )

    rows = [(float(i), 2.0 * i + 1, -3.0 * i, 4.0) for i in range(10)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r.col_a, r.col_b): r.corr
           for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0
    # constant column -> NULL corr, not an error
    assert out[("a", "d")] is None
    assert len(out) == 6


def _jsonl_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )


def test_read_jsonl_bad_row_policies(spark, tmp_path):
    from streaming_demos_spark.sources.files import read_jsonl

    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 0.5}\n'
        "this is not json\n"
        '{"id": 2, "name": "b", "score": 1.5}\n'
        '{"id": "notanint", "name": "c", "score": 2.5}\n'
    )
    sch = _jsonl_schema()
    dropped = read_jsonl(spark, str(p), sch, bad_rows="drop").collect()
    assert sorted(r.id for r in dropped) == [1, 2]
    perm = read_jsonl(spark, str(p), sch, bad_rows="permissive").collect()
    assert len(perm) == 4  # broken lines kept, fields null
    assert sum(1 for r in perm if r.id is None) == 2
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_jsonl(spark, str(p), sch, bad_rows="fail").collect()


def test_parse_json_lines_matches_file_scan(spark):
    from streaming_demos_spark.sources.files import parse_json_lines

    lines = [
        ('{"id": 7, "name": "x", "score": 9.0}',),
        ("garbage",),
        ('{"id": 8, "name": "y", "score": null}',),
    ]
    df = spark.createDataFrame(lines, "line string")
    out = parse_json_lines(df, "line", _jsonl_schema(), bad_rows="drop")
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {7: ("x", 9.0), 8: ("y", None)}
    kept = parse_json_lines(
        df, "line", _jsonl_schema(), bad_rows="permissive"
    )
    assert kept.count() == 3


def test_read_jsonl_stream_bounded(spark, tmp_path):
    from streaming_demos_spark.sources.files import read_jsonl_stream

    d = tmp_path / "stream"
    d.mkdir()
    (d / "part1.jsonl").write_text(
        '{"id": 1, "name": "a", "score": 0.1}\nbad line\n'
        '{"id": 2, "name": "b", "score": 0.2}\n'
    )
    stream = read_jsonl_stream(spark, str(d), _jsonl_schema())
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_bounded")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM jsonl_bounded").collect()
    assert sorted(r.id for r in got) == [1, 2]


def test_preference_pairs_hand_case_and_ties(spark):
    from streaming_demos_spark.operators.curation import preference_pairs

    rows = [
        # g1: clear best/worst
        (1, "g1", 9.0), (2, "g1", 1.0), (3, "g1", 5.0),
        # g2: tie on max score -> larger id wins chosen slot
        (4, "g2", 7.0), (5, "g2", 7.0), (6, "g2", 2.0),
        # g3: singleton -> no pair
        (7, "g3", 4.0),
        # g4: all equal -> margin 0, dropped at min_margin > 0
        (8, "g4", 3.0), (9, "g4", 3.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    out = {r.g: r for r in
           preference_pairs(df, "g", "s", min_margin=0.5).collect()}
    assert out["g1"].chosen_id == 1 and out["g1"].rejected_id == 2
    assert out["g1"].margin == 8.0 and out["g1"].n_docs == 3
    assert out["g2"].chosen_id == 5 and out["g2"].rejected_id == 6
    assert "g3" not in out and "g4" not in out
    # margin 0 pairs allowed at min_margin=0 ONLY when ids differ
    z = {r.g: r for r in preference_pairs(df, "g", "s").collect()}
    assert z["g4"].chosen_id == 9 and z["g4"].rejected_id == 8


def test_bootstrap_ci_sanity(spark):
    from streaming_demos_spark.operators.relational import bootstrap_mean_ci

    rows = [(i, "g", float(50 + (i * 37) % 11)) for i in range(400)]
    rows += [(1000 + i, "const", 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.g: r for r in
           bootstrap_mean_ci(df, "g", "v", "id", n_replicates=100).collect()}
    g = out["g"]
    # CI brackets the sample mean and is a genuine interval
    assert g.ci_lo <= g.mean <= g.ci_hi
    assert g.ci_lo < g.ci_hi
    assert g.n_used == 100
    # constant data -> every replicate mean equals the value
    c = out["const"]
    assert c.ci_lo == 5.0 and c.ci_hi == 5.0 and c.mean == 5.0
    # layout-independent (content-keyed draws)
    out2 = {r.g: r for r in
            bootstrap_mean_ci(df.repartition(13), "g", "v", "id",
                              n_replicates=100).collect()}
    assert out2["g"].ci_lo == g.ci_lo and out2["g"].ci_hi == g.ci_hi


def test_grouped_ols_recovers_planted_coefficients(spark):
    import numpy as np

    from streaming_demos_spark.operators.relational import grouped_ols

    rng = [(i * 37) % 11 - 5.0 for i in range(60)]
    rows = []
    for i in range(60):
        x1, x2 = float(i % 7), rng[i]
        # exact linear: y = 3 + 2*x1 - 0.5*x2  (R^2 = 1)
        rows.append(("exact", x1, x2, 3.0 + 2.0 * x1 - 0.5 * x2, i))
        # singular: x2 = 2*x1 (collinear) -> NULL coefficients
        rows.append(("collinear", x1, 2.0 * x1, 1.0 + x1, i))
        # constant y -> R^2 NULL (SST = 0)
        rows.append(("const_y", x1, x2, 42.0, i))
    df = spark.createDataFrame(
        rows, "g string, x1 double, x2 double, y double, i long"
    )
    out = {r.g: r for r in grouped_ols(df, "g", "y", "x1", "x2").collect()}
    e = out["exact"]
    assert abs(e.b0 - 3.0) < 1e-5 and abs(e.b1 - 2.0) < 1e-5
    assert abs(e.b2 + 0.5) < 1e-5 and abs(e.r2 - 1.0) < 1e-6
    assert out["collinear"].b1 is None and out["collinear"].b2 is None
    c = out["const_y"]
    assert c.r2 is None
    # numpy cross-check on the exact group
    X = np.array([[1.0, r[1], r[2]] for r in rows if r[0] == "exact"])
    yv = np.array([r[3] for r in rows if r[0] == "exact"])
    beta = np.linalg.lstsq(X, yv, rcond=None)[0]
    assert np.allclose([e.b0, e.b1, e.b2], beta, atol=1e-5)


def test_histogram_2d_cells_and_degenerate_axis(spark):
    from streaming_demos_spark.operators.relational import histogram_2d

    rows = [(float(i % 10), float(i % 4), i) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y double, i long")
    out = histogram_2d(df, "x", "y", bins_x=3, bins_y=2).collect()
    # totals conserved; max-value rows land in the LAST bin, not out
    assert sum(r.n_rows for r in out) == 200
    assert max(r.bin_x for r in out) == 2 and max(r.bin_y for r in out) == 1
    for r in out:
        assert 0 <= r.bin_x <= 2 and 0 <= r.bin_y <= 1
        assert r.x_lo < r.x_hi and r.y_lo < r.y_hi
    # constant y axis -> everything in bin_y 0, no divide error
    dfc = spark.createDataFrame(
        [(float(i), 5.0, i) for i in range(50)], "x double, y double, i long"
    )
    outc = histogram_2d(dfc, "x", "y", bins_x=4, bins_y=4).collect()
    assert {r.bin_y for r in outc} == {0}
    assert sum(r.n_rows for r in outc) == 50


def test_nelson_aalen_hand_case(spark):
    from streaming_demos_spark.operators.relational import nelson_aalen

    # durations: t=1 (2 events of 5 at risk), t=2 (1 censored),
    # t=3 (1 event of 2 at risk), t=4 (1 censored)
    rows = [(1, True), (1, True), (2, False), (3, True), (4, False)]
    df = spark.createDataFrame(rows, "t int, ev boolean")
    out = {r.t: r for r in nelson_aalen(df, "t", "ev").collect()}
    assert set(out) == {1, 3}  # censored-only steps emit no row
    assert out[1].n_at_risk == 5 and out[1].n_events == 2
    assert out[1].cum_hazard_ppm == 400000  # 2/5 in ppm, exact
    assert out[3].n_at_risk == 2 and out[3].n_events == 1
    assert out[3].cum_hazard_ppm == 900000  # 2/5 + 1/2 in ppm, exact


def test_association_rules_hand_case(spark):
    from streaming_demos_spark.operators.relational import association_rules

    # 4 baskets: {a,b} {a,b} {a,c} {b}; duplicate item rows collapse.
    rows = [
        (1, "a"), (1, "b"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules(df, "bk", "it", top_n=10).collect()
    }
    # counts: a=3 b=3 c=1 baskets; pairs: ab=2, ac=1 (directional)
    ab = out[("a", "b")]
    assert ab.pair_n == 2
    assert ab.support_e6 == 500000
    assert ab.confidence_e6 == 666667
    assert ab.lift_e6 == 888889  # (2/3)/(3/4) = 8/9, half-up e6
    ac = out[("a", "c")]
    assert ac.confidence_e6 == 333333
    assert ac.lift_e6 == 1333333  # (1/3)/(1/4) = 4/3
    # both directions emitted, lift symmetric
    assert out[("b", "a")].lift_e6 == ab.lift_e6
    assert out[("c", "a")].pair_n == 1


def test_rfm_segmentation_scores(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import rfm_segmentation

    # 4 customers with strictly increasing recency/frequency/monetary:
    # each quartile boundary separates them into distinct scores.
    rows = []
    for c, (days_ago, n_orders, amount) in enumerate(
        [(0, 8, 800.0), (10, 4, 400.0), (20, 2, 200.0), (30, 1, 100.0)]
    ):
        for i in range(n_orders):
            rows.append(
                (c, dt.datetime(2024, 3, 1) - dt.timedelta(days=days_ago + i),
                 amount / n_orders)
            )
    df = spark.createDataFrame(rows, "cust int, d timestamp, amt double")
    out = rfm_segmentation(df, "cust", "d", "amt").collect()
    # 4 distinct customers -> 4 populated cells, one customer each
    assert len(out) == 4 and all(r.n_customers == 1 for r in out)
    cells = {(r.r_score, r.f_score, r.m_score) for r in out}
    # the best customer is (4,4,4), the worst (1,1,1)
    assert (4, 4, 4) in cells and (1, 1, 1) in cells
    for r in out:
        assert 1 <= r.r_score <= 4
        # scores agree across the three dimensions by construction
        assert r.r_score == r.f_score == r.m_score


def test_containment_pairs_fragment_detection(spark):
    from streaming_demos_spark.operators.dedup import containment_pairs

    # doc 2 is a verbatim fragment of doc 1: containment(2->1) = 1.0
    # but Jaccard is low (union dominated by doc 1's extra shingles).
    long_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    frag = "gamma delta epsilon zeta"
    other = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, long_text), (2, frag), (3, other)], "doc_id int, text string"
    )
    out = {(r.doc_a, r.doc_b): r for r in containment_pairs(df, threshold=0.5).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # frag has 2 3-shingles, both inside doc 1 (8 shingles)
    assert r.containment_b_e4 == 10000
    assert r.containment_a_e4 == 2500
    # symmetric Jaccard would be 2/8 = 0.25 — below threshold; the
    # asymmetric measure is what surfaces the pair
    assert max(r.containment_a_e4, r.containment_b_e4) >= 5000


def test_containment_pairs_threshold_excludes(spark):
    from streaming_demos_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y"), (3, "p q r s t")],
        "doc_id int, text string",
    )
    # docs 1,2 share shingle "a b c" only: containment 1/3 each side
    assert containment_pairs(df, threshold=0.5).count() == 0
    low = {(r.doc_a, r.doc_b) for r in containment_pairs(df, threshold=0.3).collect()}
    assert low == {(1, 2)}


def test_edit_distance_pairs_blocking_and_distance(spark):
    from streaming_demos_spark.operators.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog " * 3
    # edits must land PAST the 32-char blocking prefix (prefix blocking
    # deliberately trades recall on early-char noise for scale)
    ocr = base[:44] + base[44:].replace("jumps", "junps").replace("lazy", "1azy")
    unrelated = "completely different content here " * 4
    # same-prefix different-length-band doc must NOT be compared
    longer = base + "x" * 300
    df = spark.createDataFrame(
        [(1, base), (2, ocr), (3, unrelated), (4, longer)],
        "doc_id int, text string",
    )
    out = {(r.doc_a, r.doc_b): r.edit_dist for r in edit_distance_pairs(df).collect()}
    assert (1, 2) in out
    # two single-char substitutions per repeat within the 256-char cap
    assert 0 < out[(1, 2)] <= 24
    assert all(3 not in pair for pair in out)
    assert all(4 not in pair for pair in out)  # length band excludes


def test_edit_distance_pairs_identical_docs_zero(spark):
    from streaming_demos_spark.operators.dedup import edit_distance_pairs

    t = "identical text body for exact duplicate detection " * 2
    df = spark.createDataFrame(
        [(7, t), (9, "  " + t.upper() + " ")], "doc_id int, text string"
    )
    # normalization (lower+trim) makes them equal -> distance 0
    out = edit_distance_pairs(df).collect()
    assert len(out) == 1 and out[0].edit_dist == 0


def test_link_prediction_hand_case(spark):
    from streaming_demos_spark.operators.graph import link_prediction

    import math

    # path graph 1-2-3 plus 2-4: common neighbor 2 (deg 3) for pairs
    # (1,3), (1,4), (3,4); no pair is adjacent.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src int, dst int"
    )
    out = {(r.node_a, r.node_b): r for r in link_prediction(edges).collect()}
    assert set(out) == {(1, 3), (1, 4), (3, 4)}
    for r in out.values():
        assert r.common_neighbors == 1
        assert r.aa_score == pytest.approx(1 / math.log(3), abs=1e-6)


def test_link_prediction_excludes_existing_and_hubs(spark):
    from streaming_demos_spark.operators.graph import link_prediction

    # triangle 1-2-3: every 2-path closes into an existing edge ->
    # nothing to predict
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src int, dst int"
    )
    assert link_prediction(tri).count() == 0
    # star around hub 9: max_degree below the hub degree kills all wedges
    star = spark.createDataFrame(
        [(9, i) for i in range(1, 6)], "src int, dst int"
    )
    assert link_prediction(star, max_degree=4).count() == 0
    assert link_prediction(star, max_degree=5).count() == 10


def test_k_anonymity_profile_hand_case(spark):
    from streaming_demos_spark.operators.curation import k_anonymity_profile

    rows = [
        ("us", 30, "a"), ("us", 30, "a"), ("us", 30, "b"),
        ("us", 40, "a"),
        ("de", 30, "b"), ("de", 30, "b"),
    ]
    df = spark.createDataFrame(rows, "country string, age int, diag string")
    out = {
        (r.country, r.age): r
        for r in k_anonymity_profile(
            df, ["country", "age"], sensitive_col="diag", k=3
        ).collect()
    }
    # ("us", 30) has 3 records -> k-anonymous at k=3, excluded
    assert set(out) == {("us", 40), ("de", 30)}
    assert out[("us", 40)].class_size == 1
    assert out[("us", 40)].max_reident_risk_e6 == 1000000
    # ("de", 30): 2 records, but l_diversity 1 -> homogeneity leak
    assert out[("de", 30)].class_size == 2
    assert out[("de", 30)].l_diversity == 1


def test_fs_match_scores_weights_and_decisions(spark):
    import math

    from streaming_demos_spark.operators.relational import fs_match_scores

    pairs = spark.createDataFrame(
        [(1, 2, True, True), (1, 3, True, False), (1, 4, False, False)],
        "id_a int, id_b int, name_agree boolean, bal_agree boolean",
    )
    mu = {"name_agree": (0.9, 0.1), "bal_agree": (0.8, 0.2)}
    out = {(r.id_a, r.id_b): r for r in fs_match_scores(
        pairs, mu, upper=5.0, lower=0.0
    ).collect()}
    w_n, w_b = math.log2(9.0), math.log2(4.0)
    wn_dis = math.log2(0.1 / 0.9)
    wb_dis = math.log2(0.2 / 0.8)
    assert out[(1, 2)].match_weight == pytest.approx(w_n + w_b, abs=1e-6)
    assert out[(1, 2)].decision == "match"
    assert out[(1, 3)].match_weight == pytest.approx(w_n + wb_dis, abs=1e-6)
    assert out[(1, 3)].decision == "possible_match"
    assert out[(1, 4)].match_weight == pytest.approx(
        wn_dis + wb_dis, abs=1e-6
    )
    assert out[(1, 4)].decision == "non_match"


def test_bloom_no_false_negatives_and_merge(spark):
    from streaming_demos_spark.operators.sketches import bloom_bits, bloom_probe

    build = spark.createDataFrame([(i,) for i in range(100)], "k int")
    bits = bloom_bits(build, "k", num_hashes=3, num_bits=4096)
    probes = spark.createDataFrame([(i,) for i in range(200)], "k int")
    out = {r.k: r.bloom_hit for r in bloom_probe(
        bits, probes, "k", num_hashes=3, num_bits=4096
    ).collect()}
    # every built key MUST hit (no false negatives)
    assert all(out[i] for i in range(100))
    # fp rate among the 100 absent keys stays near (1-e^{-kn/m})^k ~ 0.04%
    fps = sum(out[i] for i in range(100, 200))
    assert fps <= 5
    # merging two filters = union of bit frames
    b2 = bloom_bits(
        spark.createDataFrame([(i,) for i in range(100, 200)], "k int"),
        "k", num_hashes=3, num_bits=4096,
    )
    merged = bits.union(b2).distinct()
    out2 = {r.k: r.bloom_hit for r in bloom_probe(
        merged, probes, "k", num_hashes=3, num_bits=4096
    ).collect()}
    assert all(out2[i] for i in range(200))


def test_bloom_probe_duplicate_rows_still_hit(spark):
    from streaming_demos_spark.operators.sketches import bloom_bits, bloom_probe

    build = spark.createDataFrame([(1,), (2,)], "k int")
    bits = bloom_bits(build, "k")
    # duplicate probe rows collapse in the groupBy; the all-bits-set
    # test must not double-count
    probes = spark.createDataFrame([(1,), (1,), (3,), (3,)], "k int")
    out = {r.k: r.bloom_hit for r in bloom_probe(bits, probes, "k").collect()}
    assert out[1] is True


def test_grid_group_median_odd_even_and_ties(spark):
    from streaming_demos_spark.operators.stats import grid_group_median

    rows = [
        ("odd", 1.0), ("odd", 5.0), ("odd", 3.0),
        ("even", 1.0), ("even", 2.0), ("even", 10.0), ("even", 20.0),
        ("tied", 4.0), ("tied", 4.0), ("tied", 4.0), ("tied", 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r["_med"] for r in grid_group_median(df, "g", "v").collect()}
    assert out["odd"] == 3.0
    assert out["even"] == 6.0  # (2 + 10) / 2
    assert out["tied"] == 4.0  # both middles inside the tie run


def _py_midranks(values):
    # average-rank reference, O(n log n), for micro-data only
    s = sorted(values)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
    count = {}
    for v in s:
        count[v] = count.get(v, 0) + 1
    return {v: first[v] + (count[v] - 1) / 2.0 for v in count}


def test_kruskal_wallis_matches_textbook_formula(spark):
    from streaming_demos_spark.operators.stats import kruskal_wallis

    groups = {
        "a": [2.0, 4.0, 4.0, 7.0],
        "b": [1.0, 4.0, 9.0],
        "c": [3.0, 5.0, 8.0, 8.0, 12.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    everything = [v for vs in groups.values() for v in vs]
    mid = _py_midranks(everything)
    n = len(everything)
    rr = sum(
        sum(mid[v] for v in vs) ** 2 / len(vs) for vs in groups.values()
    )
    h = 12.0 / (n * (n + 1)) * rr - 3.0 * (n + 1)
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(everything).values())
    h_c = h / (1.0 - ties / (n**3 - n))

    df = spark.createDataFrame(rows, "g string, v double")
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert row.k_groups == 3 and row.n_total == n and row.dof == 2
    assert abs(row.h_stat - round(h, 6)) < 1e-9
    assert abs(row.h_corrected - round(h_c, 6)) < 1e-9


def test_brown_forsythe_matches_anova_on_abs_deviations(spark):
    from streaming_demos_spark.operators.stats import brown_forsythe

    groups = {
        "lo": [1.0, 2.0, 3.0, 4.0],        # tight spread
        "hi": [0.0, 10.0, 20.0, 50.0],     # wide spread
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]

    def med(vs):
        s = sorted(vs)
        m = len(s)
        return (s[(m - 1) // 2] + s[m // 2]) / 2.0

    z = {g: [abs(v - med(vs)) for v in vs] for g, vs in groups.items()}
    allz = [x for xs in z.values() for x in xs]
    n = len(allz)
    k = len(z)
    grand = sum(allz) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2 for xs in z.values())
    ssw = sum(
        (x - sum(xs) / len(xs)) ** 2 for xs in z.values() for x in xs
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))

    df = spark.createDataFrame(rows, "g string, v double")
    row = brown_forsythe(df, "g", "v").collect()[0]
    assert row.k_groups == k and row.n_total == n
    assert abs(row.ss_between - round(ssb, 3)) < 1e-6
    assert abs(row.ss_within - round(ssw, 3)) < 1e-6
    assert abs(row.f_stat - round(f, 6)) < 1e-6


def test_ohlc_bars_tiebreak_and_extremes(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import ohlc_bars

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        # same timestamp twice at the bar open: event_id breaks the tie
        ("x", t0, 1, 100.0),
        ("x", t0, 2, 105.0),
        ("x", t0 + dt.timedelta(minutes=10), 3, 90.0),
        ("x", t0 + dt.timedelta(minutes=59), 4, 103.0),
        # same timestamp twice at the bar close
        ("x", t0 + dt.timedelta(minutes=59), 5, 101.0),
        # second bar, single tick
        ("x", t0 + dt.timedelta(hours=1), 6, 50.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, event_id long, price double"
    )
    out = {
        r.bucket_ts: r
        for r in ohlc_bars(df, "ts", "price", "k", "event_id").collect()
    }
    # tz-proof contract: the bucket is a formatted string, never a
    # session-tz TIMESTAMP
    key = lambda t: t.strftime("%Y-%m-%d %H:%M:%S")  # noqa: E731
    bar = out[key(t0)]
    assert bar.open == 100.0  # event_id 1 beats 2 at the tied open
    assert bar.close == 101.0  # event_id 5 beats 4 at the tied close
    assert bar.high == 105.0 and bar.low == 90.0 and bar.n_ticks == 5
    assert out[key(t0 + dt.timedelta(hours=1))].open == 50.0
    assert out[key(t0 + dt.timedelta(hours=1))].n_ticks == 1


def test_target_encode_loo_formula_and_singleton_prior(spark):
    from streaming_demos_spark.operators.training import target_encode_loo

    rows = [
        ("a", 10.0), ("a", 20.0), ("a", 30.0),
        ("b", 100.0),  # singleton: must fall back to the prior exactly
    ]
    df = spark.createDataFrame(rows, "cat string, y double")
    m = 4.0
    prior = (10.0 + 20.0 + 30.0 + 100.0) / 4.0
    out = target_encode_loo(df, "cat", "y", smoothing=m).collect()
    by = {(r.cat, r.y): r.loo_enc for r in out}
    assert by[("a", 10.0)] == round((60.0 - 10.0 + m * prior) / (3 - 1 + m), 6)
    assert by[("a", 30.0)] == round((60.0 - 30.0 + m * prior) / (3 - 1 + m), 6)
    # n_g = 1: numerator (s - y + m*prior) = m*prior, denominator = m
    assert by[("b", 100.0)] == round(prior, 6)


def test_pareto_skyline_dominance_and_layout_independence(spark):
    from streaming_demos_spark.operators.relational import pareto_skyline

    rows = [
        (1, 10.0, 5.0),   # skyline (cheapest)
        (2, 20.0, 9.0),   # skyline (best quality)
        (3, 15.0, 7.0),   # skyline (trade-off point)
        (4, 20.0, 7.0),   # dominated by 3 (worse price, equal quality)
        (5, 15.0, 5.0),   # dominated by 1 (equal quality view) -> check:
                          # price 15>10, qual 5=5 -> dominated by 1
        (6, 10.0, 5.0),   # duplicate of 1: ties never dominate, kept
    ]
    df = spark.createDataFrame(rows, "id long, price double, qual double")
    out = pareto_skyline(df, {"price": "min", "qual": "max"})
    got = sorted(r.id for r in out.collect())
    assert got == [1, 2, 3, 6]
    # layout independence: same set under a different partitioning
    got2 = sorted(
        r.id
        for r in pareto_skyline(
            df.repartition(7, "qual"), {"price": "min", "qual": "max"}
        ).collect()
    )
    assert got2 == got


def test_pareto_skyline_candidate_guard(spark):
    from streaming_demos_spark.operators.relational import pareto_skyline

    # an anti-diagonal: EVERY point is on the skyline -> candidates
    # exceed the cap and the guard must trip rather than broadcast
    rows = [(i, float(i), float(100 - i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    with pytest.raises(RuntimeError, match="candidates exceed"):
        pareto_skyline(df, {"a": "min", "b": "min"}, max_candidates=10)


def test_k_core_peels_chain_keeps_clique(spark):
    from streaming_demos_spark.operators.graph import k_core

    # triangle (1,2,3) with a pendant chain 3-4-5: the 2-core is the
    # triangle alone, and peeling must CASCADE down the chain (5 goes,
    # then 4)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r.node: r.core_degree for r in k_core(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    with pytest.raises(RuntimeError, match="no convergence"):
        k_core(edges, k=2, max_rounds=1)


def test_k_core_empty_when_overpeeled(spark):
    from streaming_demos_spark.operators.graph import k_core

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert k_core(edges, k=2, max_rounds=5).count() == 0


def test_grouped_weighted_median_boundaries(spark):
    from streaming_demos_spark.operators.relational import (
        grouped_weighted_median,
    )

    rows = [
        # g1: cum weights 1,3,6 of total 6 -> half=3 hits exactly at
        # v=2 (cum=3): lo=2, hi=first cum>3 -> 3, median 2.5
        ("g1", 1.0, 1.0), ("g1", 2.0, 2.0), ("g1", 3.0, 3.0),
        # g2: dominant weight on 7 -> half=2.5 inside v=7's mass
        ("g2", 5.0, 1.0), ("g2", 7.0, 4.0),
        # g3: singleton
        ("g3", 42.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = {
        r.g: (r.weighted_median, r.total_weight)
        for r in grouped_weighted_median(df, "g", "v", "w").collect()
    }
    assert out["g1"] == (2.5, 6.0)
    assert out["g2"] == (7.0, 5.0)
    assert out["g3"] == (42.0, 9.0)


def test_feature_hash_signed_matches_reference_hash(spark):
    import hashlib

    from streaming_demos_spark.operators.selection import (
        feature_hash_signed,
    )

    def ref(word, dim=64):
        h = hashlib.md5(word.encode()).hexdigest()
        return int(h[:6], 16) % dim, 1 if int(h[6], 16) % 2 == 0 else -1

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.idx): r.val
        for r in feature_hash_signed(docs, dim=64).collect()
    }
    ia, sa = ref("alpha")
    ib, sb = ref("beta")
    ig, sg = ref("gamma")
    if ia == ib:  # rare in-bucket collision between the two tokens
        assert out[(1, ia)] == 2 * sa + sb
    else:
        assert out[(1, ia)] == 2 * sa and out[(1, ib)] == sb
    assert out[(2, ig)] == sg


def test_theil_sen_resists_outlier(spark):
    from streaming_demos_spark.operators.stats import theil_sen_slope

    # y = 2x exactly, except one wild outlier at x=5; the pairwise-
    # slope median must stay at 2 while OLS would be dragged
    rows = [("s", float(x), 2.0 * x) for x in range(1, 5)]
    rows.append(("s", 5.0, 500.0))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = theil_sen_slope(df, "g", "x", "y").collect()[0]
    assert out.ts_slope == 2.0
    assert out.n_pairs == 10  # C(5,2)


def test_grouped_mad_known_values(spark):
    from streaming_demos_spark.operators.stats import grouped_mad

    # classic example: {1,1,2,2,4,6,9} -> median 2, deviations
    # {1,1,0,0,2,4,7} -> MAD 1
    vals = [1.0, 1.0, 2.0, 2.0, 4.0, 6.0, 9.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = grouped_mad(df, "g", "v").collect()[0]
    assert out.median == 2.0 and out.mad == 1.0
    assert out.sigma_robust == round(1.4826, 6)


def test_multi_touch_attribution_models(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import (
        multi_touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: view -> click -> purchase(100): first=view,
        # last=click, linear 50/50
        (1, t0 - dt.timedelta(days=2), "view", 0.0, 1),
        (1, t0 - dt.timedelta(days=1), "click", 0.0, 2),
        (1, t0, "purchase", 100.0, 3),
        # user 2: touch OUTSIDE the 7-day lookback -> unattributed
        (2, t0 - dt.timedelta(days=8), "view", 0.0, 4),
        (2, t0, "purchase", 50.0, 5),
        # user 3: single click -> all three models give it everything
        (3, t0 - dt.timedelta(hours=1), "click", 0.0, 6),
        (3, t0, "purchase", 30.0, 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, "
        "value double, event_id long"
    )
    out = {
        r.channel: r
        for r in multi_touch_attribution(
            df, "user_id", "ts", "event_type", "value", "event_id",
            conversion_channel="purchase", lookback_days=7,
        ).collect()
    }
    assert out["view"].first_touch_cents == 10000
    assert out["view"].last_touch_cents == 0
    assert out["view"].linear_cents_e4 == 50000000  # 50.00 * 1e4 cents
    assert out["click"].first_touch_cents == 3000
    assert out["click"].last_touch_cents == 13000
    assert out["click"].linear_cents_e4 == 80000000
    assert out["click"].n_conversions_touched == 2


def test_quantile_normalize_midranks_and_groups(spark):
    from streaming_demos_spark.operators.curation import quantile_normalize

    rows = [
        ("a", 10, 1), ("a", 20, 2), ("a", 20, 3), ("a", 30, 4),
        ("b", 5, 5),
    ]
    df = spark.createDataFrame(rows, "source string, s long, doc_id long")
    out = {
        r.doc_id: r.pct_rank
        for r in quantile_normalize(df, "source", "s").collect()
    }
    assert out[1] == 0.25          # rank 1 of 4
    assert out[2] == out[3] == 0.625  # midrank 2.5 of 4
    assert out[4] == 1.0
    assert out[5] == 1.0           # singleton group


def test_kendall_tau_b_known_values(spark):
    from streaming_demos_spark.operators.stats import kendall_tau_b

    # perfect agreement
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "x long, y long"
    )
    assert kendall_tau_b(df, "x", "y").collect()[0].tau_b == 1.0
    # perfect reversal
    df2 = spark.createDataFrame(
        [(i, 6 - i) for i in range(1, 6)], "x long, y long"
    )
    assert kendall_tau_b(df2, "x", "y").collect()[0].tau_b == -1.0
    # tie-corrected case: x=(1,1,2,3), y=(1,2,1,3):
    # pairs with distinct x and y: C=4 ((1,1)-(2,?)no y1<... compute),
    # checked against scipy.stats.kendalltau(variant='b') = 0.5477...
    df3 = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (3, 3)], "x long, y long"
    )
    r = kendall_tau_b(df3, "x", "y").collect()[0]
    # n0=6, n1=1 (x tie pair), n2=1 (y tie pair), C=3, D=1
    # tau_b = 2 / sqrt(5*5) = 0.4
    assert r.concordant == 3 and r.discordant == 1
    assert r.tau_b == 0.4


def test_grouped_moments_against_numpy(spark):
    import numpy as np

    from streaming_demos_spark.operators.stats import grouped_moments

    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 9.0, 4.0, 4.5]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = grouped_moments(df, "g", "v").collect()[0]
    a = np.array(vals)
    m2 = ((a - a.mean()) ** 2).mean()
    m3 = ((a - a.mean()) ** 3).mean()
    m4 = ((a - a.mean()) ** 4).mean()
    assert out.n_rows == len(vals)
    assert abs(out.mean - round(a.mean(), 6)) < 1e-9
    assert abs(out.var_pop - round(m2, 6)) < 1e-6
    assert abs(out.skewness - round(m3 / m2**1.5, 6)) < 1e-6
    assert abs(out.kurtosis_excess - round(m4 / m2**2 - 3.0, 6)) < 1e-6


def test_roc_curve_steps(spark):
    from streaming_demos_spark.operators.stats import roc_curve

    # scores: positives at 0.9, 0.7; negatives at 0.8, 0.1
    rows = [(0.9, 1), (0.7, 1), (0.8, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    pts = {
        r.threshold: (r.tpr, r.fpr)
        for r in roc_curve(df, "score", "label").collect()
    }
    assert pts[0.9] == (0.5, 0.0)
    assert pts[0.8] == (0.5, 0.5)
    assert pts[0.7] == (1.0, 0.5)
    assert pts[0.1] == (1.0, 1.0)


def test_cohort_ltv_triangle(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import cohort_ltv

    d = lambda m, day: dt.datetime(2024, m, day)
    rows = [
        # cust 1: cohort Jan, buys Jan + Mar
        (1, d(1, 5), 10.0), (1, d(3, 5), 30.0),
        # cust 2: cohort Jan, buys Jan only
        (2, d(1, 20), 5.0),
        # cust 3: cohort Feb
        (3, d(2, 1), 7.0),
    ]
    df = spark.createDataFrame(rows, "cust long, ts timestamp, val double")
    out = {
        (r.cohort_mon, r.age_mon): r
        for r in cohort_ltv(df, "cust", "ts", "val").collect()
    }
    jan = 2024 * 12 + 1
    assert out[(jan, 0)].n_active == 2 and out[(jan, 0)].revenue == 15.0
    assert out[(jan, 2)].n_active == 1 and out[(jan, 2)].revenue == 30.0
    assert out[(jan, 2)].cum_revenue == 45.0
    assert out[(jan + 1, 0)].revenue == 7.0


def test_price_volume_mix_bridges_exactly(spark):
    from streaming_demos_spark.operators.relational import price_volume_mix

    rows = [
        # key A: price 10->12, qty 5->7
        ("A", 1, 5.0, 50.0), ("A", 2, 7.0, 84.0),
        # key B: only in period 1 (discontinued, rev 20)
        ("B", 1, 2.0, 20.0),
        # key C: only in period 2 (new, rev 9)
        ("C", 2, 3.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, per int, q double, r double")
    out = {
        r.effect: r.amount
        for r in price_volume_mix(df, "k", "per", "q", "r", 1, 2).collect()
    }
    assert out["price"] == 10.0        # (12-10)*5
    assert out["volume"] == 20.0       # (7-5)*10
    assert out["mix"] == 4.0           # (12-10)*(7-5)
    assert out["new"] == 9.0
    assert out["discontinued"] == -20.0
    # bridge identity: effects sum to rev2 - rev1 = 93 - 70
    assert sum(out.values()) == 23.0


def test_theil_decomposition_identity(spark):
    import math

    from streaming_demos_spark.operators.stats import theil_decomposition

    groups = {"a": [1.0, 2.0, 3.0], "b": [10.0, 10.0], "c": [5.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = theil_decomposition(df, "g", "v").collect()
    # reconstruct total Theil from the decomposition and compare to
    # the direct definition
    total = sum(
        r.income_share * r.theil_within + r.between_term for r in out
    )
    allv = [v for vs in groups.values() for v in vs]
    mu = sum(allv) / len(allv)
    direct = sum((x / mu) * math.log(x / mu) for x in allv) / len(allv)
    assert abs(total - direct) < 1e-5
    # a group with all-equal values has zero within-inequality
    assert {r.g: r.theil_within for r in out}["b"] == 0.0


def test_pythagorean_means_ordering_and_values(spark):
    import math

    from streaming_demos_spark.operators.stats import pythagorean_means

    vals = [1.0, 4.0, 16.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = pythagorean_means(df, "g", "v").collect()[0]
    assert r.mean_arith == 7.0
    assert r.mean_geom == 4.0  # (1*4*16)^(1/3)
    assert abs(r.mean_harm - round(3 / (1 + 0.25 + 0.0625), 6)) < 1e-9
    assert r.mean_arith >= r.mean_geom >= r.mean_harm


def test_readability_scores_counts(spark):
    from streaming_demos_spark.operators.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "no punctuation here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(docs).collect()}
    assert out[1].n_words == 6 and out[1].n_sentences == 2
    # syllable proxy: e/a/a/e/o/a -> 6 vowel groups
    assert out[1].n_syllables == 6
    assert out[2].n_sentences == 1  # clamped
    wps, spw = 6 / 2.0, 6 / 6.0
    assert out[1].flesch_ease == round(206.835 - 1.015 * wps - 84.6 * spw, 4)


def test_degree_assortativity_star_vs_clique(spark):
    from streaming_demos_spark.operators.graph import degree_assortativity

    # star graph: hub degree 4, leaves degree 1 -> strongly negative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r.n_edge_ends == 8
    assert r.assortativity == -1.0
    # regular graph (4-cycle): every endpoint degree equal -> zero
    # variance; guarded division yields 0
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert degree_assortativity(cyc).collect()[0].assortativity == 0.0


def test_fd_violations_reports_only_broken_groups(spark):
    from streaming_demos_spark.operators.relational import fd_violations

    rows = [
        ("k1", "x"), ("k1", "x"),           # holds
        ("k2", "x"), ("k2", "y"), ("k2", "x"),  # broken: dom 2/3
        ("k3", "z"),                          # holds (singleton)
    ]
    df = spark.createDataFrame(rows, "lhs string, rhs string")
    out = fd_violations(df, ["lhs"], "rhs").collect()
    assert len(out) == 1
    r = out[0]
    assert r.lhs == "k2" and r.n_rhs_values == 2
    assert r.n_violating_rows == 1
    assert r.dominant_share == round(2 / 3, 6)


def test_seasonal_anomalies_uses_hour_baseline(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import seasonal_anomalies

    rows = []
    eid = 0
    # 3am baseline: tight around 10; 12pm baseline: tight around 100
    for day in range(1, 11):
        for hour, base in ((3, 10.0), (12, 100.0)):
            eid += 1
            rows.append(
                (eid, "k", dt.datetime(2024, 1, day, hour), base + (day % 3))
            )
    # a 3am value of 50 is WAY off the 3am baseline yet far below the
    # 12pm mean — a daily-mean z-score would miss it
    rows.append((999, "k", dt.datetime(2024, 1, 15, 3), 50.0))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = seasonal_anomalies(
        df, "event_type", "ts", "value", "event_id"
    ).collect()
    assert [r.event_id for r in out] == [999]
    assert out[0].z_seasonal > 3.0


def test_fixed_width_parser_policies(spark, tmp_path):
    from streaming_demos_spark.sources.files import read_fixed_width

    layout = [
        ("id", 1, 4, "int"),
        ("name", 5, 8, "string"),
        ("amount", 13, 6, "double"),
    ]
    lines = [
        "0001alpha    10.50",
        "0002beta      2.25",
        "00XXgamma     1.00",   # bad int
        "0004short",            # too short
    ]
    p = tmp_path / "fw.txt"
    p.write_text("\n".join(lines))
    ok = read_fixed_width(spark, str(p), layout)  # drop
    got = {r.id: (r.name, r.amount) for r in ok.collect()}
    assert got == {1: ("alpha", 10.5), 2: ("beta", 2.25)}
    perm = read_fixed_width(spark, str(p), layout, bad_rows="permissive")
    rows = perm.collect()
    assert len(rows) == 4
    assert sum(0 if r._valid else 1 for r in rows) == 2


def test_period_end_balance_takes_last_not_sum(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import period_end_balance

    d = dt.datetime
    rows = [
        # user 1 on Jan 1: balance moves 10 -> 30; only 30 counts
        (1, d(2024, 1, 1, 9), 1, 10.0),
        (1, d(2024, 1, 1, 17), 2, 30.0),
        # user 2 on Jan 1: tied timestamps, event_id 4 wins
        (2, d(2024, 1, 1, 12), 3, 100.0),
        (2, d(2024, 1, 1, 12), 4, 70.0),
        # Jan 2: only user 1 reports
        (1, d(2024, 1, 2, 8), 5, 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {
        r.bucket_ts: (r.n_entities, r.total_balance)
        for r in period_end_balance(
            df, "user_id", "ts", "value", "event_id", bucket="day"
        ).collect()
    }
    # bridge-proof contract: the bucket is a 'yyyy-MM-dd' STRING
    assert out["2024-01-01"] == (2, 100.0)  # 30+70, NOT 10+30+100+70
    assert out["2024-01-02"] == (1, 40.0)


def test_ratio_to_parent_shares_sum_to_one(spark):
    from streaming_demos_spark.operators.relational import ratio_to_parent

    rows = [
        ("r1", "a", 10.0), ("r1", "a", 20.0), ("r1", "b", 70.0),
        ("r2", "c", 5.0),
    ]
    df = spark.createDataFrame(rows, "parent string, child string, v double")
    out = {
        (r.parent, r.child): r.share_of_parent
        for r in ratio_to_parent(df, "parent", "child", "v").collect()
    }
    assert out[("r1", "a")] == 0.3
    assert out[("r1", "b")] == 0.7
    assert out[("r2", "c")] == 1.0


def test_pairwise_contrasts_match_welch(spark):
    from streaming_demos_spark.operators.stats import (
        pairwise_mean_contrasts,
        welch_ttest,
    )

    rows = (
        [("a", v) for v in (1.0, 2.0, 3.0, 4.0)]
        + [("b", v) for v in (10.0, 12.0, 14.0)]
        + [("c", v) for v in (5.0, 5.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r.group_a, r.group_b): r
        for r in pairwise_mean_contrasts(df, "g", "v").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    # the (a, b) contrast must agree with the dedicated Welch test
    w = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    ab = out[("a", "b")]
    assert abs(ab.z_stat - w.t_stat) < 1e-9
    assert ab.p_normal == w.p_normal
    # zero-variance pair: se collapses against c only via a's variance
    assert out[("a", "c")].welch_se > 0


def test_streaming_ohlc_matches_batch(spark, tmp_path):
    """Batch-stream duality for the OHLC bar: the identical
    min_by/max_by aggregation over a time window, run as a Structured
    Streaming query in complete mode, converges to the batch bars."""
    import datetime as dt

    from pyspark.sql import types as T

    from streaming_demos_spark.operators.relational import ohlc_bars

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("price", T.DoubleType()),
    ])
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    b1 = [
        ("x", t0, 1, 100.0),
        ("x", t0, 2, 105.0),
        ("x", t0 + dt.timedelta(minutes=30), 3, 90.0),
    ]
    b2 = [
        ("x", t0 + dt.timedelta(minutes=59), 4, 103.0),
        ("x", t0 + dt.timedelta(hours=1), 5, 50.0),
        ("y", t0, 6, 7.0),
    ]
    src = str(tmp_path / "ticks")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    batch = {
        (r.k, r.bucket_ts): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in ohlc_bars(
            spark.read.parquet(src), "ts", "price", "k", "event_id"
        ).collect()
    }

    stream = spark.readStream.schema(schema).parquet(src)
    pos = F.struct("ts", "event_id")
    agg = stream.groupBy(
        "k", F.window("ts", "1 hour").alias("w")
    ).agg(
        F.min_by("price", pos).alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by("price", pos).alias("close"),
        F.count("*").alias("n_ticks"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.w.start.strftime("%Y-%m-%d %H:%M:%S")): (
            r.open, r.high, r.low, r.close, r.n_ticks,
        )
        for r in spark.sql("SELECT * FROM ohlc_stream").collect()
    }
    assert got == batch


def test_holt_forecast_exact_on_linear_series(spark):
    from streaming_demos_spark.operators.relational import (
        holt_linear_forecast,
    )

    # y = 3 + 2x: level tracks y exactly, trend locks to 2, and the
    # 1-step forecast is the true next point — for ANY alpha/beta
    rows = [("g", float(x), 3.0 + 2.0 * x) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = holt_linear_forecast(df, "g", "x", "y", horizon=1).collect()[0]
    assert out.n_points == 8
    assert out.level == 3.0 + 2.0 * 8
    assert out.trend == 2.0
    assert out.forecast == 3.0 + 2.0 * 9
    # groups with < 2 points are dropped (no trend is definable)
    one = spark.createDataFrame([("h", 1.0, 5.0)], "g string, x double, y double")
    assert holt_linear_forecast(one, "g", "x", "y").count() == 0


def test_fs_em_recovers_planted_mixture(spark):
    import random

    rng = random.Random(7)
    rows = []
    # 200 true-match pairs: fields agree with p=0.9/0.85/0.95
    for _ in range(200):
        rows.append(tuple(rng.random() < p for p in (0.9, 0.85, 0.95)))
    # 1800 non-match pairs: agree with p=0.05/0.2/0.5
    for _ in range(1800):
        rows.append(tuple(rng.random() < p for p in (0.05, 0.2, 0.5)))
    from streaming_demos_spark.operators.relational import fs_em_params

    df = spark.createDataFrame(rows, "f1 boolean, f2 boolean, f3 boolean")
    out = {r.field: r for r in fs_em_params(df, ["f1", "f2", "f3"]).collect()}
    assert all(out[f].m_prob > out[f].u_prob for f in ("f1", "f2"))
    assert 0.02 < out["f1"].match_prior < 0.4  # planted 10%
    # layout independence: identical params under a different partitioning
    out2 = {
        r.field: r
        for r in fs_em_params(df.repartition(13), ["f1", "f2", "f3"]).collect()
    }
    assert all(out[f].m_prob == out2[f].m_prob for f in out)


def test_isotonic_calibration_pools_violators(spark):
    from streaming_demos_spark.operators.training import isotonic_calibration

    # per-score positive fractions 0.2, 0.6, 0.4, 1.0 (10 rows each):
    # scores 2 and 3 violate monotonicity -> pooled to 0.5
    rows = []
    for score, pos in ((1.0, 2), (2.0, 6), (3.0, 4), (4.0, 10)):
        rows += [(score, 1)] * pos + [(score, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, "score double, label int")
    out = {
        r.score: r.iso_prob
        for r in isotonic_calibration(df, "score", "label").collect()
    }
    assert out == {1.0: 0.2, 2.0: 0.5, 3.0: 0.5, 4.0: 1.0}
    # monotone by construction
    probs = [out[s] for s in sorted(out)]
    assert probs == sorted(probs)


def test_diff_in_diff_recovers_planted_effect(spark):
    # additive model: base 10, period adds 5 to everyone, treatment
    # adds 7 only in the post period -> DiD must isolate exactly 7
    rows = []
    for unit in range(40):
        treat = unit % 2 == 0
        for post in (False, True):
            noise = (unit % 5) * 0.1  # unit fixed effect, differenced out
            v = 10.0 + noise + (5.0 if post else 0.0) + (
                7.0 if treat and post else 0.0
            )
            rows.append((treat, post, v))
    from streaming_demos_spark.operators.stats import diff_in_diff

    df = spark.createDataFrame(rows, "t boolean, p boolean, v double")
    out = diff_in_diff(df, "t", "p", "v").collect()[0]
    assert out.did_estimate == 7.0
    assert out.treat_post - out.treat_pre == 12.0


def test_cuped_preserves_means_and_cuts_variance(spark):
    import random

    rng = random.Random(3)
    rows = []
    for unit in range(400):
        pre = rng.gauss(100.0, 20.0)
        post = 0.9 * pre + rng.gauss(10.0, 5.0)  # strongly correlated
        rows.append(("A" if unit % 2 == 0 else "B", round(pre, 4),
                     round(post, 4)))
    from streaming_demos_spark.operators.stats import cuped_adjusted

    df = spark.createDataFrame(rows, "arm string, pre double, post double")
    out = {r.arm: r for r in cuped_adjusted(df, "arm", "pre", "post").collect()}
    for arm in ("A", "B"):
        # big variance reduction with rho ~ 0.96
        assert out[arm].var_reduction_pct > 70.0
        # adjusted mean stays near the raw mean (theta centers on the
        # GLOBAL pre mean, so per-arm shift is bounded by arm imbalance)
        assert abs(out[arm].mean_adjusted - out[arm].mean_post) < 5.0


def test_proportion_power_textbook_case(spark):
    # p1=0.10, p2=0.15 -> classic two-proportion n ~ 686 per arm at
    # alpha=5%, power=80%
    rows = [("A", 1)] * 100 + [("A", 0)] * 900 + [("B", 1)] * 150 + [
        ("B", 0)
    ] * 850
    from streaming_demos_spark.operators.stats import proportion_power

    df = spark.createDataFrame(rows, "arm string, s int")
    out = proportion_power(df, "arm", "s", "A", "B").collect()[0]
    assert out.rate_a_e6 == 100000 and out.rate_b_e6 == 150000
    assert 650 <= out.n_required_per_arm <= 730


def test_compression_ratio_counts(spark):
    from streaming_demos_spark.operators.text import compression_ratio

    docs = spark.createDataFrame(
        [("s1", 1, "ab cd"), ("s1", 2, "hello, world")],
        "source string, doc_id long, text string",
    )
    out = compression_ratio(docs).collect()[0]
    assert out.n_docs == 2
    assert out.total_chars == 5 + 12
    assert out.total_ws_tokens == 2 + 2
    # "ab","cd" = 2 bpe; "hello",",","world" = 3 bpe
    assert out.total_bpe_tokens == 2 + 3
    assert out.chars_per_ws_token == round(17 / 4, 4)


def test_harmonic_2hop_path_graph(spark):
    from streaming_demos_spark.operators.graph import harmonic_centrality_2hop

    # path 1-2-3-4-5: node 3 sees {2,4} at d1 and {1,5} at d2 -> 3.0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {
        r.node: (r.n_1hop, r.n_2hop, r.harmonic_c2)
        for r in harmonic_centrality_2hop(edges).collect()
    }
    assert out[3] == (2, 2, 3.0)
    assert out[1] == (1, 1, 1.5)  # sees 2, then 3
    assert out[2] == (2, 1, 2.5)  # sees 1,3 then 4


def test_cumulative_new_users_counts_first_seen_once(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import cumulative_new_users

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 5)), (1, d(2024, 1, 2, 5)),  # u1 new on day 1
        (2, d(2024, 1, 1, 9)),                          # u2 new on day 1
        (3, d(2024, 1, 3, 1)), (3, d(2024, 1, 3, 2)),   # u3 new on day 3
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out_df = cumulative_new_users(df, "user_id", "ts")
    # bridge-proof contract: the bucket is a 'yyyy-MM-dd' STRING — a
    # session-tz TIMESTAMP shifts under a non-UTC harness, and a raw
    # DATE renders asymmetrically through a pandas comparator bridge
    assert dict(out_df.dtypes)["bucket_ts"] == "string"
    out = {
        r.bucket_ts: (r.new_users, r.cumulative_users)
        for r in out_df.collect()
    }
    assert out["2024-01-01"] == (2, 2)
    assert out["2024-01-03"] == (1, 3)
    assert "2024-01-02" not in out  # no NEW users that day


def test_binseg_finds_planted_mean_shifts(spark):
    from streaming_demos_spark.operators.relational import binseg_changepoints

    # three regimes: 10 (x 1-10), 50 (x 11-20), 20 (x 21-30)
    rows = (
        [(float(x), 10.0) for x in range(1, 11)]
        + [(float(x), 50.0) for x in range(11, 21)]
        + [(float(x), 20.0) for x in range(21, 31)]
    )
    df = spark.createDataFrame(rows, "x double, y double")
    out = binseg_changepoints(df, "x", "y", depth=2).collect()
    splits = {r.x_split for r in out}
    # the two regime boundaries must be among the found splits
    assert 10.0 in splits and 20.0 in splits
    # the strongest split carries the largest gain
    assert out[0].gain >= out[-1].gain


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """Hive-partitioned parquet layout: a filter on the partition
    column must show up as PartitionFilters at the scan (pruned
    directories, not scanned-then-filtered rows)."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, "click" if i % 2 else "view", float(i)) for i in range(100)],
        "event_id long, event_type string, value double",
    )
    out = str(tmp_path / "by_type")
    df.write.partitionBy("event_type").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    assert back.count() == 50
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]


def test_yuen_trimmed_ttest_hand_case(spark):
    # group a: {0,1,2,3,4,5,6,7,8,100} n=10, g=2 -> trimmed window is
    # ranks 3..8 = {2,3,4,5,6,7}, trimmed mean 4.5 (outlier 100 gone);
    # winsorized sample: {2,2,2,3,4,5,6,7,7,7}
    a_vals = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
    b_vals = [10.0, 11.0, 12.0, 13.0, 14.0]  # n=5, g=1 -> ranks 2..4
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    from streaming_demos_spark.operators.stats import yuen_trimmed_ttest

    df = spark.createDataFrame(rows, "g string, v double")
    out = yuen_trimmed_ttest(df, "g", "v", "a", "b").collect()[0]
    assert out.n_a == 10 and out.h_a == 6
    assert out.tmean_a == 4.5
    assert out.n_b == 5 and out.h_b == 3
    assert out.tmean_b == 12.0
    # winsorized a: {2,2,2,3,4,5,6,7,7,7}, SS = 42.5, var = 42.5/9
    # d_a = 9*(42.5/9)/(6*5) = 42.5/30 ; b: wins {11,11,12,13,13}
    # var 1.0, d_b = 4*1/(3*2) -> t = -7.5/sqrt(42.5/30 + 2/3)
    import math

    expect_t = (4.5 - 12.0) / math.sqrt(42.5 / 30.0 + 4.0 / 6.0)
    assert abs(out.t_stat - round(expect_t, 6)) < 1e-6


def test_matryoshka_recall_full_dim_is_one(spark):
    import random

    from streaming_demos_spark.operators.similarity import matryoshka_recall

    rng = random.Random(11)
    rows = [
        (i, [round(rng.gauss(0, 1), 4) for _ in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.dim: r.avg_recall
        for r in matryoshka_recall(
            df, [0, 5, 9], dims=[4, 16], k=5
        ).collect()
    }
    assert out[16] == 1.0       # truncating to the full dim = truth
    assert 0.0 <= out[4] <= 1.0  # heavy truncation loses recall
    assert out[4] < 1.0          # 4 of 16 random dims cannot preserve top-5


def test_sax_symbols_letters_and_segments(spark):
    from streaming_demos_spark.operators.relational import sax_symbols

    # 12-point series with a step: 6 low then 6 high -> first 3
    # segments letter 'a'/'b', last 3 'c'/'d'; z-normalized per series
    rows = [("k", float(x), 10.0 if x <= 6 else 50.0) for x in range(1, 13)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {
        r.segment: r.letter
        for r in sax_symbols(df, "k", "x", "y", n_segments=6).collect()
    }
    assert len(out) == 6
    assert out[0] in ("a", "b") and out[5] in ("c", "d")
    low = [out[i] for i in range(3)]
    high = [out[i] for i in range(3, 6)]
    assert all(l in ("a", "b") for l in low)
    assert all(h in ("c", "d") for h in high)


def test_charclass_profile_ratios(spark):
    from streaming_demos_spark.operators.text import charclass_profile

    docs = spark.createDataFrame(
        [("s", 1, "ab 12!")],  # 2 alpha, 2 digit, 1 space, 1 other of 6
        "source string, doc_id long, text string",
    )
    r = charclass_profile(docs).collect()[0]
    assert r.total_chars == 6
    assert r.alpha_ratio == round(2 / 6, 4)
    assert r.digit_ratio == round(2 / 6, 4)
    assert r.space_ratio == round(1 / 6, 4)
    assert r.other_ratio == round(1 / 6, 4)


def test_imr_control_chart_flags_spike(spark):
    from streaming_demos_spark.operators.relational import imr_control_chart

    # stable series around 10 with one wild spike at x=7
    rows = [("k", float(x), 10.0 + (x % 2) * 0.5) for x in range(1, 11)]
    rows[6] = ("k", 7.0, 60.0)
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r.x: r for r in imr_control_chart(df, "k", "x", "y").collect()}
    assert out[7.0].out_of_control
    flagged = [x for x, r in out.items() if r.out_of_control]
    assert flagged == [7.0]
    assert out[1.0].ucl > out[1.0].lcl


def test_oov_rate_isolated_vocabulary(spark):
    from streaming_demos_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [
            ("s1", "shared words here"),
            ("s2", "shared words there"),
            ("s3", "utterly unique lexicon"),
        ],
        "source string, text string",
    )
    out = {r.source: r for r in oov_rate(docs).collect()}
    # s3 shares nothing -> 100% OOV; s1/s2 share 2 of 3 occurrences
    assert out["s3"].oov_rate == 1.0
    assert out["s1"].oov_rate == round(1 / 3, 6)
    assert out["s2"].oov_rate == round(1 / 3, 6)


def test_rmst_hand_integral(spark):
    from streaming_demos_spark.operators.relational import (
        restricted_mean_survival,
    )

    # 4 subjects, events at t=2 (1 death of 4) and t=5 (1 of 3),
    # 2 censored at t=8. S=0.75 on [2,5), S=0.5 on [5, tau).
    rows = [(2, True), (5, True), (8, False), (8, False)]
    df = spark.createDataFrame(rows, "d int, e boolean")
    out = restricted_mean_survival(df, "d", "e", tau=10.0).collect()[0]
    # integral: 1.0*2 + 0.75*(5-2) + 0.5*(10-5) = 2 + 2.25 + 2.5
    assert out.rmst == 6.75
    assert out.n_steps == 2 and out.tau == 10.0
    # tau below the first event: curve is 1.0 throughout
    out2 = restricted_mean_survival(df, "d", "e", tau=1.5).collect()[0]
    assert out2.rmst == 1.5


def test_quantile_shift_is_decile_difference(spark):
    """QTE wrapper sanity on the real micro-SF data: 9 deciles,
    shift == q_treat - q_control at each, monotone quantiles."""
    import __spark_entry__ as E

    out = E.queries()["ext_quantile_shift"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r.pct for r in out] == list(range(10, 100, 10))
    for r in out:
        assert r.shift == round(r.q_treat - r.q_control, 6)
    qt = [r.q_treat for r in out]
    assert qt == sorted(qt)


def test_hll_set_overlap_exact_algebra_and_bounds(spark):
    from streaming_demos_spark.operators.relational import hll_set_overlap

    rows = [("x", i) for i in range(1, 101)] + [
        ("y", i) for i in range(51, 151)
    ] + [("z", i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "s string, v long")
    out = {
        (r.set_a, r.set_b): r for r in hll_set_overlap(df, "s", "v").collect()
    }
    xy = out[("x", "y")]
    assert (xy.exact_a, xy.exact_b, xy.exact_union, xy.exact_inter) == (
        100, 100, 150, 50,
    )
    xz = out[("x", "z")]
    assert (xz.exact_union, xz.exact_inter) == (100, 10)
    yz = out[("y", "z")]
    assert (yz.exact_union, yz.exact_inter) == (110, 0)  # disjoint pair
    for r in out.values():  # sketches are exact-ish at this cardinality
        assert r.est_a_ok and r.est_b_ok and r.est_union_ok and r.est_inter_ok


def test_seasonal_naive_mase_hand_series(spark):
    """Perfectly 7-periodic series: holdout errors are ZERO while the
    in-sample one-step scale is not — the exact integer parts expose
    that directly. A second, too-short key is dropped."""
    import datetime as dt

    from streaming_demos_spark.operators.relational import (
        seasonal_naive_mase,
    )

    base = dt.datetime(2024, 1, 1, 12)
    pattern = [10.0, 12.5, 11.0, 20.0, 7.25, 9.0, 30.0]
    rows = [
        ("k", base + dt.timedelta(days=i), pattern[i % 7])
        for i in range(21)
    ] + [("short", base + dt.timedelta(days=i), 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r.k: r for r in seasonal_naive_mase(df, "k", "ts", "v").collect()}
    assert "short" not in out  # < season + 2 observations
    r = out["k"]
    assert (r.n_obs, r.n_test) == (21, 7)
    assert r.sae_units == 0  # periodic -> seasonal naive is exact
    # scale: one-step diffs over rn 2..14 of the repeating pattern
    cents = [round(p * 100) for p in pattern]
    series = [cents[i % 7] for i in range(14)]
    snd = sum(abs(series[i] - series[i - 1]) for i in range(1, 14))
    assert (r.n_scale, r.snd_units) == (13, snd)


def test_gains_table_counts_and_cumulative(spark):
    from streaming_demos_spark.operators.relational import gains_table

    # 100 rows, scores 0.01..1.00; responders are the top-30 scores
    rows = [(i / 100.0, i > 70) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "value double, resp boolean")
    out = {r.bin: r for r in gains_table(df, "value", "resp").collect()}
    assert sum(r.n for r in out.values()) == 100
    assert sum(r.n_resp for r in out.values()) == 30
    # responders live in the top bins only
    assert out[10].n_resp == out[10].n
    assert out[1].n_resp == 0
    # cumulative capture is monotone and ends at the totals
    cums = [out[b].cum_resp for b in sorted(out)]
    assert cums == sorted(cums) and cums[-1] == 30
    assert out[max(out)].cum_n == 100


def test_tokenizer_fertility_exact_counts(spark):
    from streaming_demos_spark.operators.text import tokenizer_fertility

    # "abcd" -> 1 piece, "abcdefgh" -> 2, "ab" -> 1 (ceil(len/4))
    df = spark.createDataFrame(
        [(1, "en", "abcd abcdefgh ab")], "doc_id long, lang string, text string"
    )
    r = tokenizer_fertility(df).collect()[0]
    assert (r.slice, r.n_docs, r.n_words, r.n_chars) == ("en", 1, 3, 16)
    assert r.n_pieces == 4
    # 4 pieces / 3 words = 1.333... -> 1333 at e3 (half-up)
    assert r.pieces_per_word_e3 == 1333
    # 4 pieces / 16 chars * 100 = 25.0 -> 25000 at e3
    assert r.pieces_per_100chars_e3 == 25000


def test_cusum_drift_closed_form_equals_recursion(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import cusum_drift

    base = dt.datetime(2024, 1, 1, 8)
    # 20 flat train days at 10.00, then a +50% shift
    vals = [10.0] * 20 + [15.0, 15.0, 9.0, 15.0, 15.0]
    rows = [
        ("k", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r.day: (r.cusum_units, r.alarm)
        for r in cusum_drift(df, "k", "ts", "v").collect()
    }
    # hand recursion in scaled units (cents * n_train, mu = 1000c):
    # d = (y_c - 1000) * 20
    s, exp = 0, {}
    for i, v in enumerate(vals[20:], start=20):
        d = (round(v * 100) - 1000) * 20
        s = max(0, s + d)
        day = (base + dt.timedelta(days=i)).date().isoformat()
        exp[day] = (s, s * 100 > 50 * 20000)  # ts = 20000 cents
    assert got == exp
    # the shift alarms by the second shifted day
    assert got["2024-01-22"][1]


def test_quantile_forecast_pinball_hand_case(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import (
        quantile_forecast_pinball,
    )

    base = dt.datetime(2024, 1, 1, 8)
    train = [float(i) for i in range(1, 21)]  # p90 of 1..20 = 18.1
    test = [18.0, 19.0, 18.1]
    rows = [
        ("k", base + dt.timedelta(days=i), v)
        for i, v in enumerate(train + test)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = quantile_forecast_pinball(df, "k", "ts", "v").collect()[0]
    assert r.n_test == 3
    assert r.yhat_e1 == 18100  # 18.1 in cents*10
    # d (cents*10): 18.0 -> -100, 19.0 -> +900, 18.1 -> 0
    # pinball: max(9d, -d): 100, 8100, 0
    assert r.pinball_units == 8200
    assert r.n_under == 2  # 18.0 and 18.1 are <= the P90


def test_abc_classification_pareto_split(spark):
    from streaming_demos_spark.operators.relational import abc_classification

    # one dominant key (80 units), one middle (15), three tail (5/3...)
    rows = (
        [(1, 80.0)] + [(2, 15.0)] + [(3, 3.0), (4, 1.5), (5, 0.5)]
    )
    df = spark.createDataFrame(rows, "k long, v double")
    out = {r.abc_class: r for r in abc_classification(df, "k", "v").collect()}
    # total = 100.00 -> cum: 80 (<=80% -> A), 95 (<=95% -> B), rest C
    assert (out["A"].n_keys, out["A"].total_units) == (1, 8000)
    assert (out["B"].n_keys, out["B"].total_units) == (1, 1500)
    assert (out["C"].n_keys, out["C"].total_units) == (3, 500)
    assert out["A"].share_e4 == 8000  # 0.80 * 1e4
    assert out["C"].share_e4 == 500


def test_funnel_conversion_ci_counts_and_bounds(spark):
    from streaming_demos_spark.operators.relational import (
        funnel_conversion_ci,
    )

    rows = (
        [(u, "view") for u in range(10)]
        + [(u, "click") for u in range(6)]      # 6 of 10 viewers click
        + [(u, "purchase") for u in range(3)]   # 3 of 6 clickers buy
        + [(99, "purchase")]                    # buyer with no view/click
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        r.step: r
        for r in funnel_conversion_ci(
            df, "user_id", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    vc = out["view->click"]
    assert (vc.n, vc.k, vc.conv_e4) == (10, 6, 6000)
    cp = out["click->purchase"]
    assert (cp.n, cp.k, cp.conv_e4) == (6, 3, 5000)
    # Wilson sanity: bounds bracket p-hat, stay in [0,1], and are wide
    # at these tiny n
    for r in (vc, cp):
        assert 0.0 <= r.wilson_lo < r.k / r.n < r.wilson_hi <= 1.0
        assert r.wilson_hi - r.wilson_lo > 0.3

def test_funnel_conversion_ci_missing_step_yields_nulls(spark):
    from streaming_demos_spark.operators.relational import (
        funnel_conversion_ci,
    )

    # 'signup' never occurs: the signup->view row must report n=0 with
    # NULL conversion/bounds instead of aborting on divide-by-zero.
    rows = [(1, "view"), (2, "view"), (1, "click")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        r.step: r
        for r in funnel_conversion_ci(
            df, "user_id", "event_type", ["signup", "view", "click"]
        ).collect()
    }
    sv = out["signup->view"]
    assert (sv.n, sv.k) == (0, 0)
    assert sv.conv_e4 is None and sv.wilson_lo is None and sv.wilson_hi is None
    vc = out["view->click"]
    assert (vc.n, vc.k, vc.conv_e4) == (2, 1, 5000)


def test_gains_table_accepts_column_response(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.relational import gains_table

    rows = [(float(i), i % 2) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "value double, resp int")
    by_name = gains_table(df, "value", "resp").collect()
    by_col = gains_table(df, "value", F.col("resp") == 1).collect()
    assert [tuple(r) for r in by_name] == [tuple(r) for r in by_col]


def test_weibull_fit_recovers_exponential(spark):
    """Exponential durations (shape 1): feed exact geometric-ish spans
    and assert the fitted shape is near 1 and r2 is high."""
    import math
    import random

    from streaming_demos_spark.operators.relational import (
        weibull_survival_fit,
    )

    rng = random.Random(7)
    rows = [(max(1, int(-30 * math.log(rng.random()))), True)
            for _ in range(400)]
    df = spark.createDataFrame(rows, "d int, e boolean")
    r = weibull_survival_fit(df, "d", "e").collect()[0]
    assert r.n_points > 10
    assert 0.7 < r.shape < 1.3
    assert r.fit_r2 > 0.9


def test_vocab_growth_monotone_and_exact(spark):
    from streaming_demos_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [
            (10, "a b c"),
            (20, "a b d d"),
            (30, "a e"),
        ],
        "doc_id long, text string",
    )
    out = {r.prefix: r for r in vocab_growth(docs).collect()}
    # thresholds = 3,6,..30; prefix 4 covers id<=12 (doc 10 only)
    assert out[4].n_tokens == 3 and out[4].vocab == 3
    # prefix 7 covers id<=21 (docs 10,20): tokens 7, vocab {a,b,c,d}=4
    assert out[7].n_tokens == 7 and out[7].vocab == 4
    assert out[10].n_tokens == 9 and out[10].vocab == 5
    toks = [out[i].n_tokens for i in range(1, 11)]
    vocs = [out[i].vocab for i in range(1, 11)]
    assert toks == sorted(toks) and vocs == sorted(vocs)


def test_burst_windows_finds_planted_burst(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import burst_windows

    base = dt.datetime(2024, 1, 1)
    rows = []
    # background: 1 event/minute for 30 min; burst: +10 events in
    # minutes 10-12
    for m in range(30):
        rows.append(("k", base + dt.timedelta(minutes=m)))
    for i in range(10):
        rows.append(("k", base + dt.timedelta(minutes=10 + i % 3)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    r = burst_windows(df, "k", "ts").collect()[0]
    # best 5-min window covers minutes 8..12 (buckets rel) with 5+10
    assert r.max_events == 15
    assert r.window_end_bucket - r.window_start_bucket == 4


def test_lorenz_curve_uniform_and_concentrated(spark):
    from streaming_demos_spark.operators.relational import lorenz_curve

    rows = [("u", f"k{i}", 10.0) for i in range(10)]
    rows += [("c", f"k{i}", 0.01) for i in range(9)] + [("c", "k9", 99.91)]
    df = spark.createDataFrame(rows, "g string, k string, v double")
    out = {(r.g, r.decile): r.cum_share_e6
           for r in lorenz_curve(df, "g", "k", "v").collect()}
    # uniform: bottom 30% holds 30%
    assert out[("u", 3)] == 300000
    assert out[("u", 10)] == 1000000
    # concentrated: bottom 90% holds 9 cents of 100.00 total
    assert out[("c", 9)] == 900      # 0.09/100.0 * 1e6
    assert out[("c", 10)] == 1000000


def test_peak_concurrency_hand_case(spark):
    import datetime as dt

    from streaming_demos_spark.operators.relational import peak_concurrency

    base = dt.datetime(2024, 1, 1)

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    # u1 active 0-10, u2 active 5-20, u3 active 30-40:
    # peak = 2 (u1&u2 overlap at 5-10), first reached at second 5
    rows = [
        (1, t(0), 1), (1, t(10), 2),
        (2, t(5), 3), (2, t(20), 4),
        (3, t(30), 5), (3, t(40), 6),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, e long")
    r = peak_concurrency(df, "u", "ts", "e").collect()[0]
    assert r.peak_concurrent == 2
    assert r.peak_at_epoch_sec == int(t(5).replace(
        tzinfo=dt.timezone.utc).timestamp())
