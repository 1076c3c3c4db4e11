"""Graph operators: PageRank invariants, degree profile, plus the PMI
and EWMA additions that landed in the same batch."""

import math

from pyspark.sql import functions as F

from streaming_demos_spark.operators import graph as G


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src int, dst int, w double")


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # A directed cycle is rank-symmetric: every node keeps 1/N forever.
    e = _edges(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)])
    out = {r.node: r.rank for r in G.pagerank(e, iterations=4).collect()}
    for v in out.values():
        assert abs(v - 1.0 / 3) < 1e-12


def test_pagerank_sink_accumulates_star_graph(spark):
    # Star into node 9: sources keep teleport mass, the hub gets
    # teleport + damping * (sum of source ranks).
    e = _edges(spark, [(i, 9, 1.0) for i in range(3)])
    out = {r.node: r.rank for r in G.pagerank(e, iterations=1).collect()}
    n = 4
    tele = 0.15 / n
    assert abs(out[9] - (tele + 0.85 * 3 * (1.0 / n))) < 1e-12
    for i in range(3):
        assert abs(out[i] - tele) < 1e-12


def test_pagerank_weighted_split(spark):
    # 0 splits 3:1 between 1 and 2 -> in-mass proportional to weight.
    e = _edges(spark, [(0, 1, 3.0), (0, 2, 1.0)])
    out = {
        r.node: r.rank
        for r in G.pagerank(e, weight="w", iterations=1).collect()
    }
    tele = 0.15 / 3
    r0 = 1.0 / 3
    assert abs(out[1] - (tele + 0.85 * r0 * 0.75)) < 1e-12
    assert abs(out[2] - (tele + 0.85 * r0 * 0.25)) < 1e-12


def test_pagerank_parallel_edges_collapse(spark):
    # Two parallel (0,1) edges of weight 1 behave as one of weight 2.
    a = G.pagerank(
        _edges(spark, [(0, 1, 1.0), (0, 1, 1.0), (0, 2, 2.0)]),
        weight="w",
        iterations=2,
    )
    b = G.pagerank(
        _edges(spark, [(0, 1, 2.0), (0, 2, 2.0)]), weight="w", iterations=2
    )
    ra = {r.node: r.rank for r in a.collect()}
    rb = {r.node: r.rank for r in b.collect()}
    assert ra.keys() == rb.keys()
    for k in ra:
        assert abs(ra[k] - rb[k]) < 1e-12


def test_degree_profile_counts_and_strengths(spark):
    e = _edges(spark, [(0, 1, 2.0), (0, 2, 3.0), (1, 2, 1.0)])
    out = {r.node: r for r in G.degree_profile(e, weight="w").collect()}
    assert out[0].out_deg == 2 and out[0].in_deg == 0
    assert out[0].out_w == 5.0 and out[0].in_w == 0.0
    assert out[2].in_deg == 2 and out[2].in_w == 4.0
    assert out[1].out_deg == 1 and out[1].in_deg == 1


def test_pmi_collocations_prefers_exclusive_pair(spark):
    from streaming_demos_spark.operators import text as TX

    # "aa bb" always adjacent and exclusive -> highest PMI; "cc" pairs
    # with many partners -> lower.
    docs = spark.createDataFrame(
        [(i, "aa bb cc x%d cc y%d" % (i % 3, i % 5)) for i in range(20)],
        "doc_id int, text string",
    )
    out = TX.pmi_collocations(docs, min_count=5, top_n=10).collect()
    assert out[0].w1 == "aa" and out[0].w2 == "bb"
    # exact PMI for the exclusive pair: P(ab)=20/100, P(a)=P(b)=20/120
    expect = math.log2((20 / 100) / ((20 / 120) * (20 / 120)))
    assert abs(out[0].pmi - round(expect, 4)) < 1e-9


def test_ewma_matches_reference_recursion_when_history_short(spark):
    from streaming_demos_spark.operators import relational as R

    # With fewer rows than the lookback, the bounded EWMA equals the
    # normalized exponential weighting computed directly.
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 15, 5])]
    df = spark.createDataFrame(rows, "user_id int, ts int, value double")
    out = (
        R.ewma_smooth(df, "user_id", "ts", "value", "ts", alpha=0.3, lookback=16)
        .orderBy("ts")
        .collect()
    )
    vals = [10.0, 20.0, 15.0, 5.0]
    for t, row in enumerate(out):
        ws = [0.7 ** (t - j) for j in range(t + 1)]
        expect = sum(w * v for w, v in zip(ws, vals)) / sum(ws)
        assert abs(row.ewma - round(expect, 6)) < 1e-9


def test_ewma_bounded_lookback_drops_old_rows(spark):
    from streaming_demos_spark.operators import relational as R

    # lookback=2: only the current and previous row contribute.
    rows = [(1, 0, 100.0), (1, 1, 0.0), (1, 2, 0.0), (1, 3, 8.0)]
    df = spark.createDataFrame(rows, "user_id int, ts int, value double")
    out = {
        r.ts: r.ewma
        for r in R.ewma_smooth(
            df, "user_id", "ts", "value", "ts", alpha=0.5, lookback=2
        ).collect()
    }
    # at ts=2 the 100 at ts=0 is out of frame: (0*1 + 0*0.5)/1.5 = 0
    assert out[2] == 0.0
    assert abs(out[3] - round((8.0 + 0.5 * 0.0) / 1.5, 6)) < 1e-9


def test_pagerank_plan_has_no_cartesian_and_bounded_joins(spark):
    e = _edges(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    plan = (
        G.pagerank(e, iterations=2, checkpoint=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan


def test_triangle_stats_counts_known_graph(spark):
    # K4 minus one edge: 5 edges, 2 triangles, wedges = sum C(deg,2).
    e = _edges(
        spark,
        [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (1, 2, 1.0), (1, 3, 1.0)],
    )
    row = G.triangle_stats(e).collect()[0]
    assert row.n_nodes == 4 and row.n_edges == 5
    # degrees: 3,3,2,2 -> wedges 3+3+1+1 = 8
    assert row.n_wedges == 8
    assert row.n_triangles == 2
    assert abs(row.clustering_coeff - round(6.0 / 8, 6)) < 1e-9


def test_triangle_stats_canonicalizes_duplicates_and_loops(spark):
    # Same triangle given as mixed directions + a self-loop + a dup.
    e = _edges(
        spark,
        [(1, 2, 1.0), (2, 1, 1.0), (3, 2, 1.0), (1, 3, 1.0), (2, 2, 1.0)],
    )
    row = G.triangle_stats(e).collect()[0]
    assert row.n_edges == 3 and row.n_triangles == 1


def test_triangle_stats_no_triangles_on_star(spark):
    e = _edges(spark, [(0, i, 1.0) for i in range(1, 5)])
    row = G.triangle_stats(e).collect()[0]
    assert row.n_triangles == 0
    assert row.clustering_coeff == 0.0


def test_winsorize_clamps_to_group_thresholds(spark):
    from streaming_demos_spark.operators import relational as R

    rows = [("g", i, float(v)) for i, v in enumerate(range(1, 21))]
    rows += [("g", 99, 1000.0)]  # outlier
    df = spark.createDataFrame(rows, "grp string, rid int, v double")
    out = {r.rid: r.winsorized for r in
           R.winsorize(df, "grp", "v", "rid", 0.05, 0.95).collect()}
    # p95 of 1..20,1000 (percentile_cont over 21 values) = 20.0
    assert out[99] == 20.0
    # interior values untouched
    assert out[9] == 10.0
    # low tail clamped up to p05 = 2.0
    assert out[0] == 2.0


def test_knn_label_noise_flags_planted_mislabel(spark):
    from streaming_demos_spark.operators import similarity as SIM

    # 6 near-identical vectors, one labeled differently -> the odd one
    # disagrees with all its neighbors; the rest disagree only with it.
    rows = [(i, [1.0, 0.0, 0.01 * i], 0) for i in range(5)]
    rows.append((9, [1.0, 0.0, 0.02], 1))  # mislabeled twin
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label int"
    )
    out = {r.vec_id: r for r in
           SIM.knn_label_noise(df, k=5, num_planes=1).collect()}
    assert out[9].disagree_frac == 1.0
    for i in range(5):
        assert out[i].disagree_frac <= 0.2 + 1e-9


def test_knn_label_noise_singleton_bucket_yields_zero_neighbors(spark):
    from streaming_demos_spark.operators import similarity as SIM

    # Opposite-sign vectors project to +/-s0 — always different
    # 1-plane buckets (a two-dim vector could tie at 0 if the plane's
    # signs cancel).
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [-1.0, 0.0], 0)],
        "vec_id int, embedding array<double>, label int",
    )
    rows = SIM.knn_label_noise(df, k=3, num_planes=1).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_neighbors == 0 and r.disagree_frac is None


def test_ppmi_cooccurrence_window_and_positivity(spark):
    from streaming_demos_spark.operators import text as TX

    # "aa bb" always co-occur within the window; "aa zz" never
    # (distance 4 > window 3). PPMI clips at zero.
    docs = spark.createDataFrame(
        [(i, "aa bb cc dd zz") for i in range(10)],
        "doc_id int, text string",
    )
    out = TX.ppmi_cooccurrence(docs, window=3, min_count=5, top_n=50)
    got = {(r.w1, r.w2): r for r in out.collect()}
    assert ("aa", "bb") in got
    assert ("aa", "zz") not in got  # outside the window
    for r in got.values():
        assert r.ppmi >= 0.0
    # every within-window pair occurs 10 times (once per doc)
    assert got[("aa", "bb")].n_pair == 10


def test_join_size_profile_predicts_actual_join(spark):
    from streaming_demos_spark.operators import relational as R

    l = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k int"
    )
    r = spark.createDataFrame([(1,), (2,), (2,), (4,), (None,)], "k int")
    row = R.join_size_profile(l, "k", r, "k").collect()[0]
    actual = l.join(r, "k").count()
    assert row.predicted_rows == actual == 4  # 2*1 + 1*2
    assert row.max_key_rows == 2
    assert row.n_common_keys == 2
    assert row.n_left == 4 and row.n_right == 4  # NULLs excluded


def test_zipf_fit_recovers_planted_exponent(spark):
    from streaming_demos_spark.operators import relational as R

    # freq(rank r) = 2^(10 - r): exact log-log slope -1, r2 = 1.
    rows = []
    for r in range(1, 9):
        rows += [(f"t{r}",)] * (2 ** (10 - r))
    df = spark.createDataFrame(rows, "term string")
    out = R.zipf_fit(df, "term").collect()[0]
    assert out.n_terms == 8
    # ranks are 1..8 -> x = log2(r); y = 10 - r (not linear in x),
    # so don't expect slope exactly -1; just sanity: negative + strong fit
    assert out.zipf_slope < -1.0
    assert out.r2 > 0.9


def test_zipf_fit_exact_on_true_powerlaw(spark):
    from streaming_demos_spark.operators import relational as R

    # freq(rank r) = 64 / r for r in 1,2,4,8 ... not integer for all r;
    # use r in {1,2,4,8}: freq 64,32,16,8 -> y = 6 - x exactly.
    rows = []
    for r, f in [(1, 64), (2, 32), (3, 16), (4, 8)]:
        rows += [(f"w{r}",)] * f
    df = spark.createDataFrame(rows, "term string")
    out = R.zipf_fit(df, "term").collect()[0]
    # y = log2(f) halves per rank step while x = log2(r) is concave;
    # exactness only holds for true power laws — here check r2 high and
    # slope between -2 and -1 (bracketing the generating family).
    assert -2.5 < out.zipf_slope < -1.0
    assert out.r2 > 0.95


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: 3 synchronous rounds
    with min-label ties converge each triangle to one community (hand-
    replayed: clique {1,2,3} -> label 1, clique {10,11,12} -> 3 via the
    bridge's one-round label leak)."""
    from streaming_demos_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)],
        "src long, dst long",
    )
    got = {
        r.node: r.community
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}


def test_label_propagation_is_layout_invariant(spark):
    """Same answer under a repartitioned edge frame — the argmax
    tie-break is (count DESC, label ASC), never arrival order."""
    from streaming_demos_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(i, j) for i in range(20) for j in range(i + 1, 20)
         if (i * 7 + j) % 5 != 0],
        "src long, dst long",
    )
    a = sorted(map(tuple, label_propagation(edges, rounds=2).collect()))
    b = sorted(
        map(
            tuple,
            label_propagation(edges.repartition(13), rounds=2).collect(),
        )
    )
    assert a == b
