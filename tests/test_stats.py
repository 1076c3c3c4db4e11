"""Hypothesis-test operators vs independent numpy references.

Each test builds a tiny crafted frame (ties, unbalanced groups,
censoring — the cases the synthetic corpus can't pin down), computes
the statistic with plain numpy using the textbook formulation (full
sort / explicit contingency table — NOT the distributed grid re-plan),
and checks the Spark operator agrees to 1e-6. That cross-checks the
distinct-value-grid device against the classical definition.
"""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from streaming_demos_spark.operators import stats as ST


def _midranks(values):
    """Textbook average ranks (1-based) with ties, via full sort."""
    v = np.asarray(values, dtype=float)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    i = 0
    sv = v[order]
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # avg of i+1 .. j
        i = j
    return ranks


A = [3.1, 4.5, 4.5, 2.2, 5.0, 3.3, 4.4, 6.1]
B = [1.0, 2.2, 3.3, 2.5, 2.2, 1.9]


@pytest.fixture(scope="module")
def two_groups(spark):
    rows = [("a", v) for v in A] + [("b", v) for v in B]
    return spark.createDataFrame(rows, ["g", "v"])


def test_welch_vs_numpy(two_groups):
    row = ST.welch_ttest(two_groups, "g", "v", "a", "b").collect()[0]
    a, b = np.array(A), np.array(B)
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert row.n_a == len(A) and row.n_b == len(B)
    assert row.t_stat == pytest.approx(t, abs=1e-6)
    assert row.df_welch == pytest.approx(df, abs=1e-6)
    assert 0.0 < row.p_normal < 0.05  # clearly separated samples


def test_anova_vs_numpy(spark):
    groups = {"x": [1.0, 2.0, 3.0], "y": [2.0, 4.0, 6.0, 8.0], "z": [5.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    out = ST.one_way_anova(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v"
    ).collect()[0]
    allv = np.array([v for vs in groups.values() for v in vs])
    grand = allv.mean()
    ssb = sum(len(vs) * (np.mean(vs) - grand) ** 2 for vs in groups.values())
    ssw = sum(((np.array(vs) - np.mean(vs)) ** 2).sum() for vs in groups.values())
    f = (ssb / 2) / (ssw / (len(allv) - 3))
    assert out.k_groups == 3 and out.n_total == 8
    assert out.ss_between == pytest.approx(ssb, abs=1e-3)
    assert out.ss_within == pytest.approx(ssw, abs=1e-3)
    assert out.f_stat == pytest.approx(f, abs=1e-6)


def test_mann_whitney_vs_numpy(two_groups):
    row = ST.mann_whitney_u(two_groups, "g", "v", "a", "b").collect()[0]
    pooled = A + B
    ranks = _midranks(pooled)
    ra = ranks[: len(A)].sum()
    u = ra - len(A) * (len(A) + 1) / 2
    n, na, nb = len(pooled), len(A), len(B)
    _, counts = np.unique(pooled, return_counts=True)
    ties = float((counts.astype(float) ** 3 - counts).sum())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    assert row.u_stat == pytest.approx(u, abs=1e-6)
    assert row.z_stat == pytest.approx(z, abs=1e-6)
    p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(z) / math.sqrt(2.0))))
    assert row.p_normal == pytest.approx(p, abs=1e-5)  # A&S poly ~1.5e-7


def test_ks_vs_numpy(two_groups):
    row = ST.ks_two_sample(two_groups, "g", "v", "a", "b").collect()[0]
    grid = sorted(set(A + B))
    a, b = np.array(A), np.array(B)
    d = max(
        abs((a <= t).mean() - (b <= t).mean()) for t in grid
    )
    assert row.d_stat == pytest.approx(d, abs=1e-6)
    m = len(A) * len(B) / (len(A) + len(B))
    assert row.p_asymptotic == pytest.approx(
        min(1.0, 2.0 * math.exp(-2.0 * m * d * d)), abs=1e-6
    )


def test_chi_square_vs_numpy(spark):
    rows = (
        [("u", "x")] * 20 + [("u", "y")] * 10
        + [("w", "x")] * 5 + [("w", "y")] * 25
    )
    out = ST.chi_square_independence(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b"
    ).collect()[0]
    obs = np.array([[20, 10], [5, 25]], dtype=float)
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert out.n_rows == 60 and out.dof == 1
    assert out.chi2 == pytest.approx(chi2, abs=1e-6)
    assert out.cramers_v == pytest.approx(math.sqrt(chi2 / 60), abs=1e-6)


def test_spearman_perfect_monotone(spark):
    # y = x^3 is a nonlinear but strictly monotone map: rho must be 1.
    df = spark.createDataFrame(
        [(float(x), float(x**3)) for x in range(1, 9)], ["x", "y"]
    )
    row = ST.spearman_correlation(df, "x", "y").collect()[0]
    assert row.spearman_rho == pytest.approx(1.0, abs=1e-9)


def test_spearman_ties_vs_numpy(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 4.0]
    row = ST.spearman_correlation(
        spark.createDataFrame(list(zip(xs, ys)), ["x", "y"]), "x", "y"
    ).collect()[0]
    rx, ry = _midranks(xs), _midranks(ys)
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row.spearman_rho == pytest.approx(rho, abs=1e-6)


def test_log_rank_identical_cohorts_is_zero(spark):
    # Two copies of the same survival experience: chi2 exactly 0.
    base = [(1, True), (2, True), (3, False), (5, True), (8, False)]
    rows = [(t, e, "a") for t, e in base] + [(t, e, "b") for t, e in base]
    out = ST.log_rank_test(
        spark.createDataFrame(rows, ["t", "e", "g"]), "t", "e", "g", "a"
    ).collect()[0]
    assert out.chi2 == pytest.approx(0.0, abs=1e-9)
    assert out.p_normal == pytest.approx(1.0, abs=1e-6)


def test_log_rank_vs_hand_formula(spark):
    rows = [
        (1, True, "a"), (2, True, "a"), (4, False, "a"), (6, True, "a"),
        (1, True, "b"), (3, True, "b"), (3, True, "b"), (7, False, "b"),
    ]
    out = ST.log_rank_test(
        spark.createDataFrame(rows, ["t", "e", "g"]), "t", "e", "g", "a"
    ).collect()[0]
    # Hand-rolled textbook computation over event times.
    data = [(t, e, g) for t, e, g in rows]
    times = sorted({t for t, e, _ in data if e})
    soe = sv = 0.0
    for tj in times:
        at_risk = [(t, e, g) for t, e, g in data if t >= tj]
        n = len(at_risk)
        na = sum(1 for *_, g in at_risk if g == "a")
        d = sum(1 for t, e, _ in data if t == tj and e)
        da = sum(1 for t, e, g in data if t == tj and e and g == "a")
        soe += da - d * na / n
        if n > 1:
            sv += d * (na / n) * (1 - na / n) * (n - d) / (n - 1)
    assert out.n_event_times == len(times)
    assert out.observed_minus_expected == pytest.approx(soe, abs=1e-6)
    assert out.chi2 == pytest.approx(soe * soe / sv, abs=1e-6)


def test_bh_adjust_known_example(spark):
    # Classic worked example: q = min suffix of p*m/rank.
    ps = [("t1", 0.01), ("t2", 0.04), ("t3", 0.03), ("t4", 0.005)]
    out = {
        r.k: (r.p_rank, r.q_value)
        for r in ST.bh_adjust(
            spark.createDataFrame(ps, ["k", "p"]), ["k"], "p"
        ).collect()
    }
    # sorted p: .005(1) .01(2) .03(3) .04(4); m=4
    # raw p*m/rank: .02 .02 .04 .04 -> suffix mins: .02 .02 .04 .04
    assert out["t4"] == (1, pytest.approx(0.02))
    assert out["t1"] == (2, pytest.approx(0.02))
    assert out["t3"] == (3, pytest.approx(0.04))
    assert out["t2"] == (4, pytest.approx(0.04))


def test_norm_sf_accuracy(spark):
    # A&S 7.1.26 vs math.erf across the useful z range.
    df = spark.range(1).select(
        *[
            ST.norm_sf_2sided(F.lit(z)).alias(f"p{i}")
            for i, z in enumerate([0.0, 0.5, 1.0, 1.96, 2.58, 4.0])
        ]
    )
    got = df.collect()[0]
    for i, z in enumerate([0.0, 0.5, 1.0, 1.96, 2.58, 4.0]):
        exact = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(z / math.sqrt(2.0))))
        assert got[f"p{i}"] == pytest.approx(exact, abs=2e-7)


def test_conformal_interval_matches_hand_replay(spark):
    """Replicate the md5 split + exact integer arithmetic in plain
    Python and demand bit-identical (q_num, k_rank, coverage)."""
    import hashlib
    import math

    from streaming_demos_spark.operators.stats import conformal_interval

    rows = [(i, "g", 0.25 * i) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "event_id long, g string, value double")
    got = conformal_interval(df, "g", "value", "event_id", alpha=0.1).collect()[0]

    cal, test = [], []
    for i, _, v in rows:
        vu = round(v * 100)
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 2
        (cal if bucket == 0 else test).append(vu)
    n_cal, s = len(cal), sum(cal)
    resid = sorted(abs(v * n_cal - s) for v in cal)
    k = min(n_cal, math.ceil((n_cal + 1) * 0.9))
    q = resid[k - 1]
    covered = sum(1 for v in test if abs(v * n_cal - s) <= q)

    assert got.n_cal == n_cal and got.n_test == len(test)
    assert got.k_rank == k and got.q_num == q
    assert got.n_covered == covered
    # sanity: the guarantee direction on this symmetric sample
    assert covered / len(test) >= 0.7


def test_mann_kendall_monotone_and_flat(spark):
    import datetime as dt

    from streaming_demos_spark.operators.stats import mann_kendall_trend

    base = dt.datetime(2024, 1, 1, 10)
    rows = (
        # strictly increasing daily series: S = C(10,2) = 45, p small
        [("up", base + dt.timedelta(days=i), 1.0 + i) for i in range(10)]
        # constant series: S = 0, all ties
        + [("flat", base + dt.timedelta(days=i), 5.0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r.g: r for r in mann_kendall_trend(df, "g", "ts", "v").collect()}
    up = out["up"]
    assert (up.n_days, up.s_stat, up.tie_term) == (10, 45, 0)
    assert up.z > 2.5 and up.p_normal < 0.01
    flat = out["flat"]
    assert flat.s_stat == 0 and flat.z == 0.0
    # one tie group of 10: 10*9*25
    assert flat.tie_term == 10 * 9 * 25


def test_stratified_ate_exact_parts(spark):
    from streaming_demos_spark.operators.stats import stratified_ate

    rows = [
        # stratum A: treated mean 10.00 (2 rows), control mean 7.50 (2)
        ("A", True, 9.0), ("A", True, 11.0),
        ("A", False, 7.0), ("A", False, 8.0),
        # stratum B: only treated -> dropped
        ("B", True, 5.0),
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    out = stratified_ate(df, "s", "t", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.stratum, r.n_t, r.n_c) == ("A", 2, 2)
    assert (r.sum_t_units, r.sum_c_units) == (2000, 1500)
    assert r.diff_e4 == 25000  # (10.00 - 7.50) * 1e4


def test_srm_check_exact_chi2_parts(spark):
    from streaming_demos_spark.operators.stats import srm_check
    from pyspark.sql import functions as F

    # 3 arms with 10/10/13 units (unit 99 duplicated rows count once)
    rows = (
        [(i, i % 100) for i in range(10)]          # arm pattern via id
    )
    # build explicit arms: 10 units arm0, 10 arm1, 13 arm2
    data = (
        [(i, 0) for i in range(10)]
        + [(100 + i, 1) for i in range(10)]
        + [(200 + i, 2) for i in range(13)]
        + [(200, 2)] * 3  # duplicate unit rows must not inflate counts
    )
    df = spark.createDataFrame(data, "user_id long, arm long")
    r = srm_check(df, "user_id", "arm", n_arms=3).collect()[0]
    assert (r.n_units, r.n_arms, r.min_arm, r.max_arm) == (33, 3, 10, 13)
    # chi2 = sum(3o-n)^2/(3n): o = 10,10,13, n = 33
    num = sum((3 * o - 33) ** 2 for o in (10, 10, 13))
    assert (r.chi2_num, r.chi2_den) == (num, 99)
    assert r.chi2_e6 == round(num * 1_000_000 / 99)


def test_mcnemar_hand_case(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import mcnemar_test

    # u1: A only, u2: A only, u3: B only, u4: both, u5: neither
    rows = [
        (1, "a"), (2, "a"), (3, "b"), (4, "a"), (4, "b"), (5, "x"),
    ]
    df = spark.createDataFrame(rows, "u long, ev string")
    r = mcnemar_test(
        df, "u", F.col("ev") == "a", F.col("ev") == "b"
    ).collect()[0]
    assert (r.n_units, r.b01, r.b10) == (5, 2, 1)
    # chi2 = (2-1)^2 / 3 = 1/3 -> 333333 (half-up e6)
    assert r.chi2_e6 == 333333


def test_mcnemar_no_discordant_is_null(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import mcnemar_test

    rows = [(1, "a"), (1, "b"), (2, "x")]
    df = spark.createDataFrame(rows, "u long, ev string")
    r = mcnemar_test(
        df, "u", F.col("ev") == "a", F.col("ev") == "b"
    ).collect()[0]
    assert (r.b01, r.b10, r.chi2_e6) == (0, 0, None)


def test_cramers_v_perfect_association(spark):
    from streaming_demos_spark.operators.stats import cramers_v

    # y fully determined by x -> V = 1
    rows = [("a", "p")] * 5 + [("b", "q")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert (r.n, r.n_x_cats, r.n_y_cats) == (10, 2, 2)
    # chi2 = n = 10 -> chi2_e6 = 1e7; V = sqrt(10/(10*1)) = 1
    assert r.chi2_e6 == 10000000
    assert r.cramers_v == 1.0


def test_cramers_v_independence_is_zero(spark):
    from streaming_demos_spark.operators.stats import cramers_v

    rows = [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert r.chi2_e6 == 0 and r.cramers_v == 0.0


def test_fleiss_kappa_perfect_agreement(spark):
    from streaming_demos_spark.operators.stats import fleiss_kappa

    # every item's raters unanimous, two categories used overall
    rows = (
        [(1, "x")] * 3 + [(2, "y")] * 3 + [(3, "x")] * 3
    )
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r.n_items, r.n_ratings, r.pbar_e6) == (3, 9, 1000000)
    # Pe = (6/9)^2 + (3/9)^2 = 5/9 -> 555556; kappa = 1
    assert r.pe_e6 == 555556
    assert r.kappa_e6 == 1000000


def test_fleiss_kappa_drops_single_rater_items(spark):
    from streaming_demos_spark.operators.stats import fleiss_kappa

    rows = [(1, "x"), (1, "x"), (2, "y")]  # item 2 has 1 rater -> dropped
    df = spark.createDataFrame(rows, "item long, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r.n_items, r.n_ratings) == (1, 2)


def test_iptw_ate_hand_case(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import iptw_ate

    # u1 treated: 2 events (p_e4 = 500 clamp? 250*2=500), purchase 10.00
    # u2 control: 1 event (p_e4 = 500), purchase 5.00
    rows = [
        (1, "click", 0.0),
        (1, "purchase", 10.0),
        (2, "purchase", 5.0),
    ]
    df = spark.createDataFrame(rows, "u long, ev string, value double")
    r = iptw_ate(
        df,
        "u",
        treated=F.col("ev") == "click",
        outcome_cents=F.when(
            F.col("ev") == "purchase",
            F.expr("cast(round(value * 100) as bigint)"),
        ).otherwise(F.lit(0).cast("bigint")),
        exposure_count=F.lit(1).cast("long"),
    ).collect()[0]
    assert (r.n_treated, r.n_control) == (1, 1)
    # treated: y=1000 cents, p=500 -> 1000*1e4/500 = 20000
    assert r.wsum_treated_cents == 20000
    # control: y=500, 1-p=9500 -> round(500*1e4/9500) = round(526.3) = 526
    assert r.wsum_control_cents == 526
    # ate = (20000-526)/2 = 9737
    assert r.ate_cents == 9737


def test_cochran_q_hand_case(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import cochran_q

    # 4 units x 3 treatments:
    # u1: a,b ; u2: a ; u3: a,b,c ; u4: (none)
    rows = [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (3, "b"), (3, "c")]
    df = spark.createDataFrame(rows + [(4, "z")], "u long, ev string")
    r = cochran_q(
        df,
        "u",
        {
            "a": F.col("ev") == "a",
            "b": F.col("ev") == "b",
            "c": F.col("ev") == "c",
        },
    ).collect()[0]
    # C = (3, 2, 1), R = (2, 1, 3, 0): sr=6, sr2=14, SC2=14
    # Q = 2*(3*14-36)/(18-14) = 12/4 = 3
    assert (r.n_units, r.k_treatments, r.n_positives) == (4, 3, 6)
    assert r.q_e6 == 3000000


def test_odds_ratio_hand_case(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import odds_ratio

    # a=2 (exposed+outcome), b=1, c=1, d=2
    rows = (
        [(1, "e"), (1, "o"), (2, "e"), (2, "o"), (3, "e")]
        + [(4, "o"), (5, "x"), (6, "x")]
    )
    df = spark.createDataFrame(rows, "u long, ev string")
    r = odds_ratio(
        df, "u", exposed=F.col("ev") == "e", outcome=F.col("ev") == "o"
    ).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (2, 1, 1, 2)
    assert r.odds_ratio_e6 == 4000000       # (2*2)/(1*1)
    assert r.relative_risk_e6 == 2000000    # (2/3)/(1/3)
    assert r.or_ci_lo < 4.0 < r.or_ci_hi


def test_runs_test_alternating_and_blocked(spark):
    import datetime as dt

    from streaming_demos_spark.operators.stats import runs_test

    base = dt.datetime(2024, 1, 1)
    rows = []
    # alternating high/low for 10 days -> max runs (10)
    for d in range(10):
        rows.append(("alt", base + dt.timedelta(days=d),
                     100.0 if d % 2 == 0 else 1.0))
    # blocked: 5 low days then 5 high days -> 2 runs
    for d in range(10):
        rows.append(("blk", base + dt.timedelta(days=d),
                     1.0 if d < 5 else 100.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r.k: r for r in runs_test(df, "k", "ts", "value").collect()}
    assert (out["alt"].n_plus, out["alt"].n_minus) == (5, 5)
    assert out["alt"].n_runs == 10 and out["alt"].z > 2.0
    assert out["blk"].n_runs == 2 and out["blk"].z < -2.0


def test_herfindahl_even_vs_monopoly(spark):
    from streaming_demos_spark.operators.relational import herfindahl_index

    rows = [("even", f"k{i}", 10.0) for i in range(4)]
    rows += [("mono", "k0", 100.0), ("mono", "k1", 0.0)]
    df = spark.createDataFrame(rows, "g string, k string, v double")
    out = {r.g: r.hhi_e6
           for r in herfindahl_index(df, "g", "k", "v").collect()}
    assert out["even"] == 250000     # 4 * (1/4)^2
    assert out["mono"] == 1000000    # one key holds everything


def test_iptw_ate_negative_outcome_matches_floor_oracle(spark):
    # refunds: a negative per-unit outcome must divide identically to
    # the DuckDB // (floor) oracle — the abs+sign device keeps the
    # integer division on non-negative operands in both engines.
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import iptw_ate

    rows = [
        (1, "click", 0.0),
        (1, "purchase", -7.77),   # treated refund
        (2, "purchase", -5.0),    # control refund
    ]
    df = spark.createDataFrame(rows, "u long, ev string, value double")
    r = iptw_ate(
        df,
        "u",
        treated=F.col("ev") == "click",
        outcome_cents=F.when(
            F.col("ev") == "purchase",
            F.expr("cast(round(value * 100) as bigint)"),
        ).otherwise(F.lit(0).cast("bigint")),
        exposure_count=F.lit(1).cast("long"),
    ).collect()[0]
    # treated: y=-777, p=500 -> -round(777*1e4/500) = -15540
    assert r.wsum_treated_cents == -15540
    # control: y=-500, 1-p=9500 -> -round(500*1e4/9500) = -526
    assert r.wsum_control_cents == -526
    # ate = (-15540 + 526) = -15014 -> -round(15014/2) = -7507
    assert r.ate_cents == -7507


def test_paired_tests_count_null_only_units_as_zero(spark):
    # a unit whose flag expression is NULL on every row (e.g. NULL
    # event_type) must count as 0 — matching the oracles' CASE WHEN
    # ... ELSE 0 — not poison the aggregate with NULL.
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators.stats import (
        mcnemar_test,
        odds_ratio,
    )

    rows = [(1, "a"), (1, "b"), (2, "a"), (3, None)]
    df = spark.createDataFrame(rows, "u long, ev string")
    flag_a = F.when(F.col("ev").isNotNull(), F.col("ev") == "a")
    flag_b = F.when(F.col("ev").isNotNull(), F.col("ev") == "b")
    m = mcnemar_test(df, "u", flag_a, flag_b).collect()[0]
    # u1 concordant(1,1), u2 (1,0), u3 NULL-only -> (0,0)
    assert (m.n_units, m.b01, m.b10) == (3, 1, 0)
    o = odds_ratio(df, "u", exposed=flag_a, outcome=flag_b).collect()[0]
    assert (o.a, o.b, o.c, o.d) == (1, 1, 0, 1)
