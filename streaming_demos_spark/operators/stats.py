"""Distributed hypothesis tests and inferential statistics.

The reference ships dashboard-grade descriptive stats (see
product-demos/streamlit/utils.py:25-104 for the metric rollups these
extend); a 100 TB curation pipeline additionally needs the *inferential*
layer — "is this shard's quality distribution actually different?",
"which n groups survive an FDR screen?" — computed without ever pulling
a sample to the driver.

Every test here reduces to one of two Catalyst-friendly shapes:

1. **Moment tests** (Welch t, one-way ANOVA, chi-square): one or two
   hash aggregations producing per-group sufficient statistics (n, Σx,
   Σx²or cell counts), combined by closed-form column arithmetic on a
   frame whose size is the number of GROUPS, not rows. Map-side partial
   aggregation does the heavy lifting; no window functions at all.

2. **Rank / ECDF tests** (Mann-Whitney U, Kolmogorov-Smirnov, Spearman,
   log-rank): the classical formulation sorts all N rows, which on a
   cluster would be a global window — a single-task scale-killer. Each
   is re-planned onto the DISTINCT-VALUE GRID: aggregate per distinct
   value first (hash shuffle, combiner-friendly), then run the
   cumulative window over the grid only. Average ranks, ECDFs and
   at-risk counts are all exact functions of (value, per-value counts),
   so results are bit-identical to the sorted-row formulation while the
   window input is bounded by value cardinality (ties collapse; for
   continuous data a pre-rounding step bounds the grid explicitly).

Normal-CDF p-values use the Abramowitz & Stegun 7.1.26 erf polynomial
(max abs error 1.5e-7) written as plain column arithmetic so the DuckDB
oracles can evaluate the *identical* polynomial — neither engine has a
built-in erf.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "welch_ttest",
    "one_way_anova",
    "mann_whitney_u",
    "ks_two_sample",
    "chi_square_independence",
    "spearman_correlation",
    "log_rank_test",
    "bh_adjust",
    "kruskal_wallis",
    "grid_group_median",
    "brown_forsythe",
    "mcnemar_test",
    "cramers_v",
    "fleiss_kappa",
    "iptw_ate",
    "cochran_q",
    "odds_ratio",
    "runs_test",
]


def norm_sf_2sided(z: Column) -> Column:
    """Two-sided normal tail probability ``2 * (1 - Phi(|z|))`` via the
    Abramowitz & Stegun 7.1.26 erf polynomial (|err| < 1.5e-7). Plain
    column arithmetic — evaluates inside whole-stage codegen, and the
    same five coefficients are re-stated verbatim in the SQL oracles.
    """
    x = F.abs(z) / F.lit(2.0 ** 0.5)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    return F.lit(1.0) - erf


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_dp: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test between two named groups.

    One hash aggregation produces (n, mean, m2) per group via the
    textbook sufficient statistics (n, Σx, Σx²); the t statistic and
    Welch-Satterthwaite degrees of freedom are closed-form arithmetic
    on a two-row frame. ``try_divide`` guards the degenerate cases
    (n < 2 or zero variance in both samples) by yielding NULL-free
    zeros rather than an ANSI abort.
    """
    v = F.col(value_col).cast("double")
    per = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(group_col)
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("s1"),
            F.sum(v * v).alias("s2"),
        )
        .select(
            group_col,
            "n",
            (F.col("s1") / F.col("n")).alias("mean"),
            # Sample variance from the moment form; clamp the tiny
            # negative residue catastrophic cancellation can leave.
            F.greatest(
                F.lit(0.0),
                F.try_divide(
                    F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"),
                    F.col("n") - F.lit(1),
                ),
            ).alias("var"),
        )
    )
    a = per.filter(F.col(group_col) == group_a).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = per.filter(F.col(group_col) == group_b).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    j = a.crossJoin(b)  # 1 x 1 rows: the two scalar stat frames
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    t_stat = F.coalesce(
        F.try_divide(F.col("mean_a") - F.col("mean_b"), F.sqrt(se2)),
        F.lit(0.0),
    )
    # Products, not pow(): Math.pow(x, 2) is allowed 1 ulp off x*x and
    # the oracles spell these as products.
    va_n = F.col("var_a") / F.col("n_a")
    vb_n = F.col("var_b") / F.col("n_b")
    df_w = F.coalesce(
        F.try_divide(
            se2 * se2,
            F.try_divide(va_n * va_n, F.col("n_a") - F.lit(1))
            + F.try_divide(vb_n * vb_n, F.col("n_b") - F.lit(1)),
        ),
        F.lit(0.0),
    )
    return j.select(
        "n_a",
        "n_b",
        F.round("mean_a", round_dp).alias("mean_a"),
        F.round("mean_b", round_dp).alias("mean_b"),
        F.round(t_stat, round_dp).alias("t_stat"),
        F.round(df_w, round_dp).alias("df_welch"),
        F.round(norm_sf_2sided(t_stat), round_dp).alias("p_normal"),
    )


def one_way_anova(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic across ALL groups of ``group_col``.

    Two chained aggregations: per-group (n, Σx, Σx²), then a single
    global combine of those sufficient statistics into SS_between /
    SS_within — the canonical two-level tree aggregation, never a
    second pass over the rows. Output is one row:
    (k_groups, n_total, ss_between, ss_within, f_stat).
    """
    v = F.col(value_col).cast("double")
    per = df.groupBy(group_col).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    tot = per.agg(
        F.count("*").alias("k_groups"),
        F.sum("n").alias("n_total"),
        # Σ_g n_g * (mean_g - grand)^2  ==  Σ_g s1_g^2/n_g - S1^2/N
        F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("_sb_raw"),
        F.sum("s1").alias("_S1"),
        F.sum("s2").alias("_S2"),
    )
    ssb = F.greatest(
        F.lit(0.0),
        F.col("_sb_raw") - F.col("_S1") * F.col("_S1") / F.col("n_total"),
    )
    ssw = F.greatest(F.lit(0.0), F.col("_S2") - F.col("_sb_raw"))
    f_stat = F.coalesce(
        F.try_divide(
            F.try_divide(ssb, F.col("k_groups") - F.lit(1)),
            F.try_divide(ssw, F.col("n_total") - F.col("k_groups")),
        ),
        F.lit(0.0),
    )
    # SS terms are O(Σx²)-magnitude; 3dp keeps the rounding well above
    # summation-order ulp noise while the O(1) F statistic gets full dp.
    return tot.select(
        "k_groups",
        "n_total",
        F.round(ssb, 3).alias("ss_between"),
        F.round(ssw, 3).alias("ss_within"),
        F.round(f_stat, round_dp).alias("f_stat"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_dp: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with tie correction and the
    normal approximation z / p.

    Average ranks never touch per-row windows: for a distinct value v
    with cum_less(v) rows strictly below it and t(v) total rows tied at
    it, every tied row's midrank is ``cum_less + (t + 1) / 2``. So the
    plan is: per-distinct-value counts (hash agg) → running sum over
    the VALUE GRID (window bounded by value cardinality) → one global
    combine for R_a, the tie-correction Σ(t³ - t), and the closed-form
    U, z, p. Bit-identical to scipy's tie-corrected statistic.
    """
    v = F.col(value_col).cast("double")
    two = df.filter(F.col(group_col).isin([group_a, group_b]))
    per_v = two.groupBy(v.alias("_v")).agg(
        F.count("*").alias("_t"),
        F.sum(
            F.when(F.col(group_col) == group_a, F.lit(1)).otherwise(F.lit(0))
        ).alias("_ta"),
    )
    w_prev = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "_t",
        "_ta",
        (
            F.coalesce(F.sum("_t").over(w_prev), F.lit(0))
            + (F.col("_t") + F.lit(1)) / F.lit(2.0)
        ).alias("_midrank"),
    )
    t_d = F.col("_t").cast("double")
    agg = ranked.agg(
        F.sum("_ta").alias("n_a"),
        F.sum(F.col("_t") - F.col("_ta")).alias("n_b"),
        F.sum(F.col("_ta") * F.col("_midrank")).alias("_ra"),
        F.sum(t_d * t_d * t_d - t_d).alias("_ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u_a = F.col("_ra") - n_a * (n_a + F.lit(1)) / F.lit(2.0)
    var_u = (
        n_a * n_b / F.lit(12.0)
        * ((n + F.lit(1)) - F.try_divide(F.col("_ties"), n * (n - F.lit(1))))
    )
    z = F.coalesce(
        F.try_divide(u_a - n_a * n_b / F.lit(2.0), F.sqrt(var_u)), F.lit(0.0)
    )
    return agg.select(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(u_a, round_dp).alias("u_stat"),
        F.round(z, round_dp).alias("z_stat"),
        F.round(norm_sf_2sided(z), round_dp).alias("p_normal"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_dp: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D with the asymptotic first-term
    p approximation ``2 * exp(-2 * m * D^2)``, m = n_a*n_b/(n_a+n_b).

    Both ECDFs are running sums over the distinct-value grid (the KS
    statistic is constant between jumps, so evaluating at jump points
    is exact); the sup becomes a max over the grid. No per-row window.
    """
    v = F.col(value_col).cast("double")
    two = df.filter(F.col(group_col).isin([group_a, group_b]))
    per_v = two.groupBy(v.alias("_v")).agg(
        F.sum(
            F.when(F.col(group_col) == group_a, F.lit(1)).otherwise(F.lit(0))
        ).alias("_ca"),
        F.sum(
            F.when(F.col(group_col) == group_b, F.lit(1)).otherwise(F.lit(0))
        ).alias("_cb"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = per_v.select(
        (F.sum("_ca").over(w_cum) / F.sum("_ca").over(w_all)).alias("_fa"),
        (F.sum("_cb").over(w_cum) / F.sum("_cb").over(w_all)).alias("_fb"),
        F.sum("_ca").over(w_all).alias("_na"),
        F.sum("_cb").over(w_all).alias("_nb"),
    )
    agg = ecdf.agg(
        F.max(F.abs(F.col("_fa") - F.col("_fb"))).alias("_d"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    m = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / (F.col("n_a") + F.col("n_b"))
    )
    p = F.least(
        F.lit(1.0),
        F.lit(2.0) * F.exp(F.lit(-2.0) * m * F.col("_d") * F.col("_d")),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round("_d", round_dp).alias("d_stat"),
        F.round(p, round_dp).alias("p_asymptotic"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_dp: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size.

    One cell-count aggregation (|A| x |B| cells), then the row / column
    marginals are re-aggregated FROM THE CELLS (grids, not rows) and
    joined back — AQE broadcasts both marginal frames. Output one row:
    (n_rows, dof, chi2, cramers_v).
    """
    cells = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count("*").alias("_o"))
    row_m = cells.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    col_m = cells.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.countDistinct("_a").alias("_ka"),
        F.countDistinct("_b").alias("_kb"),
    )
    joined = (
        cells.join(F.broadcast(row_m), "_a")
        .join(F.broadcast(col_m), "_b")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("_ra").cast("double") * F.col("_cb") / F.col("_n")
    per_cell = joined.select(
        ((F.col("_o") - e) * (F.col("_o") - e) / e).alias("_x2"),
        "_n",
        "_ka",
        "_kb",
    )
    agg = per_cell.groupBy("_n", "_ka", "_kb").agg(
        F.sum("_x2").alias("_chi2")
    )
    dof = (F.col("_ka") - F.lit(1)) * (F.col("_kb") - F.lit(1))
    v = F.sqrt(
        F.coalesce(
            F.try_divide(
                F.col("_chi2"),
                F.col("_n")
                * F.least(F.col("_ka") - F.lit(1), F.col("_kb") - F.lit(1)),
            ),
            F.lit(0.0),
        )
    )
    return agg.select(
        F.col("_n").alias("n_rows"),
        dof.cast("long").alias("dof"),
        F.round("_chi2", round_dp).alias("chi2"),
        F.round(v, round_dp).alias("cramers_v"),
    )


def spearman_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Spearman rank correlation with average-rank tie handling.

    Midranks come from the same distinct-value-grid device as the
    rank-sum test, once per column: per-value counts → grid running sum
    → midrank, joined back to the rows by VALUE (equi join, AQE
    broadcasts the grid when small). Pearson on the midranks is then a
    single aggregation in moment form. No per-row window anywhere.
    """
    rows = df.select(
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())

    def midranks(col_name: str, out: str) -> DataFrame:
        per_v = rows.groupBy(F.col(col_name).alias("_v")).agg(
            F.count("*").alias("_t")
        )
        w_prev = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, -1
        )
        return per_v.select(
            F.col("_v").alias(col_name),
            (
                F.coalesce(F.sum("_t").over(w_prev), F.lit(0))
                + (F.col("_t") + F.lit(1)) / F.lit(2.0)
            ).alias(out),
        )

    ranked = rows.join(midranks("_x", "_rx"), "_x").join(
        midranks("_y", "_ry"), "_y"
    )
    agg = ranked.agg(
        F.count("*").alias("n_rows"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
    )
    n = F.col("n_rows").cast("double")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n
    vx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n
    vy = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    rho = F.coalesce(
        F.try_divide(cov, F.sqrt(F.greatest(F.lit(0.0), vx * vy))),
        F.lit(0.0),
    )
    return agg.select(
        "n_rows", F.round(rho, round_dp).alias("spearman_rho")
    )


def log_rank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    round_dp: int = 6,
) -> DataFrame:
    """Two-group log-rank test on (duration, observed-event, group)
    rows — the standard companion to the Kaplan-Meier curves this
    module's survival family already draws.

    At each distinct event time j: d_j events out of n_j at risk, of
    which n_aj at risk in group A contribute expectation
    ``e_aj = d_j * n_aj / n_j`` and hypergeometric variance
    ``v_j = d_j * (n_aj/n_j) * (1 - n_aj/n_j) * (n_j - d_j)/(n_j - 1)``.
    Chi2 = (Σ(d_aj - e_aj))² / Σ v_j. At-risk counts are suffix sums
    over the distinct-duration grid (the kaplan_meier device), so the
    whole test is two hash aggs + one bounded grid window.
    """
    is_a = F.col(group_col) == group_a
    per_t = df.groupBy(F.col(duration_col).alias("_t")).agg(
        F.count("*").alias("_tot"),
        F.sum(F.when(is_a, 1).otherwise(0)).alias("_tot_a"),
        F.sum(F.col(event_col).cast("long")).alias("_d"),
        F.sum(
            F.when(is_a, F.col(event_col).cast("long")).otherwise(F.lit(0))
        ).alias("_da"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, -1)
    grid = per_t.select(
        "_d",
        "_da",
        (
            F.sum("_tot").over(w_all)
            - F.coalesce(F.sum("_tot").over(w_prev), F.lit(0))
        ).alias("_n"),
        (
            F.sum("_tot_a").over(w_all)
            - F.coalesce(F.sum("_tot_a").over(w_prev), F.lit(0))
        ).alias("_na"),
    ).filter(F.col("_d") > 0)
    p_a = F.col("_na").cast("double") / F.col("_n")
    e_a = F.col("_d") * p_a
    v_j = F.coalesce(
        F.try_divide(
            F.col("_d") * p_a * (F.lit(1.0) - p_a) * (F.col("_n") - F.col("_d")),
            (F.col("_n") - F.lit(1)).cast("double"),
        ),
        F.lit(0.0),
    )
    agg = grid.select(
        (F.col("_da") - e_a).alias("_oe"), v_j.alias("_v")
    ).agg(
        F.sum("_oe").alias("_soe"),
        F.sum("_v").alias("_sv"),
        F.count("*").alias("n_event_times"),
    )
    chi2 = F.coalesce(
        F.try_divide(F.col("_soe") * F.col("_soe"), F.col("_sv")), F.lit(0.0)
    )
    z = F.coalesce(
        F.try_divide(F.col("_soe"), F.sqrt(F.col("_sv"))), F.lit(0.0)
    )
    return agg.select(
        "n_event_times",
        F.round("_soe", round_dp).alias("observed_minus_expected"),
        F.round(chi2, round_dp).alias("chi2"),
        F.round(norm_sf_2sided(z), round_dp).alias("p_normal"),
    )


def bh_adjust(
    df: DataFrame,
    key_cols: list,
    p_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment over a frame of per-test
    p-values: q_i = min over j >= i of (p_(j) * m / j), computed as a
    suffix running-min window over the TESTS frame (one row per
    hypothesis — bounded by the number of tests, which is a
    group-cardinality frame, never the raw rows).

    Ties on p are ranked by row_number with the key columns as a
    deterministic tiebreak, which leaves q-values invariant (equal p →
    equal q after the suffix min).
    """
    m = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ordered = df.withColumn(
        "_rank",
        F.row_number().over(Window.orderBy(F.col(p_col), *key_cols)),
    ).withColumn("_m", F.count("*").over(m))
    w_suffix = Window.orderBy("_rank").rowsBetween(
        0, Window.unboundedFollowing
    )
    q = F.least(
        F.lit(1.0),
        F.min(
            F.col(p_col) * F.col("_m") / F.col("_rank")
        ).over(w_suffix),
    )
    return ordered.select(
        *key_cols,
        F.col(p_col),
        F.col("_rank").alias("p_rank"),
        F.round(q, round_dp).alias("q_value"),
    )

def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H test (rank-based one-way ANOVA) across ALL
    groups of ``group_col``, with the standard tie correction.

    Same distinct-value-grid device as the rank-sum test, extended to k
    groups: per-(value, group) cell counts (hash agg), per-value totals
    for the midrank running sum over the GRID, cells joined back to the
    grid by value (equi join, AQE broadcast), per-group rank sums, then
    one closed-form combine:

        H  = 12 / (N (N+1)) * SUM_g R_g^2 / n_g  -  3 (N+1)
        C  = 1 - SUM_v (t_v^3 - t_v) / (N^3 - N)
        Hc = H / C

    No global row sort anywhere; the only window runs over the distinct
    value grid (pre-round continuous values to bound it). Output one
    row: (k_groups, n_total, h_stat, h_corrected, dof).
    """
    v = F.col(value_col).cast("double")
    cells = df.groupBy(
        v.alias("_v"), F.col(group_col).alias("_g")
    ).agg(F.count("*").alias("_c"))
    per_v = cells.groupBy("_v").agg(F.sum("_c").alias("_t"))
    w_prev = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    grid = per_v.select(
        "_v",
        "_t",
        (
            F.coalesce(F.sum("_t").over(w_prev), F.lit(0))
            + (F.col("_t") + F.lit(1)) / F.lit(2.0)
        ).alias("_midrank"),
    )
    per_g = (
        cells.join(grid.select("_v", "_midrank"), "_v")
        .groupBy("_g")
        .agg(
            F.sum("_c").alias("_n"),
            F.sum(F.col("_c") * F.col("_midrank")).alias("_r"),
        )
    )
    t_d = F.col("_t").cast("double")
    ties = grid.agg(F.sum(t_d * t_d * t_d - t_d).alias("_ties"))
    tot = per_g.agg(
        F.count("*").alias("k_groups"),
        F.sum("_n").alias("n_total"),
        F.sum(F.col("_r") * F.col("_r") / F.col("_n")).alias("_rr"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n_total").cast("double")
    h = F.lit(12.0) / (n * (n + F.lit(1))) * F.col("_rr") - F.lit(3.0) * (
        n + F.lit(1)
    )
    c = F.lit(1.0) - F.col("_ties") / (n * n * n - n)
    h_c = F.coalesce(F.try_divide(h, c), F.lit(0.0))
    return tot.select(
        "k_groups",
        "n_total",
        F.round(h, round_dp).alias("h_stat"),
        F.round(h_c, round_dp).alias("h_corrected"),
        (F.col("k_groups") - F.lit(1)).cast("long").alias("dof"),
    )


def grid_group_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact per-group median via the distinct-value grid — engine-
    portable by construction.

    Built-in medians interpolate even-count middles as ``lo + (hi-lo)*f``
    vs ``(lo+hi)/2`` depending on the engine, which differs in the last
    ulp and poisons cross-engine hash comparison. Here both engines run
    the IDENTICAL selection: per-(group, value) counts, a running count
    over the per-group value grid, lo = first value whose cumulative
    count reaches floor((n+1)/2), hi = first reaching floor(n/2)+1,
    median = (lo + hi) / 2. The window is partitioned by group and runs
    over distinct values only. Returns (group_col, _med).
    """
    v = F.col(value_col).cast("double")
    grid = df.groupBy(
        F.col(group_col).alias("_g"), v.alias("_v")
    ).agg(F.count("*").alias("_c"))
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("_g")
    cum = grid.select(
        "_g",
        "_v",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    k_lo = F.floor((F.col("_n") + F.lit(1)) / F.lit(2))
    k_hi = F.floor(F.col("_n") / F.lit(2)) + F.lit(1)
    return cum.groupBy(F.col("_g").alias(group_col)).agg(
        (
            (
                F.min(F.when(F.col("_cum") >= k_lo, F.col("_v")))
                + F.min(F.when(F.col("_cum") >= k_hi, F.col("_v")))
            )
            / F.lit(2.0)
        ).alias("_med")
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity: one-way ANOVA on
    the absolute deviations from each group's MEDIAN (the robust Levene
    variant).

    Medians come from :func:`grid_group_median` (engine-portable exact
    selection); the group-median frame is an equi join back to the rows
    (AQE broadcasts the group-cardinality frame), and the deviations
    feed the same two-level moment aggregation as
    :func:`one_way_anova`. Output one row:
    (k_groups, n_total, ss_between, ss_within, f_stat).
    """
    med = grid_group_median(df, group_col, value_col)
    z = df.join(med, group_col).select(
        group_col,
        F.abs(F.col(value_col).cast("double") - F.col("_med")).alias("_z"),
    )
    return one_way_anova(z, group_col, "_z", round_dp)

def theil_sen_slope(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Theil-Sen robust trend per group: the MEDIAN of all pairwise
    slopes (y_j - y_i) / (x_j - x_i) over x_i < x_j — a 29%-breakdown
    alternative to the OLS slope that one outlier month cannot drag.

    The pair generation is a per-group equi self-join (x_i < x_j), so
    the pair count is O(points²) PER GROUP — this operator is for
    per-group SERIES (daily/monthly rollups, bounded points), not raw
    rows; aggregate first. The slope median reuses the engine-portable
    value-grid selection (:func:`grid_group_median`), never a sort of
    all pairs. Output: (group, ts_slope, n_pairs).
    """
    pts = df.select(
        F.col(group_col).alias("_g"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    a = pts.select("_g", F.col("_x").alias("_x1"), F.col("_y").alias("_y1"))
    b = pts.select("_g", F.col("_x").alias("_x2"), F.col("_y").alias("_y2"))
    slopes = (
        a.join(b, "_g")
        .filter(F.col("_x1") < F.col("_x2"))
        .select(
            "_g",
            (
                (F.col("_y2") - F.col("_y1"))
                / (F.col("_x2") - F.col("_x1"))
            ).alias("_s"),
        )
    )
    med = grid_group_median(slopes, "_g", "_s")
    n = slopes.groupBy("_g").agg(F.count("*").alias("n_pairs"))
    return (
        med.join(n, "_g")
        .select(
            F.col("_g").alias(group_col),
            F.round("_med", round_dp).alias("ts_slope"),
            "n_pairs",
        )
    )


def grouped_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Median absolute deviation per group — the robust scale estimate
    (consistency-scaled by 1.4826 to estimate sigma under normality).

    Two passes of the engine-portable grid-median selection: the group
    median, joined back (AQE broadcast of the group-cardinality frame)
    to form |x - med|, then the median of the deviations. Output:
    (group, median, mad, sigma_robust).
    """
    med = grid_group_median(df, group_col, value_col)
    dev = df.join(med, group_col).select(
        group_col,
        F.col("_med"),
        F.abs(F.col(value_col).cast("double") - F.col("_med")).alias("_d"),
    )
    mad = grid_group_median(dev, group_col, "_d").withColumnRenamed(
        "_med", "_mad"
    )
    # join the MAD back to `med` directly: the old
    # ``dev.select(group_col, "_med").distinct()`` is value-identical
    # to `med` by construction (dev is an inner join of df with med on
    # the group key, so the distinct (group, _med) pairs ARE med's
    # rows), but as a PLAN it re-evaluated the whole dev subtree — a
    # second full median selection over df — plus a distinct exchange,
    # just to recover a frame that already existed (guide §2.4).
    return (
        med
        .join(mad, group_col)
        .select(
            group_col,
            F.round("_med", round_dp).alias("median"),
            F.round("_mad", round_dp).alias("mad"),
            F.round(F.col("_mad") * F.lit(1.4826), round_dp).alias(
                "sigma_robust"
            ),
        )
    )

def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Kendall tau-b rank correlation with tie correction, computed
    from the JOINT CELL GRID rather than row pairs.

    Concordant/discordant counts only depend on the contingency of
    distinct (x, y) values: for cells a, b with a.x < b.x, the
    ``n_a * n_b`` row pairs are all concordant (a.y < b.y) or all
    discordant (a.y > b.y). So the plan is one cell-count aggregation,
    then a broadcast inequality self-join over CELLS — O(cells²)
    comparisons, independent of row count. Pre-round/bucket continuous
    columns to bound the grid (same contract as the rank tests).

        tau_b = (C - D) / sqrt((n0 - n1) (n0 - n2)),
        n0 = n(n-1)/2,  n1 = Σ_x t_x(t_x-1)/2,  n2 = Σ_y t_y(t_y-1)/2
    """
    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count("*").alias("_c"))
    a, b = cells.alias("_a"), cells.alias("_b")
    cd = (
        a.join(
            F.broadcast(b),
            (F.col("_a._x") < F.col("_b._x"))
            & (F.col("_a._y") != F.col("_b._y")),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("_a._y") < F.col("_b._y"),
                    F.col("_a._c") * F.col("_b._c"),
                ).otherwise(F.lit(0))
            ).alias("_C"),
            F.sum(
                F.when(
                    F.col("_a._y") > F.col("_b._y"),
                    F.col("_a._c") * F.col("_b._c"),
                ).otherwise(F.lit(0))
            ).alias("_D"),
        )
    )
    tx = cells.groupBy("_x").agg(F.sum("_c").alias("_t")).agg(
        F.sum(F.col("_t") * (F.col("_t") - F.lit(1)) / F.lit(2)).alias("_n1"),
        F.sum("_t").alias("_n"),
    )
    ty = cells.groupBy("_y").agg(F.sum("_c").alias("_t")).agg(
        F.sum(F.col("_t") * (F.col("_t") - F.lit(1)) / F.lit(2)).alias("_n2")
    )
    j = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    # An empty cell-pair join (e.g. a constant x column) leaves the
    # C/D sums NULL and the tau denominator 0 — pin both to exact 0.
    c_ = F.coalesce(F.col("_C"), F.lit(0))
    d_ = F.coalesce(F.col("_D"), F.lit(0))
    n = F.col("_n").cast("double")
    n0 = n * (n - F.lit(1)) / F.lit(2.0)
    tau = F.coalesce(
        F.try_divide(
            (c_ - d_).cast("double"),
            F.sqrt((n0 - F.col("_n1")) * (n0 - F.col("_n2"))),
        ),
        F.lit(0.0),
    )
    return j.select(
        F.col("_n").cast("long").alias("n_rows"),
        c_.cast("long").alias("concordant"),
        d_.cast("long").alias("discordant"),
        F.round(tau, round_dp).alias("tau_b"),
    )


def grouped_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Higher-moment profile per group — mean, population variance,
    skewness g1 and excess kurtosis g2 — from raw power sums in ONE
    hash aggregation (fully map-side combinable; the central-moment
    algebra is closed-form column arithmetic the oracle restates in
    the identical association order).
    """
    v = F.col(value_col).cast("double")
    per = df.groupBy(group_col).agg(
        F.count(v).alias("n_rows"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
        F.sum(v * v * v).alias("_s3"),
        F.sum(v * v * v * v).alias("_s4"),
    )
    n = F.col("n_rows").cast("double")
    mean = F.col("_s1") / n
    m2 = F.col("_s2") / n - mean * mean
    m3 = F.col("_s3") / n - F.lit(3.0) * mean * (F.col("_s2") / n) \
        + F.lit(2.0) * mean * mean * mean
    m4 = F.col("_s4") / n - F.lit(4.0) * mean * (F.col("_s3") / n) \
        + F.lit(6.0) * mean * mean * (F.col("_s2") / n) \
        - F.lit(3.0) * mean * mean * mean * mean
    skew = F.coalesce(F.try_divide(m3, F.sqrt(m2 * m2 * m2)), F.lit(0.0))
    kurt = F.coalesce(F.try_divide(m4, m2 * m2), F.lit(0.0)) - F.lit(3.0)
    return per.select(
        group_col,
        "n_rows",
        F.round(mean, round_dp).alias("mean"),
        F.round(m2, round_dp).alias("var_pop"),
        F.round(skew, round_dp).alias("skewness"),
        F.round(kurt, round_dp).alias("kurtosis_excess"),
    )


def roc_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """ROC curve points (threshold, tpr, fpr) at every distinct score,
    descending — predict positive when ``score >= threshold``.

    The curve is a pure function of the per-distinct-score (positives,
    negatives) counts: cumulative sums DOWN the score grid give TP and
    FP at each threshold. Window input is bounded by score cardinality
    (pre-round continuous scores), never the row count.
    """
    lab = F.col(label_col).cast("int")
    per = df.groupBy(
        F.col(score_col).cast("double").alias("threshold")
    ).agg(
        F.sum(lab).alias("_p"),
        F.sum(F.lit(1) - lab).alias("_n"),
    )
    w = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "threshold",
        F.round(
            F.coalesce(
                F.try_divide(F.sum("_p").over(w), F.sum("_p").over(w_all)),
                F.lit(0.0),
            ),
            round_dp,
        ).alias("tpr"),
        F.round(
            F.coalesce(
                F.try_divide(F.sum("_n").over(w), F.sum("_n").over(w_all)),
                F.lit(0.0),
            ),
            round_dp,
        ).alias("fpr"),
    )

def theil_decomposition(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Theil-T inequality index decomposed by group — the additive
    property that makes Theil (unlike Gini) the inequality measure for
    drill-downs: total = Σ_g share_g·T_g (within) + Σ_g share_g·ln(μ_g/μ)
    (between).

    One per-group aggregation of (n, Σx, Σ x·ln x) — all combinable —
    plus a 1-row global frame cross-joined back; every index is then
    closed-form column arithmetic:

        T_g = Σ_g(x ln x) / (n_g μ_g) - ln μ_g

    Values must be positive (log of the value). Output one row per
    group: (group, n_rows, mean, income_share, theil_within,
    between_term).
    """
    v = F.col(value_col).cast("double")
    per = df.filter(v > 0).groupBy(group_col).agg(
        F.count(v).alias("n_rows"),
        F.sum(v).alias("_s"),
        F.sum(v * F.log(v)).alias("_sl"),
    )
    tot = per.agg(
        F.sum("n_rows").alias("_tot_n"), F.sum("_s").alias("_tot_s")
    )
    j = per.crossJoin(F.broadcast(tot))
    mu_g = F.col("_s") / F.col("n_rows")
    mu = F.col("_tot_s") / F.col("_tot_n")
    share = F.col("_s") / F.col("_tot_s")
    t_g = F.col("_sl") / F.col("_s") - F.log(mu_g)
    return j.select(
        group_col,
        "n_rows",
        F.round(mu_g, round_dp).alias("mean"),
        F.round(share, round_dp).alias("income_share"),
        F.round(t_g, round_dp).alias("theil_within"),
        F.round(share * F.log(mu_g / mu), round_dp).alias("between_term"),
    )


def pythagorean_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Arithmetic, geometric, and harmonic means per group in one
    combinable aggregation (Σx, Σ ln x, Σ 1/x over positive values).
    AM >= GM >= HM always; the GM/AM ratio is a scale-free evenness
    signal (1 = perfectly even).
    """
    v = F.col(value_col).cast("double")
    per = df.filter(v > 0).groupBy(group_col).agg(
        F.count(v).alias("n_rows"),
        F.sum(v).alias("_s"),
        F.sum(F.log(v)).alias("_sl"),
        F.sum(F.lit(1.0) / v).alias("_si"),
    )
    n = F.col("n_rows").cast("double")
    return per.select(
        group_col,
        "n_rows",
        F.round(F.col("_s") / n, round_dp).alias("mean_arith"),
        F.round(F.exp(F.col("_sl") / n), round_dp).alias("mean_geom"),
        F.round(n / F.col("_si"), round_dp).alias("mean_harm"),
    )

def pairwise_mean_contrasts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """All pairwise group-mean contrasts with Welch standard errors —
    the post-hoc table read after an ANOVA rejects (which pairs
    actually differ?).

    One per-group moment aggregation, then an inequality self-join
    over the GROUP frame (k groups -> k(k-1)/2 rows — group
    cardinality, never rows). Each row: mean difference, Welch SE,
    z = diff/se, and the A&S normal two-sided p. Pair identity is
    canonical (group_a < group_b) so output is layout-independent.
    """
    v = F.col(value_col).cast("double")
    per = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(v).alias("_n"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
    ).select(
        "_g",
        "_n",
        (F.col("_s1") / F.col("_n")).alias("_mean"),
        F.greatest(
            F.lit(0.0),
            F.try_divide(
                F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n"),
                F.col("_n") - F.lit(1),
            ),
        ).alias("_var"),
    )
    a = per.select(
        F.col("_g").alias("group_a"), F.col("_n").alias("_na"),
        F.col("_mean").alias("_ma"), F.col("_var").alias("_va"),
    )
    b = per.select(
        F.col("_g").alias("group_b"), F.col("_n").alias("_nb"),
        F.col("_mean").alias("_mb"), F.col("_var").alias("_vb"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    se = F.sqrt(
        F.col("_va") / F.col("_na") + F.col("_vb") / F.col("_nb")
    )
    diff = F.col("_ma") - F.col("_mb")
    z = F.coalesce(F.try_divide(diff, se), F.lit(0.0))
    return pairs.select(
        "group_a",
        "group_b",
        F.round(diff, round_dp).alias("mean_diff"),
        F.round(se, round_dp).alias("welch_se"),
        F.round(z, round_dp).alias("z_stat"),
        F.round(norm_sf_2sided(z), round_dp).alias("p_normal"),
    )

def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Difference-in-differences estimator over a 2x2 (treatment x
    period) design: DiD = (T_post - T_pre) - (C_post - C_pre), with
    the pooled standard error from the four cell variances.

    ONE conditional-sum aggregation produces all four cells' (n, Σx,
    Σx²); everything after is closed-form arithmetic on a 1-row frame.
    Output: the four cell means, the DiD estimate, its SE, and z.
    """
    t = F.col(treat_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    x = F.col(value_col).cast("double")

    def cell(tag, cond):
        z = F.lit(0.0)
        return [
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(f"_n{tag}"),
            F.sum(F.when(cond, x).otherwise(z)).alias(f"_s{tag}"),
            F.sum(F.when(cond, x * x).otherwise(z)).alias(f"_q{tag}"),
        ]

    agg = df.agg(
        *cell("tp", t & p), *cell("t0", t & ~p),
        *cell("cp", ~t & p), *cell("c0", ~t & ~p),
    )

    def mean(tag):
        return F.col(f"_s{tag}") / F.col(f"_n{tag}")

    def var_over_n(tag):
        n = F.col(f"_n{tag}")
        v = F.greatest(
            F.lit(0.0),
            F.try_divide(
                F.col(f"_q{tag}") - F.col(f"_s{tag}") * F.col(f"_s{tag}") / n,
                n - F.lit(1),
            ),
        )
        return v / n

    did = (mean("tp") - mean("t0")) - (mean("cp") - mean("c0"))
    se = F.sqrt(
        var_over_n("tp") + var_over_n("t0")
        + var_over_n("cp") + var_over_n("c0")
    )
    z = F.coalesce(F.try_divide(did, se), F.lit(0.0))
    return agg.select(
        F.round(mean("t0"), round_dp).alias("treat_pre"),
        F.round(mean("tp"), round_dp).alias("treat_post"),
        F.round(mean("c0"), round_dp).alias("control_pre"),
        F.round(mean("cp"), round_dp).alias("control_post"),
        F.round(did, round_dp).alias("did_estimate"),
        F.round(se, round_dp).alias("did_se"),
        F.round(z, round_dp).alias("z_stat"),
    )



def cuped_adjusted(
    units: DataFrame,
    arm_col: str,
    pre_col: str,
    post_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    unit's experiment-period metric by its pre-period covariate,
    ``adj = post - theta (pre - mean_pre)`` with
    ``theta = cov(pre, post) / var(pre)`` — same means, (much) tighter
    confidence intervals.

    One GLOBAL moment aggregation gives theta (1-row broadcast); the
    per-arm adjusted mean and variance then come from per-arm moments
    (incl. the Σ pre·post cross term) by pure algebra — the rows are
    never revisited with the adjusted value materialized. Output one
    row per arm: n, mean_post, mean_adjusted, var_post, var_adjusted,
    var_reduction_pct.
    """
    pre = F.col(pre_col).cast("double")
    post = F.col(post_col).cast("double")
    glob = units.agg(
        F.count("*").alias("_gn"),
        F.sum(pre).alias("_gx"),
        F.sum(post).alias("_gy"),
        F.sum(pre * post).alias("_gxy"),
        F.sum(pre * pre).alias("_gxx"),
    )
    gn = F.col("_gn").cast("double")
    cov = F.col("_gxy") - F.col("_gx") * F.col("_gy") / gn
    vx = F.col("_gxx") - F.col("_gx") * F.col("_gx") / gn
    theta = F.coalesce(F.try_divide(cov, vx), F.lit(0.0))
    mean_pre = F.col("_gx") / gn
    g = glob.select(
        theta.alias("_theta"), mean_pre.alias("_mpre")
    )
    per = units.groupBy(arm_col).agg(
        F.count("*").alias("n_units"),
        F.sum(pre).alias("_x"),
        F.sum(post).alias("_y"),
        F.sum(pre * post).alias("_xy"),
        F.sum(pre * pre).alias("_xx"),
        F.sum(post * post).alias("_yy"),
    ).crossJoin(F.broadcast(g))
    n = F.col("n_units").cast("double")
    my = F.col("_y") / n
    mx = F.col("_x") / n
    th = F.col("_theta")
    # adjusted mean: my - theta (mx - mean_pre)
    madj = my - th * (mx - F.col("_mpre"))
    # per-arm central second moments
    vy = F.col("_yy") / n - my * my
    vxa = F.col("_xx") / n - mx * mx
    cxy = F.col("_xy") / n - mx * my
    vadj = vy + th * th * vxa - F.lit(2.0) * th * cxy
    red = F.coalesce(
        F.lit(1.0) - F.try_divide(vadj, vy), F.lit(0.0)
    ) * F.lit(100.0)
    return per.select(
        arm_col,
        "n_units",
        F.round(my, round_dp).alias("mean_post"),
        F.round(madj, round_dp).alias("mean_adjusted"),
        F.round(vy, round_dp).alias("var_post"),
        F.round(vadj, round_dp).alias("var_adjusted"),
        F.round(red, round_dp).alias("var_reduction_pct"),
    )


def proportion_power(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a,
    group_b,
    z_alpha: float = 1.959964,
    z_power: float = 0.841621,
    round_dp: int = 6,
) -> DataFrame:
    """Required sample size per arm to re-detect the OBSERVED
    two-proportion difference at alpha=5% / power=80% (classic normal-
    approximation formula) — the "how long must this experiment run"
    calculator, computed from the live rates.

        n = (z_a sqrt(2 pbar qbar) + z_b sqrt(p1 q1 + p2 q2))² / (p1-p2)²

    One conditional aggregation; the formula is 1-row arithmetic.
    """
    s = F.col(success_col).cast("int")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    agg = df.agg(
        F.sum(F.when(in_a, F.lit(1)).otherwise(F.lit(0))).alias("_na"),
        F.sum(F.when(in_a, s).otherwise(F.lit(0))).alias("_sa"),
        F.sum(F.when(in_b, F.lit(1)).otherwise(F.lit(0))).alias("_nb"),
        F.sum(F.when(in_b, s).otherwise(F.lit(0))).alias("_sb"),
    )
    p1 = F.col("_sa").cast("double") / F.col("_na")
    p2 = F.col("_sb").cast("double") / F.col("_nb")
    pbar = (F.col("_sa") + F.col("_sb")).cast("double") / (
        F.col("_na") + F.col("_nb")
    )
    num = (
        F.lit(z_alpha) * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar))
        + F.lit(z_power)
        * F.sqrt(p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2))
    )
    diff = p1 - p2
    n_req = F.ceil(
        F.round(
            F.coalesce(F.try_divide(num * num, diff * diff), F.lit(0.0)),
            round_dp,
        )
    )
    # Rates/diff are RATIONALS (c/n) — emitted as half-up e6 integers
    # (a 6-dp rounding of a rational can land on a midpoint and diverge
    # across engine builds); n_required keeps the irrational formula
    # (sqrt terms make its rounding digit noise).
    d_num = F.expr("_sa * _nb - _sb * _na")
    return agg.select(
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        # decimal(38,0) guards like the diff below: plain-BIGINT
        # _sa*1000000*2 overflows at ~4.6e12 successes
        F.expr(
            "(cast(_sa as decimal(38,0)) * 1000000 * 2 + _na)"
            " div (2 * _na)"
        ).cast("long").alias("rate_a_e6"),
        F.expr(
            "(cast(_sb as decimal(38,0)) * 1000000 * 2 + _nb)"
            " div (2 * _nb)"
        ).cast("long").alias("rate_b_e6"),
        (
            F.when(d_num < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "(abs(cast(_sa as decimal(38,0)) * _nb"
                " - cast(_sb as decimal(38,0)) * _na) * 1000000 * 2"
                " + cast(_na as decimal(38,0)) * _nb)"
                " div (2 * cast(_na as decimal(38,0)) * _nb)"
            ).cast("long")
        ).cast("long").alias("observed_diff_e6"),
        n_req.cast("long").alias("n_required_per_arm"),
    )

def yuen_trimmed_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    trim: float = 0.2,
    round_dp: int = 6,
    int_scale: int | None = None,
) -> DataFrame:
    """Yuen's trimmed-mean t-test (Yuen 1974): compare 20%-trimmed
    means with winsorized variances — robust where Welch's t is
    dragged by heavy tails.

    The order statistics never sort rows: everything reduces to the
    per-group DISTINCT-VALUE GRID with cumulative counts. The trimmed
    window (ranks g+1 .. n-g, g = floor(trim·n)) intersects each grid
    value's rank interval, so trimmed/winsorized sums are overlap-
    weighted grid aggregations; the winsorizing boundary values are
    two grid selections (first value reaching rank g+1 / rank n-g).

        t = (mt_a - mt_b) / sqrt(d_a + d_b),
        d = (n-1)·s²_win / (h·(h-1)),  h = n - 2g

    ``int_scale`` (e.g. 100 for 2dp money) switches to the exact
    fixed-point form: values become BIGINT units (cents), all trimmed
    and winsorized sums are exact integers (no partition-order float
    noise), the trimmed means are emitted as exact scaled integers
    ``tmean_{a,b}_e6`` (value·1e6, integer division — never a rounded
    terminating-decimal quotient, which straddles midpoints across
    engines), and t (scale-invariant) is computed from the exact
    integer sums. ``int_scale`` must divide 1_000_000.
    """
    if int_scale is not None and 1_000_000 % int_scale != 0:
        raise ValueError("int_scale must divide 1_000_000")
    if int_scale is not None:
        v = F.round(F.col(value_col).cast("double") * int_scale).cast(
            "long"
        )
    else:
        v = F.col(value_col).cast("double")
    two = df.filter(F.col(group_col).isin([group_a, group_b]))
    grid = two.groupBy(
        F.col(group_col).alias("_g"), v.alias("_v")
    ).agg(F.count("*").alias("_c"))
    w_prev = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("_g")
    cum = grid.select(
        "_g",
        "_v",
        "_c",
        F.coalesce(F.sum("_c").over(w_prev), F.lit(0)).alias("_cb"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    g_cnt = F.floor(F.lit(float(trim)) * F.col("_n"))
    lo_rank = g_cnt + F.lit(1)
    hi_rank = F.col("_n") - g_cnt
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_cb") + F.col("_c"), hi_rank)
        - F.greatest(F.col("_cb"), lo_rank - F.lit(1)),
    )
    per = cum.groupBy("_g").agg(
        F.max("_n").alias("_n_rows"),
        F.max(g_cnt).alias("_trim_g"),
        F.sum(F.col("_v") * overlap).alias("_st"),
        F.sum(F.col("_v") * F.col("_v") * overlap).alias("_sst"),
        F.min(
            F.when(F.col("_cb") + F.col("_c") >= lo_rank, F.col("_v"))
        ).alias("_lo"),
        F.min(
            F.when(F.col("_cb") + F.col("_c") >= hi_rank, F.col("_v"))
        ).alias("_hi"),
    )
    n = F.col("_n_rows").cast("double")
    if int_scale is not None:
        # exact integer winsorized sums (BIGINT), doubles only in the
        # final scalar arithmetic — deterministic op order both engines
        gl = F.col("_trim_g")
        h_long = F.col("_n_rows") - F.lit(2) * gl
        h = h_long.cast("double")
        win_sum = (
            F.col("_st") + gl * F.col("_lo") + gl * F.col("_hi")
        ).cast("double")
        win_ss = (
            F.col("_sst")
            + gl * F.col("_lo") * F.col("_lo")
            + gl * F.col("_hi") * F.col("_hi")
        ).cast("double")
        tmean = F.col("_st").cast("double") / h
    else:
        gd = F.col("_trim_g").cast("double")
        h = n - F.lit(2.0) * gd
        win_sum = F.col("_st") + gd * F.col("_lo") + gd * F.col("_hi")
        win_ss = (
            F.col("_sst")
            + gd * F.col("_lo") * F.col("_lo")
            + gd * F.col("_hi") * F.col("_hi")
        )
        tmean = F.col("_st") / h
    s2w = F.greatest(
        F.lit(0.0),
        F.try_divide(win_ss - win_sum * win_sum / n, n - F.lit(1)),
    )
    stats = per.select(
        "_g",
        F.col("_n_rows"),
        F.col("_st"),
        h.alias("_h"),
        tmean.alias("_tmean"),
        F.try_divide(
            (n - F.lit(1)) * s2w, F.col("_h") * (F.col("_h") - F.lit(1))
        ).alias("_d"),
    )
    a = stats.filter(F.col("_g") == group_a).select(
        F.col("_n_rows").alias("n_a"), F.col("_h").alias("h_a"),
        F.col("_st").alias("_sta"),
        F.col("_tmean").alias("_ma"), F.col("_d").alias("_da"),
    )
    b = stats.filter(F.col("_g") == group_b).select(
        F.col("_n_rows").alias("n_b"), F.col("_h").alias("h_b"),
        F.col("_st").alias("_stb"),
        F.col("_tmean").alias("_mb"), F.col("_d").alias("_db"),
    )
    j = a.crossJoin(b)
    t = F.coalesce(
        F.try_divide(
            F.col("_ma") - F.col("_mb"),
            F.sqrt(F.col("_da") + F.col("_db")),
        ),
        F.lit(0.0),
    )
    if int_scale is not None:
        # trimmed means as EXACT scaled integers (value·1e6): integer
        # division of the exact trimmed cent-sum — no double rounding
        mul = 1_000_000 // int_scale
        return j.select(
            "n_a",
            "n_b",
            F.col("h_a").cast("long").alias("h_a"),
            F.col("h_b").cast("long").alias("h_b"),
            F.expr(f"(_sta * {mul}) div cast(h_a as bigint)").alias(
                "tmean_a_e6"
            ),
            F.expr(f"(_stb * {mul}) div cast(h_b as bigint)").alias(
                "tmean_b_e6"
            ),
            F.round(t, round_dp).alias("t_stat"),
            F.round(norm_sf_2sided(t), round_dp).alias("p_normal"),
        )
    return j.select(
        "n_a",
        "n_b",
        F.col("h_a").cast("long").alias("h_a"),
        F.col("h_b").cast("long").alias("h_b"),
        F.round("_ma", round_dp).alias("tmean_a"),
        F.round("_mb", round_dp).alias("tmean_b"),
        F.round(t, round_dp).alias("t_stat"),
        F.round(norm_sf_2sided(t), round_dp).alias("p_normal"),
    )


def conformal_interval(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.1,
    int_scale: int = 100,
) -> DataFrame:
    """Split-conformal prediction interval per group (Vovk et al.;
    Lei et al. 2018, the "split conformal" construction): rows are
    deterministically split by md5 parity of their id into a
    CALIBRATION and a TEST half; the point predictor is the
    calibration mean, the conformal radius q_hat is the
    ``ceil((n_cal+1)(1-alpha))``-th smallest absolute calibration
    residual, and the reported coverage is the fraction of TEST rows
    inside mean ± q_hat — finite-sample-valid regardless of the value
    distribution, the property that makes conformal the default
    uncertainty wrapper for black-box models.

    Everything is EXACT integer arithmetic (the OHLC/RFM device):
    values become ``int_scale`` units, residuals are scaled by n_cal
    (|v·n_cal − Σcal| — exact BIGINTs, no division), the order
    statistic comes from the per-group DISTINCT-VALUE GRID with
    cumulative counts (no per-group buffering, no sort of raw rows),
    and coverage/radius are emitted as exact integers:
    (group, n_cal, n_test, k_rank, q_num, n_covered) with
    q_hat = q_num / (int_scale·n_cal) implied. One shuffle per
    aggregation; the per-group frames ride broadcast joins.
    """
    vu = F.round(F.col(value_col).cast("double") * int_scale).cast(
        "long"
    )
    parity = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
            16,
            10,
        ).cast("long")
        % 2
    )
    base = df.select(
        F.col(group_col).alias("_g"),
        vu.alias("_v"),
        (parity == 0).alias("_cal"),
    )
    cal_stats = (
        base.filter("_cal")
        .groupBy("_g")
        .agg(F.sum("_v").alias("_sum"), F.count("*").alias("n_cal"))
    )
    dev = base.join(F.broadcast(cal_stats), "_g").select(
        "_g",
        "_cal",
        "n_cal",
        F.abs(F.col("_v") * F.col("n_cal") - F.col("_sum")).alias("_r"),
    )
    # conformal rank: k = min(n_cal, ceil((n_cal+1)(1-alpha))) —
    # integer arithmetic: ceil(m·(1-alpha)) with alpha = a/1000
    a_num = int(round(alpha * 1000))
    k = F.least(
        F.col("n_cal"),
        F.expr(
            f"cast(((n_cal + 1) * {1000 - a_num} + 999) div 1000"
            " as bigint)"
        ),
    )
    grid = (
        dev.filter("_cal")
        .groupBy("_g", "_r")
        .agg(F.count("*").alias("_c"), F.max(k).alias("_k"))
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    q = (
        grid.withColumn("_cum", F.sum("_c").over(w_cum))
        .filter(F.col("_cum") >= F.col("_k"))
        .groupBy("_g")
        .agg(F.min("_r").alias("q_num"), F.max("_k").alias("k_rank"))
    )
    test = dev.filter(~F.col("_cal")).join(F.broadcast(q), "_g")
    return (
        test.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count("*").alias("n_test"),
            F.max("k_rank").alias("k_rank"),
            F.max("q_num").alias("q_num"),
            F.sum(
                (F.col("_r") <= F.col("q_num")).cast("long")
            ).alias("n_covered"),
        )
    )


def mann_kendall_trend(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    int_scale: int = 100,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per group (Mann 1945; Kendall
    1975) over the DAILY aggregate series — "is this metric drifting"
    without assuming linearity or a distribution.

        S = Σ_{i<j} sign(y_j − y_i)   over the time-ordered series
        var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie groups)

    The pair sum runs on the per-group DAILY GRID (calendar-bounded —
    ≤ |days| rows per group), so the i<j self-join is grid×grid, never
    row-scaled; ties are counted from the grid's value multiplicities.
    Values are exact integer units (2dp → cents), so S, the tie term,
    and n are EXACT BIGINTs; the only double is the final z =
    (S ∓ 1)/sqrt(var) (continuity-corrected), whose rounding digit is
    irrational-noise (sqrt), not a decimal midpoint. Output:
    (group, n_days, s_stat, tie_term, z, p_normal).
    """
    daily = df.groupBy(
        F.col(group_col).alias("_g"), F.to_date(F.col(ts_col)).alias("_d")
    ).agg(
        F.sum(
            F.round(F.col(value_col).cast("double") * int_scale).cast(
                "long"
            )
        ).alias("_y")
    )
    a = daily.select("_g", F.col("_d").alias("_da"), F.col("_y").alias("_ya"))
    b = daily.select("_g", F.col("_d").alias("_db"), F.col("_y").alias("_yb"))
    s = (
        a.join(b, "_g")
        .filter(F.col("_da") < F.col("_db"))
        .groupBy("_g")
        .agg(
            F.sum(
                F.signum(
                    (F.col("_yb") - F.col("_ya")).cast("double")
                ).cast("long")
            ).alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("_g", "_y")
        .agg(F.count("*").alias("_t"))
        .groupBy("_g")
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("tie_term"),
            F.sum("_t").alias("n_days"),
        )
    )
    j = s.join(ties, "_g")
    n = F.col("n_days").cast("double")
    var = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    z = F.when(
        F.col("s_stat") > 0,
        (F.col("s_stat").cast("double") - 1) / F.sqrt(var),
    ).when(
        F.col("s_stat") < 0,
        (F.col("s_stat").cast("double") + 1) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("_g").alias(group_col),
        "n_days",
        "s_stat",
        "tie_term",
        F.round(z, 6).alias("z"),
        F.round(norm_sf_2sided(z), 6).alias("p_normal"),
    )


def stratified_ate(
    df: DataFrame,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
    int_scale: int = 100,
) -> DataFrame:
    """Stratified average-treatment-effect table (the workhorse of
    observational A/B reads): within each stratum of a confounder,
    compare treated vs control outcome means; the stratum table is what
    a weighted ATE, a Cochran-Mantel-Haenszel read, or a balance audit
    consumes. One conditional hash aggregation per stratum — a frame of
    |strata| rows, never a re-scan per arm.

    Exact fixed-point outputs: per-stratum counts and cent-sums are
    BIGINTs, and the treated−control mean difference is the exact
    half-up integer ``diff_e4`` (outcome·1e4), computed as a
    sign-split integer division — cross-engine-safe where a rounded
    float quotient of terminating decimals is not. Strata missing an
    arm are dropped (no defined contrast).
    """
    y = F.round(F.col(outcome_col).cast("double") * int_scale).cast(
        "long"
    )
    t = F.col(treat_col).cast("boolean")
    per = (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.sum(t.cast("long")).alias("n_t"),
            F.sum((~t).cast("long")).alias("n_c"),
            F.sum(F.when(t, y).otherwise(F.lit(0))).alias("sum_t_units"),
            F.sum(F.when(~t, y).otherwise(F.lit(0))).alias(
                "sum_c_units"
            ),
        )
        .filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    )
    num = (
        F.col("sum_t_units") * F.col("n_c")
        - F.col("sum_c_units") * F.col("n_t")
    )
    return per.select(
        "stratum",
        "n_t",
        "n_c",
        "sum_t_units",
        "sum_c_units",
        # DECIMAL(38,0) intermediates: sum·count cross-products overflow
        # BIGINT once stratum unit-sums reach ~1e14·1e5; decimal holds
        # to 1e38 and the e4 ratio casts back exactly.
        (
            F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "((abs(cast(sum_t_units as decimal(38,0)) * n_c"
                " - cast(sum_c_units as decimal(38,0)) * n_t) * 100 * 2"
                " + n_t * n_c) div (2 * n_t * n_c))"
            )
        ).cast("long").alias("diff_e4"),
    )


def srm_check(
    df: DataFrame,
    unit_col: str,
    arm_col,
    n_arms: int,
) -> DataFrame:
    """Sample-ratio-mismatch guardrail for an equal-allocation
    experiment: compare per-arm UNIT counts against the uniform
    expectation with the chi-square goodness-of-fit statistic — the
    first thing to check before reading any A/B result (a biased
    assignment invalidates everything downstream).

    One distinct-unit aggregation + one |arms|-row combine. With
    ``e = n/k``, ``χ² = Σ(o−e)²/e = Σ(k·o−n)² / (k·n)`` — the exact
    integer numerator ``Σ(k·o−n)²`` and denominator ``k·n`` are
    emitted as BIGINTs alongside the half-up scaled statistic
    ``chi2_e6`` (χ²·1e6 by integer division), so no engine ever rounds
    a rational on a midpoint. Output: one row
    (n_units, n_arms, min_arm, max_arm, chi2_num, chi2_den, chi2_e6).
    """
    units = df.select(
        F.col(unit_col).alias("_u"),
        (arm_col if not isinstance(arm_col, str) else F.col(arm_col))
        .cast("long")
        .alias("_a"),
    ).distinct()
    per = units.groupBy("_a").agg(F.count("*").alias("_o"))
    tot = per.agg(
        F.sum("_o").alias("n_units"),
        F.count("*").alias("k_obs"),
        F.min("_o").alias("min_arm"),
        F.max("_o").alias("max_arm"),
        # DECIMAL(38,0) intermediate: (k·o)² overflows BIGINT once an
        # arm holds ~2.3e9/k units; decimal holds to 1e38 (n ≤ ~1e17).
        F.sum(
            (F.lit(n_arms) * F.col("_o").cast("decimal(38,0)"))
            * (F.lit(n_arms) * F.col("_o"))
        ).alias("_skoo"),
    )
    # Σ over ALL k arms of (k·o−n)² telescopes to k²Σo² − k·n² via
    # Σo = n — and the identity survives empty arms (a missing arm's
    # (0−n)² is exactly the term the expansion re-adds).
    pre = tot.select(
        "n_units",
        F.lit(n_arms).alias("n_arms"),
        "min_arm",
        "max_arm",
        (
            F.col("_skoo")
            - F.lit(n_arms)
            * F.col("n_units").cast("decimal(38,0)")
            * F.col("n_units")
        ).alias("_num_dec"),
        (F.lit(n_arms) * F.col("n_units")).alias("chi2_den"),
    )
    # Outputs stay BIGINT (|chi2_num| fits to ~9.2e18 — holds for any
    # n ≤ 1e14 with χ² ≤ 1e4; only a pathologically total imbalance at
    # n > ~9e8 would exceed it); the arithmetic above runs in
    # DECIMAL(38,0) so no intermediate wraps on the way there.
    return pre.select(
        "n_units",
        "n_arms",
        "min_arm",
        "max_arm",
        F.col("_num_dec").cast("long").alias("chi2_num"),
        "chi2_den",
        F.expr(
            "cast((_num_dec * 1000000 * 2 + chi2_den) div (2 * chi2_den)"
            " as bigint)"
        ).alias("chi2_e6"),
    )


def mcnemar_test(
    df: DataFrame,
    unit_col: str,
    flag_a: Column,
    flag_b: Column,
) -> DataFrame:
    """McNemar's test for paired binary outcomes on the SAME units —
    "did the same users who do A also do B?" (conversion funnel change,
    before/after feature exposure). Only the DISCORDANT pairs carry
    information: with b01 = units with A but not B and b10 = the
    reverse, χ² = (b01 − b10)² / (b01 + b10).

    One distinct-unit aggregation (per-unit flag OR — combinable), one
    1-row combine. The statistic is emitted as the half-up integer
    ``chi2_e6`` computed in DECIMAL(38,0) (the squared difference wraps
    BIGINT past ~3e9 discordant units), with the exact integer counts
    beside it; no float is ever rounded. Zero discordant pairs yield a
    NULL statistic rather than a divide-by-zero (ANSI-safe).
    """
    per = df.groupBy(F.col(unit_col).alias("_u")).agg(
        F.coalesce(F.max(flag_a.cast("int")), F.lit(0)).alias("_a"),
        F.coalesce(F.max(flag_b.cast("int")), F.lit(0)).alias("_b"),
    )
    tot = per.agg(
        F.count("*").alias("n_units"),
        F.sum(((F.col("_a") == 1) & (F.col("_b") == 0)).cast("long")).alias(
            "b01"
        ),
        F.sum(((F.col("_a") == 0) & (F.col("_b") == 1)).cast("long")).alias(
            "b10"
        ),
    )
    return tot.select(
        "n_units",
        "b01",
        "b10",
        F.when(
            F.col("b01") + F.col("b10") > 0,
            F.expr(
                "cast(((b01 - b10) * cast((b01 - b10) as decimal(38,0))"
                " * 1000000 * 2 + (b01 + b10)) div (2 * (b01 + b10))"
                " as bigint)"
            ),
        ).alias("chi2_e6"),
    )


def cramers_v(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    normalized chi-square (0 = independent, 1 = perfectly associated)
    every feature-vs-label screen runs before modeling.

    One (x, y)-keyed count (hash shuffle, combinable), then the margins
    reduce from the CELL table (category-product-sized, never
    row-scaled) and broadcast back. χ² = Σ (n·n_ij − r_i·c_j)² /
    (n·r_i·c_j): each cell term is a DECIMAL(38,0) integer division at
    e6 scale — identical integer arithmetic in any engine — and
    ``chi2_e6`` is their exact integer sum. V itself follows through
    IEEE-exact ops only (one divide chain + sqrt, both correctly
    rounded by spec), so the 6dp rounding digit is noise, not a
    midpoint.
    """
    cells = df.groupBy(
        F.col(col_x).alias("_x"), F.col(col_y).alias("_y")
    ).agg(F.count("*").alias("_obs"))
    rm = cells.groupBy("_x").agg(F.sum("_obs").alias("_ri"))
    cm = cells.groupBy("_y").agg(F.sum("_obs").alias("_cj"))
    tot = cells.agg(
        F.sum("_obs").alias("_n"),
        F.count_distinct("_x").alias("_r"),
        F.count_distinct("_y").alias("_c"),
    )
    # χ² sums over the FULL r×c grid — an unobserved cell still
    # contributes (0 − E)²/E. The grid is the margin cross-join
    # (category-product-sized, tiny) with observed counts left-joined.
    grid = (
        rm.crossJoin(cm)
        .join(cells, ["_x", "_y"], "left")
        .withColumn("_nij", F.coalesce(F.col("_obs"), F.lit(0)))
    )
    term = F.expr(
        "cast(((cast(_n as decimal(38,0)) * _nij - cast(_ri as"
        " decimal(38,0)) * _cj) * (cast(_n as decimal(38,0)) * _nij"
        " - cast(_ri as decimal(38,0)) * _cj) * 1000000)"
        " div (cast(_n as decimal(38,0)) * _ri * _cj) as bigint)"
    )
    agg = (
        grid.join(F.broadcast(tot))
        .agg(
            F.max("_n").alias("n"),
            F.max("_r").alias("n_x_cats"),
            F.max("_c").alias("n_y_cats"),
            F.sum(term).alias("chi2_e6"),
        )
    )
    v = F.sqrt(
        (F.col("chi2_e6").cast("double") / F.lit(1000000.0))
        / (
            F.col("n").cast("double")
            * F.least(F.col("n_x_cats") - 1, F.col("n_y_cats") - 1).cast(
                "double"
            )
        )
    )
    return agg.select(
        "n",
        "n_x_cats",
        "n_y_cats",
        "chi2_e6",
        F.round(v, 6).alias("cramers_v"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
    min_raters: int = 2,
) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement when MANY raters
    assign items to categories (label-quality audits of crowdsourced or
    multi-model annotations) — the multi-rater generalization of
    Cohen's kappa, in the variable-raters-per-item form: per-item
    agreement P_i = Σ_j n_ij(n_ij−1) / (n_i(n_i−1)), chance agreement
    P_e = Σ_j p_j², κ = (P̄ − P_e)/(1 − P_e).

    Plan: one (item, category)-keyed count, one item-keyed combine
    (both hash-shuffled, combinable), then 1-row scalars. Every ratio
    is a half-up integer at e6 scale computed with DECIMAL(38,0)
    intermediates (Σ C_j² wraps BIGINT past ~3e9 ratings/category);
    the final κ keeps its sign via an explicit sign factor so the
    integer division is always on non-negative operands (floor-vs-
    truncate divergence between engines never engages).

    Output: (n_items, n_ratings, pbar_e6, pe_e6, kappa_e6) — exact
    integers.
    """
    cell = df.groupBy(
        F.col(item_col).alias("_i"), F.col(category_col).alias("_j")
    ).agg(F.count("*").alias("_nij"))
    per_item = cell.groupBy("_i").agg(
        F.sum("_nij").alias("_ni"),
        F.sum(F.expr("_nij * cast(_nij - 1 as decimal(38,0))")).alias(
            "_agree"
        ),
    ).filter(F.col("_ni") >= min_raters)
    items = per_item.select(
        "_i",
        "_ni",
        F.expr(
            "cast((_agree * 1000000 * 2 + _ni * (_ni - 1))"
            " div (2 * _ni * cast(_ni - 1 as decimal(38,0))) as bigint)"
        ).alias("_pi_e6"),
    )
    kept = items.select("_i").distinct()
    cat_tot = (
        cell.join(kept, "_i")
        .groupBy("_j")
        .agg(F.sum("_nij").alias("_cj"))
    )
    scalars = items.agg(
        F.count("*").alias("n_items"),
        F.sum("_ni").alias("n_ratings"),
        F.sum("_pi_e6").alias("_sum_pi"),
    )
    pe = cat_tot.join(F.broadcast(scalars)).agg(
        F.max("n_items").alias("n_items"),
        F.max("n_ratings").alias("n_ratings"),
        F.max("_sum_pi").alias("_sum_pi"),
        F.sum(F.expr("_cj * cast(_cj as decimal(38,0))")).alias("_sum_cj2"),
    )
    out = pe.select(
        "n_items",
        "n_ratings",
        F.expr(
            "cast((_sum_pi * 2 + n_items) div (2 * n_items) as bigint)"
        ).alias("pbar_e6"),
        F.expr(
            "cast((_sum_cj2 * 1000000 * 2 + n_ratings *"
            " cast(n_ratings as decimal(38,0)))"
            " div (2 * n_ratings * cast(n_ratings as decimal(38,0)))"
            " as bigint)"
        ).alias("pe_e6"),
    )
    num = F.col("pbar_e6") - F.col("pe_e6")
    den = F.lit(1000000) - F.col("pe_e6")
    return out.select(
        "n_items",
        "n_ratings",
        "pbar_e6",
        "pe_e6",
        F.when(
            den > 0,
            F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "(abs(pbar_e6 - pe_e6) * 1000000 * 2"
                " + (1000000 - pe_e6)) div (2 * (1000000 - pe_e6))"
            ),
        ).cast("long").alias("kappa_e6"),
    )


def iptw_ate(
    df: DataFrame,
    unit_col: str,
    treated: Column,
    outcome_cents: Column,
    exposure_count: Column,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect with a
    LINEAR probability model — the observational-data companion to the
    randomized-experiment estimators (CUPED/DiD/stratified ATE):
    weight treated units by 1/p and control units by 1/(1−p), where the
    propensity p comes from a monotone clipped-linear score of the
    exposure covariate. A linear (not logistic) propensity keeps the
    whole estimator in EXACT integer arithmetic: p_e4 =
    clamp(500 + 250·exposure, 500, 9500) — clipping bounds the weights
    (the standard positivity guard) and no transcendental ever enters,
    so there is no libm to disagree across engine builds.

    One distinct-unit aggregation; per-unit weighted outcomes are
    half-up integer divisions at e4 scale; the ATE keeps its sign via
    an explicit sign factor. Output: (n_treated, n_control,
    wsum_treated_cents, wsum_control_cents, ate_cents) — exact BIGINTs.
    """
    per = df.groupBy(F.col(unit_col).alias("_u")).agg(
        F.coalesce(F.max(treated.cast("int")), F.lit(0)).alias("_t"),
        F.sum(outcome_cents).alias("_y"),
        F.sum(exposure_count).alias("_x"),
    )
    p_e4 = F.least(F.lit(9500), F.greatest(F.lit(500), F.lit(250) * F.col("_x")))
    scored = per.select(
        "_t",
        "_y",
        p_e4.cast("long").alias("_p"),
    )
    # per-unit weighted outcome: y/p (treated) or y/(1-p) (control),
    # half-up at the e4 propensity scale -> exact integer cents. The
    # abs+sign split keeps the integer division on non-negative
    # operands: Spark div truncates toward zero while DuckDB //
    # floors, so a negative _y (refunds) would otherwise diverge by 1.
    w_t = F.expr(
        "(case when _y < 0 then -1 else 1 end)"
        " * ((abs(_y) * 10000 * 2 + _p) div (2 * _p))"
    )
    w_c = F.expr(
        "(case when _y < 0 then -1 else 1 end)"
        " * ((abs(_y) * 10000 * 2 + (10000 - _p))"
        " div (2 * (10000 - _p)))"
    )
    tot = scored.agg(
        F.sum(F.col("_t").cast("long")).alias("n_treated"),
        F.sum((1 - F.col("_t")).cast("long")).alias("n_control"),
        F.sum(F.when(F.col("_t") == 1, w_t).otherwise(F.lit(0))).alias(
            "wsum_treated_cents"
        ),
        F.sum(F.when(F.col("_t") == 0, w_c).otherwise(F.lit(0))).alias(
            "wsum_control_cents"
        ),
        F.count("*").alias("_n"),
    )
    num = F.col("wsum_treated_cents") - F.col("wsum_control_cents")
    return tot.select(
        "n_treated",
        "n_control",
        "wsum_treated_cents",
        "wsum_control_cents",
        (
            F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "(abs(wsum_treated_cents - wsum_control_cents) * 2 + _n)"
                " div (2 * _n)"
            )
        ).cast("long").alias("ate_cents"),
    )


def cochran_q(
    df: DataFrame,
    unit_col: str,
    flags: dict[str, Column],
) -> DataFrame:
    """Cochran's Q — the k-treatment generalization of McNemar: do the
    SAME units respond differently across k binary treatments/steps?
    With per-unit row sums R_i and per-treatment column totals C_j,

        Q = (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²)

    Every term is an integer, so ``q_e6`` is an exact half-up e6
    integer in DECIMAL(38,0) (ΣC² wraps BIGINT past ~3e9 positives);
    no float is ever rounded. Constant response (denominator 0) yields
    NULL. One distinct-unit aggregation + a 1-row combine.
    """
    k = len(flags)
    per = df.groupBy(F.col(unit_col).alias("_u")).agg(
        *[F.coalesce(F.max(c.cast("int")), F.lit(0)).alias(f"_f{i}")
          for i, c in enumerate(flags.values())]
    )
    r = sum((F.col(f"_f{i}") for i in range(1, k)), F.col("_f0"))
    tot = per.agg(
        F.count("*").alias("n_units"),
        F.sum(r.cast("long")).alias("_sr"),
        F.sum((r * r).cast("long")).alias("_sr2"),
        *[
            F.sum(F.col(f"_f{i}").cast("long")).alias(f"_c{i}")
            for i in range(k)
        ],
    )
    sc2 = " + ".join(
        f"_c{i} * cast(_c{i} as decimal(38,0))" for i in range(k)
    )
    num = F.expr(
        f"({k} - 1) * ({k} * ({sc2}) - _sr * cast(_sr as decimal(38,0)))"
    )
    den = F.expr(f"{k} * _sr - _sr2")
    return tot.select(
        "n_units",
        F.lit(k).alias("k_treatments"),
        F.col("_sr").alias("n_positives"),
        F.when(
            den > 0,
            F.expr(
                f"cast((({k} - 1) * ({k} * ({sc2})"
                f" - _sr * cast(_sr as decimal(38,0))) * 1000000 * 2"
                f" + ({k} * _sr - _sr2))"
                f" div (2 * ({k} * _sr - _sr2)) as bigint)"
            ),
        ).alias("q_e6"),
    )


def odds_ratio(
    df: DataFrame,
    unit_col: str,
    exposed: Column,
    outcome: Column,
    z: float = 1.96,
    round_dp: int = 6,
) -> DataFrame:
    """2×2 odds ratio + relative risk with a Katz log-normal interval —
    the epidemiology-standard effect readout for exposure→outcome over
    per-unit flags. The point estimates are RATIONALS of the four cell
    counts, emitted as exact half-up e6 integers (DECIMAL-guarded cross
    products); the interval bounds go through ln/exp/sqrt and keep 6-dp
    doubles (irrational — the rounding digit is noise). Sparse cells
    (any of b·c = 0 for OR, denominators 0 for RR) yield NULLs.
    """
    per = df.groupBy(F.col(unit_col).alias("_u")).agg(
        F.coalesce(F.max(exposed.cast("int")), F.lit(0)).alias("_e"),
        F.coalesce(F.max(outcome.cast("int")), F.lit(0)).alias("_o"),
    )
    tot = per.agg(
        F.sum(((F.col("_e") == 1) & (F.col("_o") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("_e") == 1) & (F.col("_o") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("_e") == 0) & (F.col("_o") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("_e") == 0) & (F.col("_o") == 0)).cast("long")).alias("d"),
    )
    lnor = F.log(
        (F.col("a").cast("double") * F.col("d"))
        / (F.col("b").cast("double") * F.col("c"))
    )
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    ok = (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) & (F.col("d") > 0)
    return tot.select(
        "a",
        "b",
        "c",
        "d",
        F.when(
            (F.col("b") > 0) & (F.col("c") > 0),
            F.expr(
                "cast((a * cast(d as decimal(38,0)) * 1000000 * 2"
                " + b * cast(c as decimal(38,0)))"
                " div (2 * b * cast(c as decimal(38,0))) as bigint)"
            ),
        ).alias("odds_ratio_e6"),
        F.when(
            (F.col("c") > 0) & (F.col("a") + F.col("b") > 0),
            F.expr(
                "cast((a * (c + cast(d as decimal(38,0))) * 1000000 * 2"
                " + c * (a + cast(b as decimal(38,0))))"
                " div (2 * c * (a + cast(b as decimal(38,0)))) as bigint)"
            ),
        ).alias("relative_risk_e6"),
        F.when(ok, F.round(F.exp(lnor - F.lit(z) * se), round_dp)).alias(
            "or_ci_lo"
        ),
        F.when(ok, F.round(F.exp(lnor + F.lit(z) * se), round_dp)).alias(
            "or_ci_hi"
        ),
    )


def runs_test(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Wald–Wolfowitz runs test for serial randomness of a daily
    series: sign each day against the key's MEDIAN (>= median is '+'),
    count the runs, and compare with the expectation under exchange-
    ability — the cheap "is this metric trending/oscillating or just
    noise?" screen that needs no distributional assumption.

    The daily series comes from one calendar-bounded aggregation
    (exact integer cents); the median is an exact grid selection; runs
    count via lag over the per-key DAILY grid (calendar-bounded). The
    counts (n_days, n_plus, n_minus, n_runs) are exact integers; z
    goes through sqrt and keeps a 6-dp double (noise digit).
    """
    daily = (
        df.groupBy(
            F.col(key_col), F.to_date(F.col(ts_col)).alias("_day")
        )
        .agg(
            F.sum(
                F.expr(f"cast(round({value_col} * 100) as bigint)")
            ).alias("_v")
        )
    )
    med = grid_group_median(daily, key_col, "_v")
    signed = daily.join(med, key_col).select(
        F.col(key_col),
        "_day",
        (F.col("_v") >= F.col("_med")).cast("int").alias("_s"),
    )
    w = Window.partitionBy(key_col).orderBy("_day")
    runs = signed.withColumn("_prev", F.lag("_s").over(w)).groupBy(
        key_col
    ).agg(
        F.count("*").alias("n_days"),
        F.sum("_s").alias("n_plus"),
        F.sum(1 - F.col("_s")).alias("n_minus"),
        (
            F.lit(1)
            + F.sum(
                (F.col("_prev").isNotNull() & (F.col("_s") != F.col("_prev")))
                .cast("long")
            )
        ).alias("n_runs"),
    )
    n1 = F.col("n_plus").cast("double")
    n2 = F.col("n_minus").cast("double")
    n = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / n
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    )
    return runs.select(
        key_col,
        "n_days",
        "n_plus",
        "n_minus",
        "n_runs",
        F.when(
            (F.col("n_plus") > 0) & (F.col("n_minus") > 0),
            F.round((F.col("n_runs") - mu) / F.sqrt(var), round_dp),
        ).alias("z"),
    ).orderBy(key_col)
