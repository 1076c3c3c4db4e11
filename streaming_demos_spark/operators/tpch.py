"""Classic decision-support query suite (TPC-H adapted to the TESTDATA
star schema) — the canonical multi-join / semi-join / anti-join /
correlated-aggregate plan shapes a relational engine must get right.

The reference engine's analytics surface (product-demos/streamlit/
utils.py, product-demos/producer/api.py) is built from exactly these
shapes — joins over the order/lineitem fact pair with dim enrichment,
grouped revenue rollups, top-k cuts — so this suite restates the
standard benchmark forms of those shapes on the same star schema.
Queries needing columns the TESTDATA schema trims (partsupp,
l_commitdate, l_receiptdate, l_shipmode, c_phone) are adapted to
equivalent plan shapes on the columns that exist; each docstring says
how.

Scale posture (100 TB):
- ``nation``/``region`` are fixed-size dims -> always broadcast.
- ``part`` follows the repo-wide dim treatment (dashboard_feed) ->
  broadcast hint; at extreme SF Catalyst/AQE demotes it to shuffle.
- ``customer``/``supplier``/``orders``/``lineitem`` are fact-scaled ->
  never broadcast; they shuffle on their join keys and AQE picks the
  physical strategy (and handles skew) at runtime.
- Every aggregate is expressed groupBy-first so partial (map-side)
  aggregation applies; every top-k is orderBy+limit so Spark plans
  TakeOrderedAndProject (no global sort).
- Date-range and category predicates are plain column comparisons ->
  pushed to the parquet scan.

Determinism: every output double is rounded in-plan (the DuckDB oracles
round identically); every LIMIT is preceded by a total order with a
unique tie-breaker key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _revenue():
    """Lazily-built revenue expression — must not evaluate F.col at
    import time (pyspark asserts an active SparkContext)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    pivot_date: str = "1998-06-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3: top-k unshipped orders by revenue for one market
    segment — orders placed before the pivot whose lineitems ship
    after it.

    Plan shape: segment filter prunes customer at the scan; the
    customer⨝orders join shuffles on the customer key, orders⨝lineitem
    on the order key; groupBy(l_orderkey) reuses the lineitem-side
    partitioning; orderBy+limit is TakeOrderedAndProject (k rows per
    partition -> driver), never a global sort.
    """
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < _ts(pivot_date))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > _ts(pivot_date))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(k)
    )


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-07-01",
    date_to: str = "1997-10-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 (adapted): order-priority checking — count orders in a
    quarter having at least one lineitem that shipped "late".

    The spec's lateness test (l_commitdate < l_receiptdate) uses columns
    the TESTDATA schema trims; the adapted test — shipped more than
    ``late_days`` after the order date — exercises the identical plan
    shape: a LEFT SEMI join with a non-equi conjunct on top of the
    order-key equality (one shuffle each side, no row duplication, the
    EXISTS idiom).
    """
    in_quarter = orders.filter(
        (F.col("o_orderdate") >= _ts(date_from))
        & (F.col("o_orderdate") < _ts(date_to))
    )
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
    )
    return (
        in_quarter.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q5_local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5: revenue by nation from *local* supply chains (customer
    and supplier in the same nation) within one region and year.

    Plan shape: the supplier join carries BOTH the supplier-key equality
    and the local-nation equality (c_nationkey = s_nationkey) so the
    selective conjunct applies inside the join, not as a post-filter on
    a wider result. nation/region are fixed 25/5-row dims -> broadcast;
    the region filter prunes via the broadcast before aggregation.
    """
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= _ts(date_from))
                & (F.col("o_orderdate") < _ts(date_to))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    qty_below: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: forecast-revenue-change — a pure scan-filter-aggregate
    with NO join. The whole plan must collapse to one parquet scan with
    all three predicates pushed + a 1-row partial/final aggregate; this
    is the pushdown probe for conjunctive range predicates (see
    tests/test_plans.py for the PushedFilters assertion).
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_from))
            & (F.col("l_shipdate") < _ts(date_to))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_below)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


def q7_nation_volume(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_14",
    date_from: str = "1998-01-01",
    date_to: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship
    year, in both directions.

    Plan shape: the two nation dims broadcast twice under different
    aliases (supplier side / customer side); the disjunctive
    direction predicate ((a,b) or (b,a)) applies after both broadcasts
    — Catalyst folds it into the joined stream, and because each
    nation dim is pre-filtered to the two names, the broadcast hash
    tables are 2 rows each and the fact stream is pruned at the first
    join touch.
    """
    pair = [nation_a, nation_b]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_from))
            & (F.col("l_shipdate") < _ts(date_to))
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-10-01",
    date_to: str = "1998-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10: top-k customers by revenue lost to returned items in
    one quarter.

    Plan shape: the quarter predicate prunes orders at the scan and the
    returnflag predicate prunes lineitem at the scan BEFORE either side
    shuffles; groupBy carries the customer attributes through the
    aggregate (they are functionally dependent on c_custkey, so the
    wider key adds no cardinality); orderBy+limit ->
    TakeOrderedAndProject.
    """
    return (
        orders.filter(
            (F.col("o_orderdate") >= _ts(date_from))
            & (F.col("o_orderdate") < _ts(date_to))
        )
        .join(
            lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def q14_promo_effect(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1998-03-01",
    date_to: str = "1998-04-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promotional parts —
    the conditional-aggregation (CASE inside SUM) shape.

    The spec's ``p_type LIKE 'PROMO%'`` collapses to equality on the
    TESTDATA schema's single-word p_type categories. One broadcast-dim
    join, one 1-row aggregate; try_divide guards the empty-month case
    under ANSI mode.
    """
    month = lineitem.filter(
        (F.col("l_shipdate") >= _ts(date_from))
        & (F.col("l_shipdate") < _ts(date_to))
    )
    promo = F.when(F.col("p_type") == promo_type, _revenue()).otherwise(F.lit(0.0))
    return (
        month.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.try_divide(F.sum(promo), F.sum(_revenue())),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-07-01",
    date_to: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum 3-month revenue — the
    aggregate-then-compare-to-global-max shape (the spec's revenue
    view + MAX subquery).

    Plan shape: one shuffle to group lineitem by supplier key; the
    global max is a 1-row aggregate broadcast back into the stream (no
    driver collect, no second scan of lineitem); the supplier dim joins
    after the max filter so only winner rows touch it. Revenues are
    compared ROUNDED (2 dp) on both sides — the same rounding the
    oracle uses — so summation-order ulps cannot flip the winner.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_from))
            & (F.col("l_shipdate") < _ts(date_to))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_max_rev"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#9",
    qty_fraction: float = 0.2,
    years: float = 7.0,
) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below ``qty_fraction`` of the part's own mean quantity) were not
    taken — the correlated-scalar-subquery shape.

    The spec's correlated ``0.2 * avg(l_quantity) per part`` becomes a
    window mean over the part key: the brand's parts broadcast into
    lineitem FIRST (so the fact stream is pruned to the brand before
    any shuffle), then ONE shuffle on l_partkey computes the per-part
    mean and the comparison in the same exchange — strictly better than
    the self-join translation, which would scan and shuffle lineitem
    twice. (p_container, which the spec also filters, is trimmed from
    the TESTDATA schema; brand alone keeps the same selectivity role.)
    """
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        lineitem.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < qty_fraction * F.col("_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / years, 2).alias("avg_yearly")
        )
    )


def q18_large_volume_customer(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 300.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18: large-volume customers — orders whose total lineitem
    quantity exceeds a threshold, with the customer attached.

    Plan shape: the HAVING subquery and the outer per-order quantity
    sum are the SAME aggregate, so it is computed once (one shuffle on
    l_orderkey) and reused — no second lineitem scan, unlike the
    literal spec translation. The filtered order set is tiny (top
    ~0.1 % of orders), so both enrichment joins run against a stream
    AQE will plan as broadcast at runtime; orderBy+limit ->
    TakeOrderedAndProject.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 1).alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
    )


def q19_discounted_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    clauses: tuple = (
        ("Brand#1", 1, 15, 1.0, 20.0),
        ("Brand#2", 10, 30, 10.0, 30.0),
        ("Brand#9", 20, 50, 20.0, 50.0),
    ),
) -> DataFrame:
    """TPC-H Q19: revenue matching a disjunction of (brand, size-range,
    quantity-range) clauses — the OR-of-conjuncts join shape.

    Each clause couples part attributes with a lineitem attribute, so
    nothing but the partkey equality can drive the join; the part side
    pre-filters to the union of clause brands (prunes the broadcast
    hash table), and the full disjunction evaluates inside the joined
    stream in one pass. (The spec's p_container/l_shipmode conjuncts
    use trimmed columns; brand x size x quantity keeps the shape.)
    """
    brands = sorted({c[0] for c in clauses})
    pf = part.filter(F.col("p_brand").isin(brands)).select(
        "p_partkey", "p_brand", "p_size"
    )
    cond = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in clauses:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= size_lo)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= qty_lo)
            & (F.col("l_quantity") <= qty_hi)
        )
        cond = c if cond is None else (cond | c)
    return (
        lineitem.join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


def q22_dormant_high_balance(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    dormant_since: str = "1999-08-01",
) -> DataFrame:
    """TPC-H Q22 (adapted): sales-opportunity scan — high-balance
    customers with NO recent orders, counted per nation.

    The spec's "no orders at all" is empty on TESTDATA (every customer
    has orders) and its country-code substring uses the trimmed c_phone,
    so the adaptation keeps the exact plan shapes — scalar-subquery
    threshold + NOT EXISTS — with "recent" = since ``dormant_since``
    and nation as the grouping: the average positive balance is a 1-row
    aggregate broadcast into the filter (no driver collect), and the
    anti-join runs against orders PRE-FILTERED to the recent window, so
    the anti-join's build side shrinks with the predicate instead of
    carrying the whole history.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= _ts(dormant_since)).select(
        "o_custkey"
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )
