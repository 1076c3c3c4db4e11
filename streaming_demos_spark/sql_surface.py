"""Spark SQL string surface (SURVEY.md §3.1).

The reference's dashboard path drives everything with SQL strings over
registered relations (product-demos/producer/api.py:37-58,
streamlit/utils.py:25-104). The engine supports the same entry point:
``catalog.register_views`` materializes the star schema as temp views
and these canonical ANSI forms of the headline queries run through
``spark.sql`` — planned by the SAME Catalyst pipeline as the DataFrame
API, so pushdown/pruning/broadcast decisions are identical
(``tests/test_round3_ops.py`` asserts row-level equality between the
two surfaces).

Dialect note: these strings are deliberately ANSI-compatible — each is
also executable by DuckDB, which is what makes the engine's oracle
strategy possible at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streaming_demos_spark.catalog import register_views

SQL_QUERIES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(avg(l_extendedprice), 4)                                   AS avg_price,
               round(avg(l_discount), 6)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "a1_a2_a9_dashboard_metrics": """
        SELECT count(DISTINCT o_orderkey)                          AS n_orders,
               count(DISTINCT l_partkey)                           AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2)   AS total_revenue,
               round(avg(l_extendedprice * (1 - l_discount)), 4)   AS avg_sale_price
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part     ON l_partkey = p_partkey
    """,
    "a3_o1_grouped_revenue_nation": """
        SELECT n_name AS nation,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part     ON l_partkey = p_partkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC, nation ASC
    """,
    "o2_top5_parts": """
        SELECT l_partkey AS part_id,
               any_value(p_name) AS part_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY l_partkey
        ORDER BY revenue DESC, part_id ASC
        LIMIT 5
    """,
}


def run_sql(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """Run a named headline query through the SQL-string entry point."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_QUERIES[name])
