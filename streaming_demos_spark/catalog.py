"""Table catalog: load the driver TESTDATA star schema as DataFrames.

Parquet scans go through Spark's vectorized reader; every downstream
select/filter benefits from pushdown + pruning because loading declares
no projection here (Catalyst prunes per-query).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from streaming_demos_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every TESTDATA table as a temp view so operators can be
    written in either DataFrame or SQL form against the same catalog."""
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
