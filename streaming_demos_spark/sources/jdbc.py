"""JDBC scan & sink (SURVEY.md S2/S3).

Reference parity:
- S2 sink: pandas ``to_sql`` append/replace into Postgres
  (cdc-local/src/utils.py:257-260; product-demos/producer/src/utils.py
  env-driven connection) -> ``df.write.jdbc`` append/overwrite.
- S3 scan: ``pd.read_sql`` of a join query with a time filter
  (product-demos/producer/api.py:35-63) -> ``spark.read.jdbc``. Spark
  pushes filters into the remote database natively (the plan shows
  ``PushedFilters: [...]`` on the JDBC relation), so the reference's
  WHERE-inside-SQL-text pattern is free.

Scale posture: a single-connection JDBC scan is a 1-task read no matter
the cluster size. ``read_jdbc`` therefore exposes Spark's partitioned
read (partitionColumn/lowerBound/upperBound/numPartitions -> N parallel
range-sliced connections), which is the only way a JDBC scan keeps a
1000-executor cluster busy. Writes batch rows per round trip
(``batchsize``) and parallelize per input partition.

Tested against the Derby embedded driver (ships with Spark); the same
code drives Postgres/MySQL by switching url+driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = True) -> str:
    """Embedded-Derby URL for local runs/tests."""
    return f"jdbc:derby:{db_path}{';create=true' if create else ''}"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = 10_000,
    column_types: str | None = None,
) -> None:
    """S2: append/overwrite a DataFrame into a JDBC table (pandas
    ``to_sql`` parity: mode='append'|'overwrite' ~ if_exists). Each input
    partition writes over its own connection; rows are batched
    ``batch_size`` per round trip.

    ``column_types`` ("col TYPE, ...") overrides the dialect's default
    DDL mapping on table creation — e.g. Derby maps StringType to CLOB,
    which cannot be grouped/compared remotely; declare VARCHAR(n) for
    key columns."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if driver:
        w = w.option("driver", driver)
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """S3: scan a JDBC table (or ``(subquery) alias``) as a DataFrame.
    Filters/projections composed on the result push down to the remote
    database (Catalyst JDBC pushdown — verify with
    ``explain('formatted')`` -> ``PushedFilters``).

    Pass partition_col + bounds + num_partitions for a parallel
    range-sliced scan; without them the read is one task (fine for dim
    tables, wrong for facts)."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if driver:
        r = r.option("driver", driver)
    if partition_col is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC scan needs partition_col, lower_bound, "
                "upper_bound and num_partitions together"
            )
        r = (
            r.option("partitionColumn", partition_col)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
