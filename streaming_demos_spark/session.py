"""SparkSession factory.

One place to pin every engine-level config so tests, bench, and the
driver entry point all run the same way:

- UTC session timezone (oracle comparisons against DuckDB's UTC-naive
  timestamps depend on it),
- Arrow for all pandas UDF exchange (the vectorized ML operators),
- AQE on (runtime coalesce + skew-join handling — the 100 TB posture),
- shuffle partitions sized to cores for local mode (overridable; on a
  real cluster this is set per-job to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "streaming_demos_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults target the harness box (local[$SPARK_GRAFT_CPUS]); on a real
    cluster pass ``master=None`` with a pre-set spark.master and size
    ``shuffle_partitions`` to the data.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromGenerate copies the generator's child into a
        # `size(x)>0 AND isnotnull(x)` filter that predicate-pushdown
        # then drives below the projections that materialize it — for
        # the text pipelines the whole tokenize->shingle->distinct
        # chain (higher-order transforms: ALWAYS interpreted, never
        # codegen) is re-evaluated twice per row at the scan, before
        # the fan_out repartition, i.e. serially. Measured at sf0.1:
        # llm_dedup_containment 9.5->2.2s, llm_dedup_keep_best
        # 43->6s. The rule prunes rows whose explode yields nothing;
        # every shingle/band array here is non-empty by construction
        # (docs < k words collapse to one whole-doc shingle), so the
        # prune removes zero rows at ANY scale and only the duplicated
        # evaluation remains. Output is provably unchanged: Generate
        # itself drops null/empty arrays.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # The generated-class cache (static conf, default 100 entries)
        # thrashes under a 341-query suite: each query compiles 5-15
        # codegen units, so by the time a plan re-runs (bench min-of-N
        # passes; repeated production queries) its entries are long
        # evicted and Janino recompiles identical source. Sizing the
        # cache to the suite makes repeat executions measure execution,
        # not recompilation — the same steady-state the bench's sf0.001
        # warmup pass was already designed to reach (guide §1).
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata writes events.ts as TIMESTAMP(NANOS); read it
        # as a long and let catalog.load_table rebuild µs timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
