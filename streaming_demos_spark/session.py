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
        # NOTE (measured, r11): raising spark.sql.codegen.cache.maxEntries
        # from its 100-entry default to 4096 — to let bench min-of-N
        # passes skip Janino recompilation — was a large NEGATIVE: the
        # retained generated classes can never be unloaded, JIT-compiled
        # code accumulates across a 341-query sweep, and pass 3 degraded
        # 10-50x on the heaviest queries (llm_dedup_report 6s -> 316s,
        # calibration-query median 2x) with steal flat — classic code-
        # cache/JIT exhaustion. Keep the default; the sf0.001 warmup
        # already absorbs first-compile cost.
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
