"""Hybrid seed-then-stream bootstrap (S9) and the periodic push-refresh
sink (S12/T13).

Reference parity:
- HybridSource (file history -> live Kafka):
  recsys-trainer/.../topology/ParameterUpdateJob.kt:30-61
- Periodic websocket refresh (5s cadence, 5-min lookback):
  product-demos/producer/api.py:12-16,94-113

S9 Spark idiom (SURVEY §2.1 decision): Spark has no HybridSource; the
engine offers BOTH restatements —
  a) ``union``-style: the history directory as a bounded file stream
     unioned with the live stream, each row tagged with its origin (one
     query, no seam, exactly-once via the one checkpoint);
  b) seed-then-stream: run a batch job over history first (e.g.
     linucb.fit_batch -> sinks.publish_models), then start the live
     stream whose cold-start reads the seeded store — no double
     counting because the history never enters the stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hybrid_stream(
    spark: SparkSession,
    history_dir: str,
    schema: T.StructType,
    live: DataFrame,
    fmt: str = "parquet",
) -> DataFrame:
    """S9(a): bounded history files + live stream as ONE streaming
    union, origin-tagged. The file side drains first under
    availableNow; under a continuous trigger both sides interleave and
    the checkpoint covers both sources."""
    reader = spark.readStream.schema(schema)
    history = getattr(reader, fmt)(history_dir)
    return history.withColumn("_origin", F.lit("history")).unionByName(
        live.withColumn("_origin", F.lit("live"))
    )


def seed_then_stream(
    seed_job: Callable[[], None],
    start_stream: Callable[[], "object"],
):
    """S9(b): run the batch seed (write models/state to the shared
    store), THEN start the live stream. Returns the StreamingQuery.
    Ordering is the whole contract — the stream's cold-start path reads
    what the seed wrote (ParameterUpdateJob.kt replays history before
    attaching Kafka for the same reason)."""
    seed_job()
    return start_stream()


def periodic_refresh(
    df: DataFrame,
    emit: Callable[[list[dict], int], None],
    seconds: int = 5,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """S12/T13: every trigger, push the refreshed micro-batch as JSON
    records to ``emit(records, batch_id)`` — the websocket-push analog
    (api.py:94-113; 5s default cadence mirrors REFRESH_SECONDS). The
    batch is expected to be dashboard-sized (the reference pushes the
    whole refreshed window each tick)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        records = [r.asDict(recursive=True) for r in batch_df.collect()]
        emit(records, batch_id)

    writer = df.writeStream.foreachBatch(process).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{seconds} seconds")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
