"""Order-event workload generator (SURVEY.md S15 — the producer
harness side of the supplier-stats demo).

Reference parity: kotlin-examples/orders-json-clients/src/main/kotlin/
me/jaehyeon/ProducerApp.kt:44-83 — 1 order/s with uuid order_id,
``bid_time`` formatted "yyyy-MM-dd HH:mm:ss" drawn from the recent
past (late-ish by construction), price in [1, 150), a product name,
and a supplier from a fixed 8-name roster. The Python Avro producer
(product-recommender/recsys-engine/src/infra.py:15-68) plays the same
role for feedback events.

Spark restatement: the generator is a *transform over the rate source*
(streaming) or over ``spark.range`` (batch) — all columns derive from
deterministic hashes of the row id, so tests can assert exact values
and two engines can reproduce the same workload. Feeding Kafka is then
``sources.kafka.write_stream_json`` / ``to_kafka_json`` over this
frame — the engine-side sink (S6/S7) stays the single write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPLIERS = ["Alice", "Bob", "Carol", "Alex", "Joe", "James", "Jane", "Jack"]
ITEMS = ["beer", "wine", "cider", "mead", "soda", "juice", "water", "tea"]
BID_TIME_FMT = "yyyy-MM-dd HH:mm:ss"


def _order_columns(id_col, base_time, max_delay_sec: int):
    """Deterministic pseudo-random order fields from a row id."""
    h = F.abs(F.xxhash64(id_col))
    sup = F.array(*[F.lit(s) for s in SUPPLIERS])
    itm = F.array(*[F.lit(i) for i in ITEMS])
    delay = (h % F.lit(max_delay_sec)).cast("double")
    return [
        F.md5(id_col.cast("string")).alias("order_id"),
        F.date_format(
            base_time - F.make_dt_interval(secs=delay), BID_TIME_FMT
        ).alias("bid_time"),
        (F.lit(1.0) + (h % F.lit(14900)) / 100.0).alias("price"),
        F.element_at(itm, (h % F.lit(len(ITEMS)) + 1).cast("int")).alias("item"),
        F.element_at(sup, (h % F.lit(len(SUPPLIERS)) + 1).cast("int")).alias("supplier"),
    ]


def order_events_batch(
    spark: SparkSession,
    n: int,
    start: str = "2024-01-01 00:00:00",
    events_per_sec: int = 1,
    max_delay_sec: int = 15,
) -> DataFrame:
    """Bounded workload: ``n`` orders, arrival clock advancing
    ``events_per_sec`` per wall-second from ``start``; each bid_time
    lags its arrival by a deterministic 0..max_delay_sec (the
    reference's past-draw that produces out-of-order/late records)."""
    base = F.to_timestamp(F.lit(start))
    arrival = base + F.make_dt_interval(
        secs=F.floor(F.col("id") / events_per_sec).cast("double")
    )
    df = spark.range(n)
    return df.select(
        F.col("id").alias("seq"), *_order_columns(F.col("id"), arrival, max_delay_sec)
    )


def order_events_stream(
    spark: SparkSession,
    rows_per_second: int = 1,
    max_delay_sec: int = 15,
) -> DataFrame:
    """Live workload over the rate source (1 row/s default — the
    reference's Thread.sleep(1000) cadence). ``timestamp`` is the
    arrival clock; bid_time lags it deterministically, so the stream
    exercises watermarks and the late channel end-to-end."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    return rate.select(
        F.col("value").alias("seq"),
        *_order_columns(F.col("value"), F.col("timestamp"), max_delay_sec),
    )
