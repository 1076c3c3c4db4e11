"""Kafka source/sink wiring (SURVEY.md S4-S7), including the Confluent
Avro wire format (S5) — the one codec Spark's own spark-avro does not
handle.

Reference parity:
- JSON consumer:  kotlin-examples/orders-json-clients/src/main/kotlin/me/jaehyeon/ConsumerApp.kt:25-109
- Avro + registry: orders-stats-flink/.../kafka/Connectors.kt:18-42; registry fetch .../kafka/Utils.kt:48-70
- Avro keyed sink: Connectors.kt:44-76 (idempotent, lz4, at-least-once)
- Late/JSON sink:  Connectors.kt:78-102

No broker runs in this container, so the option builders and column
transforms are exercised in batch tests (the wire-format strip and the
(key,value) projections are pure column expressions — identical on a
streaming frame); the read/write entry points compose those pieces in
the standard readStream/writeStream shapes.

Confluent wire format: every message is ``0x00 | 4-byte schema id |
avro payload`` — spark-avro's from_avro expects the bare payload, so
the engine strips the 5-byte header first (SURVEY §2.1 flags this as
required custom work).

When the spark-avro jar is absent (this container), the pure-Python
Arrow-batched codec in ``sources/avro_codec.py`` covers the same
flat-record schemas end-to-end (decode AND encode, which the JVM path
gets from a registry serializer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_demos_spark.schemas import ORDER_EVENT


# --- option builders ---------------------------------------------------------


def source_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Kafka source options (ConsumerApp.kt:25-40: earliest, manual
    commit — Spark manages offsets through the checkpoint instead)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def sink_options(brokers: str, topic: str) -> dict[str, str]:
    """Kafka sink options (Connectors.kt:54-61: idempotent producer,
    lz4, linger 100ms, 64KB batches — at-least-once under
    checkpointing, T12)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.enable.idempotence": "true",
        "kafka.compression.type": "lz4",
        "kafka.linger.ms": "100",
        "kafka.batch.size": "65536",
    }


# --- codecs ------------------------------------------------------------------


def strip_confluent_header(value: Column | str, validate_magic: bool = True) -> Column:
    """Drop the 5-byte Confluent header (magic 0x00 + schema id) from a
    binary Kafka value, leaving the bare Avro payload. With
    ``validate_magic`` a non-0x00 first byte yields NULL (bad frame)
    rather than garbage — the null-safe P10 posture."""
    v = F.col(value) if isinstance(value, str) else value
    payload = F.substring(v, 6, F.length(v) - F.lit(5))
    if not validate_magic:
        return payload
    magic = F.substring(v, 1, 1) == F.lit(bytes([0]))
    return F.when(magic, payload)


def confluent_schema_id(value: Column | str) -> Column:
    """Big-endian 4-byte schema id from bytes 2-5 of the wire format
    (Utils.kt:48-70 fetches the writer schema for this id)."""
    v = F.col(value) if isinstance(value, str) else value
    b = [F.conv(F.hex(F.substring(v, i, 1)), 16, 10).cast("long") for i in (2, 3, 4, 5)]
    return (b[0] * 16777216 + b[1] * 65536 + b[2] * 256 + b[3]).cast("int")


def parse_order_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON value -> typed ORDER_EVENT columns (S4). Works identically
    on batch and streaming frames; from_json runs JVM-side."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), ORDER_EVENT).alias("o")
    ).select("o.*")


def parse_confluent_avro(value: Column | str, avro_schema_json: str) -> Column:
    """Header-strip + from_avro (S5). Import-gated: from_avro needs the
    spark-avro JVM package on the classpath; absent here, callers get a
    clear NotImplementedError instead of a py4j stack."""
    try:
        from pyspark.sql.avro.functions import from_avro

        # Eager classpath probe — without it the failure would surface
        # only at analysis time as an opaque py4j AnalysisException.
        # AvroDataToCatalyst is the expression behind from_avro; some
        # distros ship SchemaConverters/AvroFileFormat without it.
        sess = SparkSession.getActiveSession()
        if sess is not None:
            sess._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.spark.sql.avro.AvroDataToCatalyst"
            )
    except Exception as exc:  # spark-avro jar missing
        raise NotImplementedError(
            "from_avro requires the spark-avro package on the JVM classpath "
            "(--packages org.apache.spark:spark-avro); not present here"
        ) from exc
    return from_avro(strip_confluent_header(value), avro_schema_json)


def to_kafka_json(df: DataFrame, key_col: str) -> DataFrame:
    """(key, value) projection for a JSON sink (S7: late records keyed
    by order id, Connectors.kt:78-102)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


# --- end-to-end shapes -------------------------------------------------------


def read_order_events(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S4 end-to-end: Kafka stream -> typed order events. Requires the
    spark-sql-kafka package on the classpath (live deployments)."""
    raw = (
        spark.readStream.format("kafka")
        .options(**source_options(brokers, topic, starting_offsets))
        .load()
    )
    return parse_order_json(raw)


def write_stream_json(
    df: DataFrame, brokers: str, topic: str, key_col: str, checkpoint_dir: str
):
    """S6/S7 shape: keyed JSON writeStream with at-least-once sink
    options."""
    return (
        to_kafka_json(df, key_col)
        .writeStream.format("kafka")
        .options(**sink_options(brokers, topic))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
