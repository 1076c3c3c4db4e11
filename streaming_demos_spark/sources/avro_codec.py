"""Pure-Python Avro binary codec for flat record schemas (S5/S6).

Neither the spark-avro JVM package nor a Python avro library is
available in this container (the Avro CORE jars ship with Spark, but
the ``spark-avro`` datasource that exposes ``from_avro`` does not), and
the reference's Avro surface is records of primitives plus one
primitive-array field (orders-avro-clients/src/main/avro/Order.avsc,
orders-stats-flink/src/main/avro/SupplierStats.avsc, and FeedbackEvent
in product-recommender/recsys-engine/src/models.py:172-195 whose
``context_vector`` is ``{"type":"array","items":"double"}``) — small
enough to cover with the Avro 1.11 binary spec directly:

- ``long``/``int``: zigzag varint
- ``double``/``float``: little-endian IEEE754
- ``string``/``bytes``: varint byte length + payload
- ``boolean``: one byte
- ``["null", T]`` unions: varint branch index, then the branch value
- ``{"type": "array", "items": P}``: blocks of (zigzag count, items),
  0-count terminator; a writer may emit a NEGATIVE count, meaning
  |count| items preceded by the block's byte size (the spec's skip
  optimization) — the decoder honors both, the encoder emits one
  positive block
- ``logicalType`` annotations (e.g. timestamp-millis on long) ride on
  the underlying primitive unchanged, matching spark-avro's default
  behavior for unregistered logical types

The Spark integration is Arrow-batched ``mapInPandas`` over the binary
Kafka value column — the decode kernel is Python, but it runs on
columnar batches on the executors (the sanctioned slow-path shape when
a JVM codec genuinely does not exist). On a real cluster, install
spark-avro and swap in ``kafka.parse_confluent_avro``; plans and
schemas are identical.

The encoder exists so the producer harness (S15) and tests can build
Confluent-framed messages (0x00 magic + big-endian schema id + avro
payload) without a registry.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PRIMITIVES = {"string", "bytes", "long", "int", "double", "float", "boolean"}

_SPARK_TYPES = {
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
}


def parse_schema(avro_schema_json: str) -> list[tuple[str, str, bool]]:
    """Validate and flatten a record schema to (name, type, nullable)
    triples, where type is a primitive name or ``array<primitive>``.
    Supports the subset described in the module docstring; anything
    else raises."""
    schema = json.loads(avro_schema_json)
    if schema.get("type") != "record":
        raise ValueError(f"only record schemas supported, got {schema.get('type')!r}")
    fields: list[tuple[str, str, bool]] = []
    for f in schema["fields"]:
        ftype, nullable = f["type"], False
        if isinstance(ftype, list):  # union
            branches = [b for b in ftype if b != "null"]
            if len(branches) != 1 or "null" not in ftype:
                raise ValueError(f"only ['null', T] unions supported: {ftype}")
            ftype, nullable = branches[0], True
        if isinstance(ftype, dict):
            # logicalType rides on the underlying primitive; arrays of
            # primitives flatten to "array<P>".
            if ftype.get("type") == "array":
                items = ftype.get("items")
                if items not in _PRIMITIVES:
                    raise ValueError(
                        f"only arrays of primitives supported (field {f['name']})"
                    )
                ftype = f"array<{items}>"
            elif ftype.get("type") in _PRIMITIVES:
                ftype = ftype["type"]
            else:
                raise ValueError(
                    f"unsupported field type {ftype!r} (field {f['name']})"
                )
        if not (ftype in _PRIMITIVES or ftype.startswith("array<")):
            raise ValueError(f"unsupported field type {ftype!r} (field {f['name']})")
        fields.append((f["name"], ftype, nullable))
    return fields


def _spark_type(ftype: str) -> T.DataType:
    if ftype.startswith("array<"):
        return T.ArrayType(_SPARK_TYPES[ftype[6:-1]])
    return _SPARK_TYPES[ftype]


def spark_schema(avro_schema_json: str, force_nullable: bool = False) -> T.StructType:
    return T.StructType(
        [
            T.StructField(name, _spark_type(ftype), nullable or force_nullable)
            for name, ftype, nullable in parse_schema(avro_schema_json)
        ]
    )


# --- primitive codecs (Avro 1.11 binary spec) --------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _encode_value(ftype: str, v) -> bytes:
    if ftype.startswith("array<"):
        items = ftype[6:-1]
        vals = list(v)
        out = bytearray()
        if vals:
            # one positive block: zigzag count, then the items
            out += _zigzag_encode(len(vals))
            for item in vals:
                out += _encode_value(items, item)
        out += _zigzag_encode(0)  # terminator
        return bytes(out)
    if ftype == "string":
        raw = v.encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if ftype == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    if ftype in ("long", "int"):
        return _zigzag_encode(int(v))
    if ftype == "double":
        return struct.pack("<d", float(v))
    if ftype == "float":
        return struct.pack("<f", float(v))
    if ftype == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(ftype)


def _decode_value(ftype: str, buf: bytes, pos: int):
    if ftype.startswith("array<"):
        items = ftype[6:-1]
        vals = []
        while True:
            count, pos = _zigzag_decode(buf, pos)
            if count == 0:
                return vals, pos
            if count < 0:
                # spec: negative count = |count| items preceded by the
                # block's byte size (skip optimization); read past it.
                count = -count
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(count):
                v, pos = _decode_value(items, buf, pos)
                vals.append(v)
    if ftype in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if ftype == "string" else raw), pos + n
    if ftype in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(ftype)


# --- record codecs ------------------------------------------------------------


def encode_record(fields: list[tuple[str, str, bool]], rec: dict) -> bytes:
    out = bytearray()
    for name, ftype, nullable in fields:
        v = rec.get(name)
        if nullable:
            if v is None:
                out += _zigzag_encode(0)  # union branch 0 = null
                continue
            out += _zigzag_encode(1)
        elif v is None:
            raise ValueError(f"null for non-nullable field {name!r}")
        out += _encode_value(ftype, v)
    return bytes(out)


def decode_record(fields: list[tuple[str, str, bool]], buf: bytes, pos: int = 0) -> dict:
    rec = {}
    for name, ftype, nullable in fields:
        if nullable:
            branch, pos = _zigzag_decode(buf, pos)
            if branch == 0:
                rec[name] = None
                continue
        rec[name], pos = _decode_value(ftype, buf, pos)
    return rec


# --- Confluent framing ---------------------------------------------------------


def frame_confluent(payload: bytes, schema_id: int) -> bytes:
    """0x00 magic + big-endian schema id + bare avro payload."""
    return b"\x00" + struct.pack(">I", schema_id) + payload


def unframe_confluent(value: bytes) -> tuple[int, bytes]:
    """(schema_id, payload); raises on a bad magic byte."""
    if not value or value[0] != 0:
        raise ValueError("bad Confluent magic byte")
    return struct.unpack_from(">I", value, 1)[0], value[5:]


# --- Spark integration ----------------------------------------------------------


def decode_confluent_avro(
    df: DataFrame,
    avro_schema_json: str,
    value_col: str = "value",
    bad_row_policy: str = "null",
) -> DataFrame:
    """Binary Kafka values (Confluent-framed) -> typed columns, via
    Arrow-batched mapInPandas. ``bad_row_policy``: ``null`` emits a row
    of NULLs for an undecodable frame (P10 posture, keeps offsets
    aligned), ``drop`` skips it, ``fail`` raises.

    Identical column contract to spark-avro's
    ``from_avro(strip_confluent_header(value), schema).select("*")`` —
    swap implementations freely when the JVM package is present."""
    if bad_row_policy not in ("null", "drop", "fail"):
        raise ValueError(bad_row_policy)
    fields = parse_schema(avro_schema_json)
    # all-nullable output: under the ``null`` policy a bad frame becomes
    # a NULL row regardless of the writer schema's nullability
    out_schema = spark_schema(avro_schema_json, force_nullable=True)
    names = [n for n, _, _ in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                try:
                    _, payload = unframe_confluent(bytes(raw))
                    rows.append(decode_record(fields, payload))
                except Exception:
                    if bad_row_policy == "fail":
                        raise
                    if bad_row_policy == "null":
                        rows.append(dict.fromkeys(names))
            yield pd.DataFrame(rows, columns=names)

    return df.select(value_col).mapInPandas(run, schema=out_schema)


def encode_confluent_avro(
    df: DataFrame,
    avro_schema_json: str,
    schema_id: int,
    key_col: str | None = None,
) -> DataFrame:
    """Typed columns -> Confluent-framed binary ``value`` (plus optional
    string ``key``) — the Kafka-sink projection for an Avro topic (S6)
    when no registry/serializer is available."""
    fields = parse_schema(avro_schema_json)
    names = [n for n, _, _ in fields]
    # the key is usually one of the record fields — select it once
    cols = ([key_col] if key_col and key_col not in names else []) + names

    out_fields = ([T.StructField("key", T.StringType(), True)] if key_col else []) + [
        T.StructField("value", T.BinaryType(), False)
    ]
    out_schema = T.StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values = [
                frame_confluent(encode_record(fields, rec), schema_id)
                for rec in pdf[names].to_dict("records")
            ]
            out = {"value": values}
            if key_col:
                out = {"key": pdf[key_col].astype(str), "value": values}
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=out_schema)
