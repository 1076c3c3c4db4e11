"""The dtype gate polices driver-bridge type regressions; this suite
polices the GATE: every divergence class it exists to catch is seeded
once and must flag, and a clean pair must not. Without this, a refactor
of scripts/dtype_check.py could silently drop a rule and the next
HUGEINT/DATE/nullable-bool/complex output would sail to a driver red.

Also fuzzes the media header parser: arbitrary byte strings (including
mutations of valid headers) must never raise — a corrupt blob in a
100 TB corpus must degrade to format='unknown', not kill the task.
"""

import importlib.util
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from streaming_demos_spark.operators import multimodal as MM

_spec = importlib.util.spec_from_file_location(
    "dtype_check",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "dtype_check.py"),
)
dtype_check = importlib.util.module_from_spec(_spec)
sys.modules["dtype_check"] = dtype_check
_spec.loader.exec_module(dtype_check)


def _fields(*specs):
    return [T.StructField(n, dt, nullable) for n, dt, nullable in specs]


def _msgs(flags):
    return " | ".join(m for _, _, m in flags)


def test_gate_clean_pair_no_flags():
    duck = {"k": "VARCHAR", "n": "BIGINT", "x": "DOUBLE", "ok": "BOOLEAN"}
    fields = _fields(("k", T.StringType(), True), ("n", T.LongType(), False),
                     ("x", T.DoubleType(), True),
                     ("ok", T.BooleanType(), False))
    assert dtype_check.pair_flags("q", duck, fields) == []


def test_gate_flags_hugeint_and_decimal():
    duck = {"n": "HUGEINT", "d": "DECIMAL(38,0)"}
    fields = _fields(("n", T.LongType(), False), ("d", T.LongType(), False))
    flags = dtype_check.pair_flags("q", duck, fields)
    assert len([f for f in flags if "floatifies" in f[2]]) == 2


def test_gate_flags_complex_types_both_sides():
    duck = {"v": "VARCHAR[]", "s": "STRUCT(a BIGINT)", "m": "MAP(VARCHAR, BIGINT)"}
    fields = _fields(
        ("v", T.ArrayType(T.StringType()), True),
        ("s", T.StructType([T.StructField("a", T.LongType())]), True),
        ("m", T.MapType(T.StringType(), T.LongType()), True),
    )
    flags = dtype_check.pair_flags("q", duck, fields)
    # 3 duckdb-side + 3 spark-side unhashable flags
    assert len([f for f in flags if "unhashable" in f[2]]) == 6
    # DuckDB FIXED-size arrays type as 'BIGINT[3]', not 'BIGINT[]' —
    # they arrive as list cells all the same and must flag
    fixed = dtype_check.pair_flags(
        "q", {"a": "BIGINT[3]"}, _fields(("a", T.LongType(), False)))
    assert len([f for f in fixed if "unhashable" in f[2]]) == 1


def test_gate_flags_nullable_boolean_spark_only():
    fields = _fields(("ok", T.BooleanType(), True))
    flags = dtype_check.pair_flags("q", {"ok": "BOOLEAN"}, fields)
    assert len(flags) == 1 and "schema-nullable BOOLEAN" in flags[0][2]
    # the coalesced (non-nullable) form is clean
    fields = _fields(("ok", T.BooleanType(), False))
    assert dtype_check.pair_flags("q", {"ok": "BOOLEAN"}, fields) == []


def test_gate_flags_raw_date_both_sides():
    fields = _fields(("d", T.DateType(), True))
    flags = dtype_check.pair_flags("q", {"d": "DATE"}, fields)
    assert len([f for f in flags if "DATE" in f[2] or "date" in f[2]]) == 2


def test_gate_flags_int_float_class_mismatch():
    fields = _fields(("x", T.LongType(), False))
    flags = dtype_check.pair_flags("q", {"x": "DOUBLE"}, fields)
    assert len(flags) == 1 and "class mismatch" in flags[0][2]
    # str-vs-str or ts-vs-ts never flags as class mismatch
    fields = _fields(("t", T.TimestampNTZType(), True))
    assert dtype_check.pair_flags("q", {"t": "TIMESTAMP"}, fields) == []


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_header_parser_never_raises_on_arbitrary_bytes(payload):
    out = MM.parse_media_header(payload)
    assert out["format"] in {"png", "jpeg", "gif", "wav", "unknown"}
    assert out["n_bytes"] == len(payload)
    for k in ("width", "height", "sample_rate_hz", "channels", "bit_depth"):
        assert out[k] >= 0


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 38), st.binary(min_size=1, max_size=3),
       st.integers(1, 65535), st.integers(1, 65535))
def test_header_parser_never_raises_on_mutated_valid_headers(
    pos, junk, w, h
):
    import struct as _s

    base = (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR"
            + _s.pack(">II", w, h) + bytes([8, 6, 0, 0, 0]) + b"\x00" * 4)
    mutated = base[:pos % len(base)] + junk + base[pos % len(base):]
    out = MM.parse_media_header(mutated)
    assert out["format"] in {"png", "jpeg", "gif", "wav", "unknown"}
    # truncations of a valid header must also degrade cleanly
    out2 = MM.parse_media_header(base[: pos % len(base)])
    assert out2["format"] in {"png", "unknown"}
