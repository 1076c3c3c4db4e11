"""Declared-schema file sources with bad-row policies (SURVEY.md S1/S8).

Reference parity:
- static CSV dims: cdc-local/src/utils.py:113-119;
  product-recommender/recsys-engine/src/utils.py:12-19
- bounded CSV stream with header/bad-row skip:
  recsys-trainer/.../infrastructure/file/FileSourceFactory.kt:30-108
  (header skip :82, token-count validation + skip-with-log :84-105)

Schema is ALWAYS declared (schema-on-read, never inference — SURVEY
§1.3); the bad-row policy maps the reference's "validate + skip" to
Spark's parser modes, plus a ``parse_csv_lines`` column-level parser
(from_csv + corrupt-record filter) for text lines already on a
DataFrame (the Kafka-value / testable path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MODES = {"drop": "DROPMALFORMED", "permissive": "PERMISSIVE", "fail": "FAILFAST"}


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    bad_rows: str = "drop",
    header: bool = True,
    **options,
) -> DataFrame:
    """S1: batch CSV scan with declared schema. ``bad_rows``:
    'drop' (FileSourceFactory's validate-and-skip), 'permissive'
    (nulls for broken fields), or 'fail'."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", _MODES[bad_rows])
        .options(**options)
        .csv(path)
    )


def read_csv_stream(
    spark: SparkSession,
    directory: str,
    schema: T.StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    """S8: bounded CSV file stream (run with trigger(availableNow=True)
    for the reference's bounded-source semantics; DROPMALFORMED skips
    bad rows exactly like FileSourceFactory.kt:84-105)."""
    return (
        spark.readStream.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED")
        .options(**options)
        .csv(directory)
    )


def parse_csv_lines(
    df: DataFrame,
    line_col: str,
    schema: T.StructType,
    bad_rows: str = "drop",
) -> DataFrame:
    """Parse raw CSV text lines already in a column (the testable
    in-engine path; also the Kafka-value-as-CSV path). Malformed lines
    land in a corrupt-record column: 'drop' filters them (reference
    skip-with-log), 'permissive' keeps them with null fields."""
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType(), True)]
    )
    parsed = df.select(
        F.from_csv(
            F.col(line_col),
            parse_schema.simpleString(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    ).select("r.*")
    if bad_rows == "drop":
        parsed = parsed.filter(F.col("_corrupt").isNull())
    return parsed.drop("_corrupt")


def to_csv_line(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Serialize columns to one CSV line (inverse of parse_csv_lines —
    test/demo helper)."""
    cols = cols or df.columns
    return F.to_csv(F.struct(*[F.col(c) for c in cols]))
