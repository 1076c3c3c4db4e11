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


def read_parquet_evolving(
    spark: SparkSession, *paths: str, expected: T.StructType | None = None
) -> DataFrame:
    """Parquet scan across files written under EVOLVING schemas
    (columns added over time — the normal life of a long-lived corpus
    directory): ``mergeSchema`` unions the per-file schemas, files
    missing a column yield NULLs for it.

    Schema evolution is read-side only and metadata-bounded (footers,
    not data, are merged), so this scales to any file count; pass
    ``expected`` to pin the output column set/order regardless of which
    files happen to be present (missing columns materialize as typed
    NULL literals — schema-on-read stays declared, per SURVEY §1.3).
    """
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if expected is not None:
        cols = [
            F.col(f.name).cast(f.dataType)
            if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in expected.fields
        ]
        df = df.select(*cols)
    return df


def read_json_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSON scan that ROUTES malformed lines instead of dropping them:
    returns ``(good, bad)`` where ``bad`` carries the raw offending
    line — the file-source analog of the Kafka path's bad-frame
    dead-letter policy (sources/kafka.py), so ingest errors are
    auditable rather than silent.

    PERMISSIVE mode + an explicit corrupt-record column; the split is
    two filters over one scan (Catalyst reuses the source)."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    # cache() is load-bearing, not an optimization: Spark disallows
    # querying ONLY the internal corrupt-record column from a raw file
    # scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    # documented pattern is to materialize the parsed frame first. Both
    # splits then read the one cached scan.
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = parsed.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    bad_rows: str = "drop",
    **options,
) -> DataFrame:
    """JSON-lines scan with declared schema and the same bad-row
    policy surface as ``read_csv`` — 'drop' (DROPMALFORMED),
    'permissive' (nulls for broken fields), 'fail' (FAILFAST).
    Schema stays declared (no sampling inference pass over 100 TB);
    line-delimited JSON splits by newline, so the scan parallelizes
    like CSV."""
    return (
        spark.read.schema(schema)
        .option("mode", _MODES[bad_rows])
        .options(**options)
        .json(path)
    )


def parse_json_lines(
    df: DataFrame,
    line_col: str,
    schema: T.StructType,
    bad_rows: str = "drop",
) -> DataFrame:
    """Parse raw JSON text lines already in a column (the Kafka-value
    path and the testable in-engine path — mirror of
    ``parse_csv_lines``). Malformed lines land in a corrupt-record
    column: 'drop' filters them, 'permissive' keeps them with null
    fields."""
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType(), True)]
    )
    parsed = df.select(
        F.from_json(
            F.col(line_col),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    ).select("r.*")
    if bad_rows == "drop":
        parsed = parsed.filter(F.col("_corrupt").isNull())
    return parsed.drop("_corrupt")


def read_jsonl_stream(
    spark: SparkSession,
    directory: str,
    schema: T.StructType,
    **options,
) -> DataFrame:
    """Bounded JSON-lines file stream (trigger(availableNow=True) for
    bounded-source semantics; DROPMALFORMED skips bad lines)."""
    return (
        spark.readStream.schema(schema)
        .option("mode", "DROPMALFORMED")
        .options(**options)
        .json(directory)
    )


def parse_fixed_width(
    lines: DataFrame,
    layout: list[tuple[str, int, int, str]],
    text_col: str = "value",
    bad_rows: str = "drop",
) -> DataFrame:
    """Column-level fixed-width parser over a text-line DataFrame —
    the mainframe/EDI layout family (each field is (name, 1-based
    start, width, spark-type)).

    Slicing is ``substring`` + ``trim`` + ``try_cast`` — all JVM column
    expressions, no UDF. A row is bad when it is shorter than the
    layout requires or any non-string cast fails; the policy mirrors
    the CSV family: ``drop`` filters them, ``permissive`` keeps them
    with nulls plus a ``_corrupt`` flag, ``fail`` raises at parse time
    via a strict cast.
    """
    if bad_rows not in ("drop", "permissive", "fail"):
        raise ValueError(f"bad_rows: {bad_rows!r}")
    t = F.col(text_col)
    need = max(start + width - 1 for _, start, width, _ in layout)
    cols = []
    ok = F.length(t) >= F.lit(need)
    for name, start, width, typ in layout:
        raw = F.trim(F.substring(t, start, width))
        if typ == "string":
            cols.append(raw.alias(name))
        else:
            cast = raw.cast(typ) if bad_rows == "fail" else raw.try_cast(typ)
            cols.append(cast.alias(name))
            ok = ok & (cast.isNotNull() | (raw == ""))
    parsed = lines.select(*cols, ok.alias("_ok"))
    if bad_rows == "drop":
        return parsed.filter(F.col("_ok")).drop("_ok")
    if bad_rows == "permissive":
        return parsed.withColumnRenamed("_ok", "_valid")
    return parsed.drop("_ok")


def read_fixed_width(
    spark: SparkSession,
    path: str,
    layout: list[tuple[str, int, int, str]],
    bad_rows: str = "drop",
) -> DataFrame:
    """Fixed-width file source: ``spark.read.text`` (splittable,
    whole-file parallel) piped through :func:`parse_fixed_width`."""
    return parse_fixed_width(
        spark.read.text(path), layout, "value", bad_rows
    )
