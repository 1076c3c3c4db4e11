"""Capture .explain("formatted") for a set of declared queries into
plans/<tag>/<key>_<suffix>.txt (the optimization-round evidence files).

Usage:
    python scripts/capture_plans.py <tag> <suffix> key1,key2,...
    python scripts/capture_plans.py r11 before llm_dedup_containment

Uses a plain driver-style session (no get_spark) so the captured plan
is the one the round driver would execute.
"""
import contextlib
import io
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1]
SUFFIX = sys.argv[2]
KEYS = sys.argv[3].split(",")
SF = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"

if os.environ.get("PLAN_SESSION") == "bench":
    # Bench-shaped session (streaming_demos_spark.session.get_spark):
    # shows the plan the BENCH executes, including session-level
    # optimizer settings (e.g. the InferFiltersFromGenerate exclusion)
    # that a plain driver session does not carry.
    from streaming_demos_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
else:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E  # noqa: E402

Q = E.queries()
outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "plans", TAG)
os.makedirs(outdir, exist_ok=True)
for key in KEYS:
    df = Q[key](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    path = os.path.join(outdir, f"{key}_{SUFFIX}.txt")
    with open(path, "w") as fh:
        fh.write(text)
    n_ex = text.count("Exchange")
    n_reuse = text.count("ReusedExchange")
    n_py = text.count("EvalPython") + text.count("MapInArrow") + text.count("MapInPandas")
    print(f"{key}: exchanges={n_ex} (reused={n_reuse}) python_stages={n_py} -> {path}")
