"""Standing regression test for the DRIVER's comparator path.

The round driver compares Spark and DuckDB results through pandas
frames (``toPandas()`` vs ``duckdb .df()``), which re-types what plain
python objects keep exact: HUGEINT floatifies (512 vs 512.0 — the
r4-r6 red class), raw DATE becomes midnight datetime64 on one side
only, NULL-bearing BOOLEAN renders None vs NaN, and list-valued cells
crash the sort outright (the r2 ``f_svd_embed`` error). The manual
gates (``scripts/oracle_check.py ORACLE_PANDAS=1`` and
``scripts/dtype_check.py``) police this, but only when someone runs
them; this test keeps one representative key per output-type class
green through the EXACT pandas bridge on every pytest run, so the next
type-class regression fails CI instead of a driver round.

Keys per class (all cheap at sf0.001):
  int         a1_a2_a9_dashboard_metrics  (count/sum/avg longs)
  float       ext_gini                    (rounded double ratios)
  string      f_scalar_strings
  ts_ntz      f_status_timestamps         (TIMESTAMP_NTZ outputs)
  date-string f_datetime_buckets          (day buckets as strings)
  bool        ext_data_quality            (non-null BOOLEAN flags)
"""

import hashlib
import math

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

CLASS_KEYS = [
    "a1_a2_a9_dashboard_metrics",
    "ext_gini",
    "f_scalar_strings",
    "f_status_timestamps",
    "f_datetime_buckets",
    "ext_data_quality",
]


def _norm(v):
    # the driver normalizer: floats rounded at 9dp, everything else str
    return (
        ("NaN" if math.isnan(v) else str(round(v, 9)))
        if isinstance(v, float)
        else str(v)
    )


def _vhash(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return hashlib.md5(
        str(sorted(tuple(_norm(r[i]) for i in order) for r in data)).encode()
    ).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", CLASS_KEYS)
def test_pandas_bridge_hash_match(spark, duck, key):
    import os

    os.environ["ORACLE_SF_DIR"] = SF_DIR
    import __spark_entry__ as E

    qdf = E.queries()[key](spark, SF_DIR)
    spdf = qdf.toPandas()  # the driver's Spark-side materialization
    sdata = [tuple(r) for r in spdf.itertuples(index=False)]
    rel = duck.sql(E.oracle_sql()[key])
    dcols = [d[0] for d in rel.description]
    ddf = rel.df()  # the driver's DuckDB-side materialization
    ddata = [tuple(r) for r in ddf.itertuples(index=False)]
    assert len(sdata) == len(ddata), f"{key}: row counts diverge"
    sh, dh = _vhash(list(spdf.columns), sdata), _vhash(dcols, ddata)
    assert sh == dh, (
        f"{key}: pandas-bridge hash mismatch — a type-class regression "
        f"(HUGEINT/DATE/nullable-bool/complex) has reached the driver "
        f"comparator path"
    )
