"""Driver-style oracle proof for the round-11 keys (staged in r10
while the surface was frozen at 337; REGISTERED in r11 via
__spark_entry__._r11_queries / _r11_oracle_sqls). Same md5 value-hash
comparison the round driver runs, at sf0.001 so the suite stays fast —
these keys entered the registry already locally driver-green.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
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
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", sorted(E._r11_queries()))
def test_r11_key_hash_matches_oracle(spark, ddb, key):
    qdf = E.queries()[key](spark, SF)
    sdata = [tuple(r) for r in qdf.collect()]
    rel = ddb.sql(E.oracle_sql()[key])
    dcols = [d[0] for d in rel.description]
    ddata = rel.fetchall()
    assert len(sdata) == len(ddata), (key, len(sdata), len(ddata))
    assert len(sdata) > 0, key
    assert _vhash(qdf.columns, sdata) == _vhash(dcols, ddata), key
