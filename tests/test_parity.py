"""Replicates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.01")


def _duck_conn():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(range(len(cols)), key=lambda i: cols[i]):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.fixture(scope="module")
def duck():
    con = _duck_conn()
    yield con
    con.close()


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, duck):
    got_df = QUERIES[name](spark, SF_DIR)
    got_cols = [c.lower() for c in got_df.columns]
    got = _norm([tuple(r) for r in got_df.collect()], got_cols)

    if name not in ORACLES:
        assert len(got) >= 0  # rows-only check
        return
    res = duck.execute(ORACLES[name])
    exp_cols = [d[0].lower() for d in res.description]
    exp = _norm(res.fetchall(), exp_cols)

    assert sorted(got_cols) == sorted(exp_cols), (got_cols, exp_cols)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert got == exp, f"{name}: value mismatch\n{got[:5]}\n{exp[:5]}"
