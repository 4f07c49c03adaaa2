"""Local twin of the driver's correctness gate: run every registered query
on Spark AND its DuckDB oracle at sf0.01; compare row count, column names,
and an order-insensitive multiset of stringified row values."""

import math
import os

import duckdb
import pytest

from bioie_llm_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.4f}"
    return str(v)


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _spark_rows(df):
    cols = df.columns
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return cols, rows


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


ORACLE_CASES = sorted(
    (name, fn, sql) for name, (fn, sql) in REGISTRY.items() if sql is not None
)


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, name, fn, sql):
    s_cols, s_rows = _spark_rows(fn(spark, SF_DIR))
    d_cols, d_rows = _duck(sql)
    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)}"
    sm, dm = _multiset(s_cols, s_rows), _multiset(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b]
    assert not mism, f"{name}: first mismatch {sm[mism[0]]!r} vs {dm[mism[0]]!r}"
