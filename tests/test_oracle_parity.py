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
    """Fetch oracle rows the way the driver does — through Arrow — so type
    artifacts the driver would see (e.g. DuckDB typing ``sum(CASE ...)`` as
    HUGEINT, which Arrow renders decimal128 and stringifies ``3.0`` against
    Spark's bigint ``3``) fail HERE, not only in CORRECTNESS_r{N}.json.
    A plain ``fetchall()`` hid that class: HUGEINT -> Python int -> str()
    matched, while the driver's pandas/Arrow fetch diverged (round-3 red rows
    cur_paragraph_dedup / cur_contamination)."""
    import pyarrow.types as pat

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    tbl = con.execute(sql).arrow()
    con.close()
    bad = [
        (f.name, str(f.type))
        for f in tbl.schema
        if pat.is_decimal(f.type)
    ]
    assert not bad, (
        f"oracle result has DECIMAL/HUGEINT-typed columns {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT) (repo convention) — "
        "the driver's Arrow fetch stringifies these differently from Spark"
    )
    cols = tbl.schema.names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def _spark_rows(df):
    cols = df.columns
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return cols, rows


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def test_duck_fetch_rejects_hugeint():
    """Meta-test for the blind-spot fix: an uncast ``sum(CASE ...)`` (HUGEINT
    in DuckDB) must trip the schema guard, and the repo-convention CAST must
    pass it."""
    with pytest.raises(AssertionError, match="DECIMAL/HUGEINT"):
        _duck("SELECT sum(CASE WHEN r_regionkey >= 0 THEN 1 ELSE 0 END) AS x FROM region")
    cols, rows = _duck(
        "SELECT CAST(sum(CASE WHEN r_regionkey >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS x FROM region"
    )
    assert cols == ["x"] and isinstance(rows[0][0], int)


ORACLE_CASES = sorted(
    (name, fn, sql() if callable(sql) else sql)
    for name, (fn, sql) in REGISTRY.items()
    if sql is not None
)
ORACLE_CASES = [c for c in ORACLE_CASES if c[2] is not None]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, name, fn, sql):
    s_cols, s_rows = _spark_rows(fn(spark, SF_DIR))
    d_cols, d_rows = _duck(sql)
    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)}"
    sm, dm = _multiset(s_cols, s_rows), _multiset(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b]
    assert not mism, f"{name}: first mismatch {sm[mism[0]]!r} vs {dm[mism[0]]!r}"
