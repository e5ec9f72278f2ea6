"""Rehearsal of the driver's correctness gate: run each ``queries()`` entry
on Spark and its ``oracle_sql()`` mirror on DuckDB over the same parquet,
compare row counts + (column-sorted, row-sorted) values exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARC_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        except Exception:
            pass
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == np.int32:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


import __spark_entry__ as entry_mod

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = _duck(ORACLES[name])
    a, b = _normalize(spark_df), _normalize(duck_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs oracle {len(b)}"
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=0)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
