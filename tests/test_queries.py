"""Local mirror of the driver's DuckDB-oracle gate: every queries() entry
runs at sf0.01 and must match its oracle_sql() twin on row count, column
names, and (order-insensitively) exact values."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST",
                        "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == object:
            pdf[c] = s.where(pd.notna(s), None)
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype(np.float64)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
    key = list(pdf.columns)
    return pdf.sort_values(key, na_position="last", kind="stable").reset_index(drop=True)


def assert_equal_frames(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv):
            ga = gv.to_numpy(dtype=np.float64)
            wa = wv.to_numpy(dtype=np.float64)
            both_nan = np.isnan(ga) & np.isnan(wa)
            exact = (ga == wa) | both_nan
            assert exact.all(), (
                f"{name}.{c}: {int((~exact).sum())} float mismatches; "
                f"first: {ga[~exact][:3]} vs {wa[~exact][:3]}")
        else:
            mism = ~(gv.eq(wv) | (gv.isna() & wv.isna()))
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches; "
                f"first got={gv[mism].head(3).tolist()} "
                f"want={wv[mism].head(3).tolist()}")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLES[name]).fetchdf()
    assert_equal_frames(got, want, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
