"""Mimics the driver's correctness gate: run every __spark_entry__.queries()
entry at sf0.01 and value-compare against its oracle_sql() via DuckDB
(row count + column names + exact values after column/row sort)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


ALL = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = normalize(q(spark, SF_DIR).toPandas())
    want = normalize(duck.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (name, len(got), len(want))
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float), rtol=0, atol=0, equal_nan=True), (name, c)
        else:
            assert (pd.Series(g).astype(str) == pd.Series(w).astype(str)).all(), (name, c)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames() == ["path", "score_r"]


def test_queries_without_oracle_run(spark):
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(entry_mod.oracle_sql())):
        assert qs[name](spark, SF_DIR).count() >= 0, name
