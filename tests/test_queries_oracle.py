"""Local replica of the driver's CORRECTNESS gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet dir,
then hold row-count, schema (column names) and EXACT values equal.

Exactness: float columns are compared bitwise (==), not approximately —
the driver's value-hash has no tolerance, so neither does this test.
Runs at sf0.001 for speed; the driver runs sf0.01 (same generators, bigger
rows — the arithmetic is scale-independent)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, con, name):
    from deepseek_ocr_api_rs_spark.operators.dedup import release_persisted

    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    got = _canon(q(spark, SF_DIR).toPandas())
    release_persisted()  # free operator-persisted intermediates per query
    if name not in oracles:
        assert len(got) >= 0  # rows-only check (driver's weaker path)
        return
    exp = _canon(con.execute(oracles[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"schema mismatch: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g):
            same = (g.values == e.values) | (np.isnan(g.values) & np.isnan(e.values))
            assert same.all(), f"{name}.{c}: {g.values[~same][:3]} vs {e.values[~same][:3]}"
        else:
            mism = g.values != e.values
            assert not mism.any(), f"{name}.{c}: {g.values[mism][:3]} vs {e.values[mism][:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.schema.simpleString()  # stable schema resolvable
