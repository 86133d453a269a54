"""Simulates the driver's correctness gate: run every queries() entry at
sf0.001 and compare against oracle_sql() via duckdb (row count + sorted
value equality), rows-only for entries without SQL."""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    # ray Dataset
    return result.to_pandas()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            sample = next((v for v in df[col] if v is not None), None)
            if isinstance(sample, (list, tuple)) or hasattr(sample, "__array__"):
                df[col] = df[col].map(
                    lambda v: None if v is None else tuple(np_round_list(v))
                )
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def np_round_list(v):
    import numpy as np

    a = np.asarray(v, dtype=np.float64)
    return np.round(a, 5).tolist()


def compare(df_a: pd.DataFrame, df_b: pd.DataFrame, name: str):
    assert len(df_a) == len(df_b), f"{name}: rows {len(df_a)} vs {len(df_b)}"
    assert sorted(df_a.columns) == sorted(df_b.columns), (
        f"{name}: cols {sorted(df_a.columns)} vs {sorted(df_b.columns)}"
    )
    a, b = normalize(df_a), normalize(df_b)
    for col in a.columns:
        ca, cb = a[col], b[col]
        if ca.dtype.kind == "f" or cb.dtype.kind == "f":
            import numpy as np

            assert np.allclose(
                ca.astype(float), cb.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True
            ), f"{name}.{col} float mismatch"
        elif ca.dtype == object:
            assert ca.astype(str).tolist() == cb.astype(str).tolist(), f"{name}.{col} mismatch"
        else:
            assert ca.tolist() == cb.tolist(), f"{name}.{col} mismatch"


def test_entry_smoke(entrymod):
    result = entrymod.entry()
    assert result.count() == 6000


def test_all_queries_against_oracles(entrymod, con):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without query"
    failures = []
    for name, fn in qs.items():
        try:
            got = to_df(fn(SF_DIR))
        except Exception as e:  # pragma: no cover
            failures.append(f"{name}: EXC {type(e).__name__}: {e}")
            continue
        if name in oracles:
            want = con.sql(oracles[name]).df()
            try:
                compare(got, want, name)
            except AssertionError as e:
                failures.append(str(e))
        else:
            assert got is not None and len(got) >= 0
    assert not failures, "\n".join(failures)
