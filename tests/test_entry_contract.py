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

# override for per-round CI-style runs at bigger scale:
#   GRAFT_CONTRACT_SF_DIR=/root/testdata/sf0.1 pytest tests/test_entry_contract.py
SF_DIR = os.environ.get("GRAFT_CONTRACT_SF_DIR", "/root/testdata/sf0.001")
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


def to_arrow(result) -> pa.Table:
    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    # ray Dataset
    import ray

    refs = result.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows or len(refs) == 1]
    if not tables:
        tables = ray.get(refs)[:1]
    return pa.concat_tables(tables, promote_options="default")


def to_df(result) -> pd.DataFrame:
    return to_arrow(result).to_pandas()


def _norm_type(t: pa.DataType) -> pa.DataType:
    """Normalize representation-only differences that the driver's
    type-sensitive hash also normalizes (string offsets width, tz-less
    timestamp unit) while keeping semantic type differences (decimal vs
    int64, float vs int) fatal — that is the class of red VERDICT r2
    diagnosed."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_timestamp(t):
        return pa.timestamp("us", tz=t.tz)
    if pa.types.is_dictionary(t):
        return _norm_type(t.value_type)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return pa.list_(_norm_type(t.value_type))
    return t


def assert_schema_match(got: pa.Table, want: pa.Table, name: str):
    ga = {f.name: _norm_type(f.type) for f in got.schema}
    wa = {f.name: _norm_type(f.type) for f in want.schema}
    assert set(ga) == set(wa), (
        f"{name}: cols {sorted(ga)} vs {sorted(wa)}"
    )
    for col in sorted(ga):
        assert ga[col].equals(wa[col]), (
            f"{name}.{col}: arrow type {ga[col]} (query) vs {wa[col]} (oracle)"
        )


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
            got_t = to_arrow(fn(SF_DIR))
        except Exception as e:  # pragma: no cover
            failures.append(f"{name}: EXC {type(e).__name__}: {e}")
            continue
        if name in oracles:
            want_t = con.sql(oracles[name]).arrow()
            try:
                # type-faithful gate first: the driver's value hash is
                # type-sensitive, so decimal-vs-int64 etc. must fail HERE
                assert_schema_match(got_t, want_t, name)
                compare(got_t.to_pandas(), want_t.to_pandas(), name)
            except AssertionError as e:
                failures.append(str(e))
        else:
            assert got_t is not None and got_t.num_rows >= 0
    assert not failures, "\n".join(failures)
