"""Property-based fuzz: random schemas x random data -> roundtrip
through pyarrow decode. The broad safety net over the whole writer."""
from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import assert_roundtrip
from hyparquet_writer_ray import WriteOptions

_scalar_types = [
    (pa.int32(), st.integers(-(2**31), 2**31 - 1)),
    (pa.int64(), st.integers(-(2**63), 2**63 - 1)),
    (pa.float64(), st.floats(allow_nan=False)),
    (pa.string(), st.text(max_size=20)),
    (pa.binary(), st.binary(max_size=20)),
    (pa.bool_(), st.booleans()),
]


@st.composite
def tables(draw):
    n_cols = draw(st.integers(1, 4))
    n_rows = draw(st.integers(0, 120))
    cols = {}
    for ci in range(n_cols):
        typ, value_st = draw(st.sampled_from(_scalar_types))
        nested = draw(st.integers(0, 2))
        if nested == 1:
            typ, value_st = pa.list_(typ), st.one_of(
                st.none(), st.lists(st.one_of(st.none(), value_st), max_size=4)
            )
        else:
            value_st = st.one_of(st.none(), value_st)
        vals = draw(st.lists(value_st, min_size=n_rows, max_size=n_rows))
        cols[f"c{ci}"] = pa.array(vals, type=typ)
    return pa.table(cols)


@given(tables(), st.sampled_from([None, 64, 1 << 20]))
@settings(max_examples=60, deadline=None)
def test_fuzz_roundtrip(table, page_size):
    opts = WriteOptions(page_size=page_size) if page_size else None
    assert_roundtrip(table, opts)


@given(tables())
@settings(max_examples=25, deadline=None)
def test_fuzz_roundtrip_smart(table):
    assert_roundtrip(table, WriteOptions(auto_codec="smart", page_size=512))
