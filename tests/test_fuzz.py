"""Property-based fuzz: random schemas x random data -> roundtrip
through pyarrow decode. The broad safety net over the whole writer."""
from __future__ import annotations

from decimal import Decimal

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


# -- deep nesting x rich scalars ------------------------------------
# list/struct/map wrapped 0-3 layers over timestamp/date/decimal/float32
# and the base scalars; exercises the Dremel level machinery across page
# boundaries (page_size=64 forces multi-page chunking on nested levels).
# Explored at 1000 examples during round 4 (all green); bounded here.

_rich_scalars = _scalar_types + [
    (pa.float32(), st.floats(allow_nan=False, width=32)),
    (pa.timestamp("us"), st.integers(-(2**52), 2**52)),
    (pa.date32(), st.integers(-(2**23), 2**23)),
    (pa.decimal128(9, 2), st.decimals(
        min_value=Decimal("-9999999.99"), max_value=Decimal("9999999.99"),
        places=2, allow_nan=False, allow_infinity=False)),
]


@st.composite
def deep_tables(draw):
    n_cols = draw(st.integers(1, 3))
    n_rows = draw(st.integers(0, 120))
    cols = {}
    for ci in range(n_cols):
        typ, vst = draw(st.sampled_from(_rich_scalars))
        vst = st.one_of(st.none(), vst)
        for _ in range(draw(st.integers(0, 3))):
            kind = draw(st.sampled_from(["list", "struct", "map"]))
            if kind == "list":
                typ = pa.list_(typ)
                vst = st.one_of(st.none(), st.lists(vst, max_size=3))
            elif kind == "struct":
                typ = pa.struct([pa.field("a", typ), pa.field("b", pa.int32())])
                vst = st.one_of(st.none(), st.fixed_dictionaries(
                    {"a": vst, "b": st.one_of(st.none(), st.integers(-1000, 1000))}))
            else:
                typ = pa.map_(pa.string(), typ)
                vst = st.one_of(st.none(), st.lists(
                    st.tuples(st.text(max_size=6), vst), max_size=3))
        vals = draw(st.lists(vst, min_size=n_rows, max_size=n_rows))
        cols[f"c{ci}"] = pa.array(vals, type=typ)
    return pa.table(cols)


@given(deep_tables(), st.sampled_from([None, 64]),
       st.sampled_from([None, "smart"]))
@settings(max_examples=40, deadline=None)
def test_fuzz_roundtrip_deep_nested(table, page_size, codec):
    kw = {}
    if page_size:
        kw["page_size"] = page_size
    if codec:
        kw["auto_codec"] = codec
        kw.setdefault("page_size", 512)
    assert_roundtrip(table, WriteOptions(**kw) if kw else None)
