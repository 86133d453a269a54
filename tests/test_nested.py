"""Nested struct/list/map Dremel tests (FIXTURES.md F4;
reference test/write.struct.test.js, test/write.list.test.js)."""
from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import assert_roundtrip
from hyparquet_writer_ray import WriteOptions


def test_struct_with_nulls():
    t = pa.table({
        "s": pa.array(
            [{"a": 1, "b": "x"}, {"a": 2, "b": None}, None],
            type=pa.struct([("a", pa.int32()), ("b", pa.string())]),
        )
    })
    assert_roundtrip(t)


def test_struct_three_deep():
    typ = pa.struct([("l2", pa.struct([("l3", pa.int64())]))])
    t = pa.table({"s": pa.array([{"l2": {"l3": 5}}, {"l2": None}, None, {"l2": {"l3": None}}], type=typ)})
    assert_roundtrip(t)


def test_list_null_empty_values():
    t = pa.table({"l": pa.array([[1, 2], [], None, [3, None, 5]], type=pa.list_(pa.int64()))})
    assert_roundtrip(t)


def test_list_of_list():
    t = pa.table({"l": pa.array([[[1, 2], [3]], [], None, [None, [4]], [[]]], type=pa.list_(pa.list_(pa.int64())))})
    assert_roundtrip(t)


def test_list_of_struct():
    t = pa.table({"l": pa.array([[{"a": 1}, {"a": None}], None, []], type=pa.list_(pa.struct([("a", pa.int32())])))})
    assert_roundtrip(t)


def test_struct_of_list():
    t = pa.table({
        "s": pa.array([{"l": [1, 2]}, {"l": None}, None, {"l": []}],
                      type=pa.struct([("l", pa.list_(pa.int64()))]))
    })
    assert_roundtrip(t)


def test_map_of_struct():
    mt = pa.map_(pa.string(), pa.struct([("v", pa.int32())]))
    t = pa.table({"m": pa.array([[("k1", {"v": 1}), ("k2", {"v": None})], None, []], type=mt)})
    assert_roundtrip(t)


@pytest.mark.parametrize("kt", [pa.int32(), pa.int64(), pa.string()])
def test_map_key_types(kt):
    keys = [1, 2] if kt != pa.string() else ["a", "b"]
    t = pa.table({"m": pa.array([[(keys[0], 10), (keys[1], 20)], None], type=pa.map_(kt, pa.int64()))})
    assert_roundtrip(t)


def test_list_of_string_multipage():
    t = pa.table({
        "l": pa.array(
            [[f"w{i}-{j}" for j in range(i % 7)] or None for i in range(2000)],
            type=pa.list_(pa.string()),
        )
    })
    assert_roundtrip(t, WriteOptions(page_size=512))


def test_embedding_vectors():
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = [rng.normal(0, 1, 16).astype(np.float32).tolist() for _ in range(500)]
    t = pa.table({"embedding": pa.array(vecs, type=pa.list_(pa.float32()))})
    assert_roundtrip(t, WriteOptions(page_size=2048))


@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-1000, 1000)), max_size=5)),
        max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_random_optional_lists(vals):
    t = pa.table({"l": pa.array(vals, type=pa.list_(pa.int64()))})
    assert_roundtrip(t)
