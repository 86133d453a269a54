"""VARIANT binary format + shredding tests (reference
test/write.variant.test.js; FIXTURES.md F6)."""
from __future__ import annotations

import datetime
import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hyparquet_writer_ray import WriteOptions, write_table_to_bytes
from hyparquet_writer_ray.core import variant as V

MIXED = [
    None, True, False, 0, 127, -128, 30000, -(2**31), 2**31, 2**63 - 1,
    1.5, "short", "x" * 100, b"\x00\x01\x02",
    datetime.datetime(2024, 1, 2, 3, 4, 5),
    {"a": 1, "b": "two"}, [1, "two", None], {"nest": {"deep": [1, {"x": 2}]}},
    {}, [],
]


def _roundtrip_value(v):
    keys: set = set()
    V._collect_keys(v, keys)
    d = sorted(keys)
    ki = {k: i for i, k in enumerate(d)}
    meta = V.write_metadata(d)
    data = V.write_value(v, ki)
    return V.decode_variant(meta, data)


@pytest.mark.parametrize("v", MIXED, ids=[repr(v)[:25] for v in MIXED])
def test_value_roundtrip(v):
    got = _roundtrip_value(v)
    if isinstance(v, tuple):
        v = list(v)
    assert got == v


def test_metadata_sorted_and_bytes():
    meta = V.write_metadata(["a", "bb", "c"])
    assert V.read_metadata(meta) == ["a", "bb", "c"]
    # header: version 1, sorted bit, 1-byte offsets
    assert meta[0] == (1 | (1 << 4))


def test_short_vs_long_string_headers():
    assert V.write_value("hi", {})[0] == (2 << 2) | 1  # short: len in header
    long = V.write_value("z" * 100, {})
    assert long[0] == 16 << 2  # long string primitive


def test_int_width_selection():
    assert len(V.write_value(5, {})) == 2  # int8
    assert len(V.write_value(1000, {})) == 3  # int16
    assert len(V.write_value(100000, {})) == 5  # int32
    assert len(V.write_value(2**40, {})) == 9  # int64
    with pytest.raises(OverflowError):
        V.write_value(2**70, {})


def test_variant_column_in_file():
    vals = [
        {"a": 1, "b": "x"}, None, V.MISSING, [1, 2, {"c": True}], "plain", 42,
    ]
    col = V.variant_column(vals)
    t = pa.table({"v": col})
    opts = WriteOptions(kv_metadata=V.variant_kv_metadata(["v"]))
    buf = write_table_to_bytes(t, opts)
    got = pq.read_table(io.BytesIO(buf))
    struct_col = got.column("v").to_pylist()
    for orig, row in zip(vals, struct_col):
        if orig is V.MISSING:
            assert row is None
            continue
        decoded = V.decode_variant(row["metadata"], row["value"])
        assert decoded == orig
    md = pq.ParquetFile(io.BytesIO(buf)).metadata.metadata
    assert md[b"hpw.variant.columns"] == b"v"


def test_variant_spec_annotation_footer():
    """Spec-mode VARIANT LogicalType: footer carries union field 16
    (readable by variant-aware readers; pyarrow rejects unknown logical
    types so the compatible default is kv tagging)."""
    col = V.variant_column([{"a": 1}])
    t = pa.table({"v": col})
    opts = WriteOptions(schema_overrides={"v": V.variant_schema_override()})
    buf = write_table_to_bytes(t, opts)
    from hyparquet_writer_ray.core.thrift import CompactReader

    flen = int.from_bytes(buf[-8:-4], "little")
    fmeta = CompactReader(buf[-8 - flen : -8]).read_struct()
    v_el = next(e for e in fmeta[2] if e.get(4) == b"v")
    assert 16 in v_el[10]  # LogicalType union field 16 = VARIANT
    with pytest.raises(OSError):
        pq.read_table(io.BytesIO(buf))  # documented pyarrow limitation


def test_shredded_scalar_fields():
    vals = [
        {"id": 1, "name": "a"},
        {"id": 2, "name": "b", "extra": True},  # partial: extra -> binary value
        {"id": "not-an-int", "name": "c"},  # type mismatch -> binary fallback
        None,
    ]
    col = V.variant_column(vals, shredding={"id": "INT64", "name": "STRING"})
    t = pa.table({"v": col})
    opts = WriteOptions(kv_metadata=V.variant_kv_metadata(["v"]))
    buf = write_table_to_bytes(t, opts)
    rows = pq.read_table(io.BytesIO(buf)).column("v").to_pylist()
    assert rows[0]["typed_value"]["id"]["typed_value"] == 1
    assert rows[0]["typed_value"]["name"]["typed_value"] == "a"
    assert rows[0]["value"] is None
    # partial object: shredded fields typed, extra packed as binary value
    assert rows[1]["typed_value"]["id"]["typed_value"] == 2
    extra = V.decode_variant(rows[1]["metadata"], rows[1]["value"])
    assert extra == {"extra": True}
    # mismatch: id falls back to binary inside its field group
    bad = rows[2]["typed_value"]["id"]
    assert bad["typed_value"] is None
    assert V.decode_variant(rows[2]["metadata"], bad["value"]) == "not-an-int"
    # variant null row
    assert rows[3]["value"] == b"\x00"


def test_shredded_array():
    vals = [[1, 2, 3], [1, "two"], "not-a-list"]
    col = V.variant_column(vals, shredding=["INT64"])
    rows = col.to_pylist()
    assert [e["typed_value"] for e in rows[0]["typed_value"]] == [1, 2, 3]
    mixed = rows[1]["typed_value"]
    assert mixed[0]["typed_value"] == 1 and mixed[1]["typed_value"] is None
    assert rows[2]["typed_value"] is None and rows[2]["value"] is not None


def test_reserved_shredding_field_rejected():
    with pytest.raises(ValueError, match="reserved"):
        V.variant_column([{"value": 1}], shredding={"value": "INT64"})
