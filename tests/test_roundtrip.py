"""End-to-end write -> independent-reader decode tests.

Mirrors the reference test strategy (SURVEY.md §5): decoded-data
equality through independent readers (pyarrow + duckdb), per-feature
fixtures from FIXTURES.md F1-F3.
"""
from __future__ import annotations

import datetime
import decimal
import glob
import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import assert_roundtrip, duckdb_roundtrip
from hyparquet_writer_ray import WriteOptions

TESTDATA = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))


@pytest.mark.parametrize("path", TESTDATA, ids=[p.split("/")[-1] for p in TESTDATA])
def test_testdata_tables(path):
    table = pq.read_table(path)
    assert_roundtrip(table)


def test_basic_types_f1():
    t = pa.table({
        "bool": pa.array([True, False, True, False]),
        "int": pa.array([0, 127, 0x7FFF, 0x7FFFFFFF], type=pa.int32()),
        "bigint": pa.array([0, 127, 0x7FFF, 2**63 - 1], type=pa.int64()),
        "float": pa.array([0, 0.0001, 123.456, 1e38], type=pa.float32()),
        "double": pa.array([0, 0.0001, 123.456, 1e100]),
        "string": pa.array(["a", "b", "c", "d"]),
        "nullable": pa.array([True, False, None, None]),
    })
    assert_roundtrip(t)
    duckdb_roundtrip(t)


def test_nulls_every_third():
    vals = [None if i % 3 == 0 else i for i in range(1000)]
    t = pa.table({
        "i": pa.array(vals, type=pa.int32()),
        "s": pa.array([None if v is None else f"s{v % 5}" for v in vals]),
    })
    assert_roundtrip(t, WriteOptions(page_size=256))


def test_all_null_column():
    t = pa.table({"x": pa.array([None] * 10, type=pa.string())})
    assert_roundtrip(t)


def test_zero_rows():
    t = pa.table({"i": pa.array([], type=pa.int32()), "s": pa.array([], type=pa.string())})
    buf = assert_roundtrip(t)
    md = pq.ParquetFile(io.BytesIO(buf)).metadata
    assert md.num_rows == 0


def test_special_floats_bitwise():
    t = pa.table({"d": pa.array([float("nan"), float("inf"), float("-inf"), 0.0, -0.0])})
    from hyparquet_writer_ray import write_table_to_bytes

    buf = write_table_to_bytes(t)
    got = pq.read_table(io.BytesIO(buf))
    a = np.array(t.column("d"), dtype=np.float64).view(np.int64)
    b = np.array(got.column("d"), dtype=np.float64).view(np.int64)
    assert (a == b).all()
    # NaN excluded from stats; ±inf kept
    st = pq.ParquetFile(io.BytesIO(buf)).metadata.row_group(0).column(0).statistics
    assert st.min == float("-inf") and st.max == float("inf")


def test_row_group_schedule():
    t = pa.table({"i": pa.array([7] * 250000, type=pa.int32())})
    buf = assert_roundtrip(t)
    md = pq.ParquetFile(io.BytesIO(buf)).metadata
    rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
    assert rows == [1000, 100000, 100000, 49000]  # src/write.js:23 schedule


def test_custom_row_group_schedule():
    t = pa.table({"i": pa.array(range(100), type=pa.int32())})
    buf = assert_roundtrip(t, WriteOptions(row_group_size=(20, 50)))
    md = pq.ParquetFile(io.BytesIO(buf)).metadata
    rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
    assert rows == [20, 50, 30]


def test_multipage():
    t = pa.table({"i": pa.array(range(1000), type=pa.int32())})
    assert_roundtrip(t, WriteOptions(page_size=100))
    assert_roundtrip(t, WriteOptions(page_size=4))


def test_logical_types():
    t = pa.table({
        "dec": pa.array(
            [decimal.Decimal("1.23"), decimal.Decimal("-99.99"), None],
            type=pa.decimal128(9, 2),
        ),
        "f16": pa.array(np.array([1.5, -2.0, 0.0], dtype=np.float16)),
        "date": pa.array([datetime.date(2020, 1, 1), datetime.date(1969, 12, 31), None]),
        "flb": pa.array([b"abcd", b"efgh", None], type=pa.binary(4)),
        "time": pa.array([datetime.time(1, 2, 3), None, None], type=pa.time64("us")),
    })
    assert_roundtrip(t)


def test_unsigned_ints():
    t = pa.table({
        "u8": pa.array([0, 255, None], type=pa.uint8()),
        "u32": pa.array([0, 2**32 - 1, None], type=pa.uint32()),
        "u64": pa.array([0, 2**64 - 1, None], type=pa.uint64()),
        "i16": pa.array([-(2**15), 2**15 - 1, None], type=pa.int16()),
    })
    assert_roundtrip(t)


def test_timestamps_units():
    t = pa.table({
        "ms": pa.array([1, 2, None], type=pa.timestamp("ms")),
        "us": pa.array([1, 2, None], type=pa.timestamp("us")),
        "ns": pa.array([1, 2, None], type=pa.timestamp("ns")),
        "tz": pa.array([1, 2, None], type=pa.timestamp("us", tz="UTC")),
    })
    assert_roundtrip(t)


def test_binary_and_large_string():
    t = pa.table({
        "b": pa.array([b"\x00\x01", b"", None], type=pa.binary()),
        "ls": pa.array(["x" * 100, "", None], type=pa.large_string()),
    })
    # large_string reads back as string; compare values
    from hyparquet_writer_ray import write_table_to_bytes

    buf = write_table_to_bytes(t)
    got = pq.read_table(io.BytesIO(buf))
    assert got.column("b").to_pylist() == t.column("b").to_pylist()
    assert got.column("ls").to_pylist() == t.column("ls").to_pylist()


def test_write_rows_streaming():
    from hyparquet_writer_ray import write_rows

    rows = ({"a": i, "b": f"row{i}"} for i in range(2500))
    sink = io.BytesIO()
    write_rows(rows, sink, opts=WriteOptions(row_group_size=(1000,)))
    got = pq.read_table(io.BytesIO(sink.getvalue()))
    assert got.num_rows == 2500
    assert got.column("a").to_pylist() == list(range(2500))
    md = pq.ParquetFile(io.BytesIO(sink.getvalue())).metadata
    assert md.num_row_groups == 3


def test_write_rows_empty():
    from hyparquet_writer_ray import write_rows

    sink = io.BytesIO()
    write_rows([], sink, schema=pa.schema([("a", pa.int64())]))
    got = pq.read_table(io.BytesIO(sink.getvalue()))
    assert got.num_rows == 0 and got.column_names == ["a"]


def test_kv_metadata():
    t = pa.table({"i": pa.array([1], type=pa.int32())})
    buf = assert_roundtrip(t, WriteOptions(kv_metadata=[("k1", "v1"), ("k2", "v2")]))
    md = pq.ParquetFile(io.BytesIO(buf)).metadata.metadata
    assert md[b"k1"] == b"v1" and md[b"k2"] == b"v2"


def test_schema_overrides_logical_types():
    import uuid

    from hyparquet_writer_ray import WriteOptions, write_table_to_bytes
    from hyparquet_writer_ray.core.types import (
        ConvertedType, LogicalType, ParquetType, SchemaElement,
    )

    t = pa.table({
        "id": pa.array([uuid.uuid4().bytes for _ in range(4)], type=pa.binary(16)),
        "cfg": pa.array(['{"a":1}', None, "{}", "[]"]),
    })
    opts = WriteOptions(schema_overrides={
        "id": SchemaElement("id", type=ParquetType.FIXED_LEN_BYTE_ARRAY,
                            type_length=16, logical_type=LogicalType("UUID")),
        "cfg": SchemaElement("cfg", type=ParquetType.BYTE_ARRAY,
                             converted_type=ConvertedType.JSON,
                             logical_type=LogicalType("JSON")),
    })
    buf = write_table_to_bytes(t, opts)
    f = pq.ParquetFile(io.BytesIO(buf))
    assert str(f.schema.column(0).logical_type) == "UUID"
    assert str(f.schema.column(1).logical_type) == "JSON"
    got = pq.read_table(io.BytesIO(buf))
    assert got.column("id").to_pylist() == t.column("id").to_pylist()
    assert [None if v is None else v for v in got.column("cfg").to_pylist()] == [
        None if v is None else v.encode() for v in t.column("cfg").to_pylist()
    ]


def test_schema_override_rejects_physical_change():
    from hyparquet_writer_ray import WriteOptions, write_table_to_bytes
    from hyparquet_writer_ray.core.types import LogicalType, ParquetType, SchemaElement

    t = pa.table({"x": pa.array([1, 2], type=pa.int64())})
    opts = WriteOptions(schema_overrides={
        "x": SchemaElement("x", type=ParquetType.INT32)
    })
    with pytest.raises(ValueError, match="physical type"):
        write_table_to_bytes(t, opts)
