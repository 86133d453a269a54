"""Regression tests for the round-4 core review findings: narrow-int
bloom hashing, time32[s] conversion, decimal256 handling, duplicate
column names, stats truncation/float16 zero rules, forced dictionary
encoding, unsigned bloom probes, and nullability preservation."""
from __future__ import annotations

import io
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import assert_roundtrip
from hyparquet_writer_ray import ColumnSpec, WriteOptions, write_table, write_table_to_bytes


# -- bloom: narrow integer dtypes hash their 4/8-byte PLAIN encoding --

@pytest.mark.parametrize("typ,vals", [
    (pa.int16(), [-3, 7, 1200, -32768, 32767]),
    (pa.int8(), [-128, 0, 5, 127]),
    (pa.uint16(), [0, 9, 65535]),
    (pa.uint8(), [0, 255, 17]),
    (pa.uint32(), [0, 1, 2**32 - 1]),  # stored as INT64
])
def test_bloom_narrow_int_columns_probe_true_for_present(tmp_path, typ, vals):
    from hyparquet_writer_ray.core.bloom import bloom_might_contain

    t = pa.table({"x": pa.array(vals, typ)})
    p = str(tmp_path / "n.parquet")
    write_table(t, p, WriteOptions(column_specs={"x": ColumnSpec(bloom_filter=True)}))
    for v in vals:
        assert bloom_might_contain(p, "x", v) == [True], (typ, v)


def test_bloom_uint64_high_bit_probe_no_overflow(tmp_path):
    from hyparquet_writer_ray.core.bloom import bloom_might_contain

    hi = 2**63 + 5
    t = pa.table({"x": pa.array([1, 2, hi], pa.uint64())})
    p = str(tmp_path / "u.parquet")
    write_table(t, p, WriteOptions(column_specs={"x": ColumnSpec(bloom_filter=True)}))
    assert bloom_might_contain(p, "x", hi) == [True]
    assert bloom_might_contain(p, "x", 1) == [True]


# -- schema normalization ---------------------------------------------

def test_time32_seconds_values_convert_to_millis():
    t = pa.table({"t": pa.array([3661, 0, None, 86399], pa.time32("s"))})
    buf = write_table_to_bytes(t)
    got = pq.read_table(io.BytesIO(buf))
    assert got.column("t").to_pylist() == t.column("t").to_pylist()


def test_decimal256_narrow_precision_roundtrips_as_decimal128():
    from decimal import Decimal

    t = pa.table({"d": pa.array(
        [Decimal("12345.67"), None, Decimal("-0.01")], pa.decimal256(20, 2))})
    buf = write_table_to_bytes(t)
    got = pq.read_table(io.BytesIO(buf))
    assert got.column("d").cast(pa.decimal256(20, 2)).to_pylist() == \
        t.column("d").to_pylist()


def test_decimal256_wide_precision_rejected():
    from decimal import Decimal

    t = pa.table({"d": pa.array([Decimal(10**39)], pa.decimal256(40, 0))})
    with pytest.raises(TypeError, match="decimal256"):
        write_table_to_bytes(t)


def test_nested_decimal256_rejected_not_corrupted():
    from decimal import Decimal

    t = pa.table({"d": pa.array([[Decimal(10**39)]],
                                pa.list_(pa.decimal256(40, 0)))})
    with pytest.raises(TypeError):
        write_table_to_bytes(t)


def test_non_nullable_field_stays_required_after_normalization():
    f = pa.field("ts", pa.timestamp("s"), nullable=False)
    t = pa.table([pa.array([1, 2, 3], pa.timestamp("s"))], schema=pa.schema([f]))
    buf = write_table_to_bytes(t)
    got_schema = pq.read_schema(io.BytesIO(buf))
    assert got_schema.field("ts").nullable is False


def test_duplicate_column_names_rejected():
    t = pa.Table.from_arrays(
        [pa.array([1, 2]), pa.array([10, 20])], names=["x", "x"])
    with pytest.raises(ValueError, match="duplicate"):
        write_table_to_bytes(t)


# -- statistics --------------------------------------------------------

def test_stats_max_truncation_all_ff_falls_back_to_exact():
    from hyparquet_writer_ray.core.statistics import _serialize
    from hyparquet_writer_ray.core.types import ParquetType, SchemaElement

    el = SchemaElement(name="b", type=ParquetType.BYTE_ARRAY)
    data = b"\xff" * 20
    out, exact = _serialize(data, el, True)
    assert out == data  # untruncated exact value, never b""
    # and the written file's page index stays readable + value-correct
    vals = [b"\xff" * 20 + bytes([i]) for i in range(40)] + [b"a"]
    t = pa.table({"b": pa.array(vals, pa.binary())})
    assert_roundtrip(t, WriteOptions(page_size=64))


def test_float16_zero_stats_signed_zero_rule():
    t = pa.table({"h": pa.array(
        np.array([0.0, 5.0], np.float16), pa.float16())})
    buf = write_table_to_bytes(t)
    st = pq.ParquetFile(io.BytesIO(buf)).metadata.row_group(0).column(0).statistics
    lo = float(np.frombuffer(st.min, np.float16)[0])  # raw FLBA(2) bytes
    hi = float(np.frombuffer(st.max, np.float16)[0])
    assert math.copysign(1.0, lo) == -1.0  # min zero -> -0.0
    assert lo == 0.0 and hi == 5.0


# -- forced dictionary encoding ----------------------------------------

def test_forced_rle_dictionary_high_cardinality_roundtrips():
    # >50% distinct would fail the auto heuristic; an explicit request
    # must still produce a dictionary-encoded, decodable chunk
    t = pa.table({"s": pa.array([f"v{i}" for i in range(500)])})
    opts = WriteOptions(column_specs={"s": ColumnSpec(encoding=None)})
    from hyparquet_writer_ray.core.types import Encoding

    opts = WriteOptions(
        column_specs={"s": ColumnSpec(encoding=Encoding.RLE_DICTIONARY)})
    buf = assert_roundtrip(t, opts)
    col = pq.ParquetFile(io.BytesIO(buf)).metadata.row_group(0).column(0)
    assert "RLE_DICTIONARY" in str(col.encodings)


def test_forced_rle_dictionary_on_boolean_raises():
    from hyparquet_writer_ray.core.types import Encoding

    t = pa.table({"b": pa.array([True, False] * 10)})
    opts = WriteOptions(
        column_specs={"b": ColumnSpec(encoding=Encoding.RLE_DICTIONARY)})
    with pytest.raises(TypeError, match="BOOLEAN"):
        write_table_to_bytes(t, opts)
