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


# -- round-4 high-effort encoder review ---------------------------------

def test_byte_stream_split_narrow_ints_roundtrip():
    from hyparquet_writer_ray.core.types import Encoding

    for typ, vals in [(pa.int16(), [1, -5, 300, None]),
                      (pa.uint8(), [0, 255, 7, None]),
                      (pa.uint32(), [0, 2**32 - 1, 9, None])]:
        t = pa.table({"x": pa.array(vals, typ)})
        assert_roundtrip(t, WriteOptions(column_specs={
            "x": ColumnSpec(encoding=Encoding.BYTE_STREAM_SPLIT)}))


def test_nested_null_under_non_nullable_field_raises():
    f = pa.field("v", pa.int64(), nullable=False)
    sa = pa.StructArray.from_arrays([pa.array([1, None, 3], pa.int64())],
                                    fields=[f])
    with pytest.raises(ValueError, match="non-nullable"):
        write_table_to_bytes(pa.table({"s": sa}))


def test_reader_handles_bit_width_zero_dictionary():
    from hyparquet_writer_ray.core.reader import read_byte_array_column

    t = pa.table({"s": pa.array(["zz"] * 30)})  # 1-entry dictionary
    buf = write_table_to_bytes(t, WriteOptions(page_size=64))
    assert read_byte_array_column(buf, "s") == [b"zz"] * 30


def test_fsst_rejected_on_nested_leaves():
    t = pa.table({"l": pa.array([["a", "b"], ["c"]],
                                pa.list_(pa.string()))})
    with pytest.raises(ValueError, match="flat"):
        write_table_to_bytes(t, WriteOptions(column_specs={
            "l.list.element": ColumnSpec(fsst=True)}))


def test_variant_tz_aware_timestamp_type12_roundtrip():
    import datetime

    from hyparquet_writer_ray.core import variant as V

    aware = datetime.datetime(2020, 1, 1, 12, 0,
                              tzinfo=datetime.timezone.utc)
    naive = datetime.datetime(2020, 1, 1, 12, 0)
    b_aware = V.write_value(aware, {})
    b_naive = V.write_value(naive, {})
    assert b_aware[0] >> 2 == 12  # timestamp micros, UTC-adjusted
    assert b_naive[0] >> 2 == 13  # NTZ


def test_variant_shredding_falls_back_on_unfit_values():
    from hyparquet_writer_ray.core.variant import variant_column

    # out-of-range INT32 and float64-inexact DOUBLE must go to the
    # untyped value field instead of crashing the arrow cast
    variant_column([{"a": 2**40}, {"a": 5}], shredding={"a": "INT32"})
    variant_column([{"a": 2**53 + 1}], shredding={"a": "DOUBLE"})


def test_dictionary_chunk_pages_sized_by_index_bytes():
    # 100k highly repetitive strings (~900 KB raw, ~11 KB of dict
    # indices): sizing pages from raw value bytes would cut ~200
    # near-empty pages whose headers/stats dominate the file
    t = pa.table({"s": pa.array([f"value-{i % 50:02d}"
                                 for i in range(100_000)])})
    buf = assert_roundtrip(t, WriteOptions(page_size=4096))
    assert len(buf) < 30_000  # was ~6x larger with raw-byte page sizing


# -- round-4 sixth review pass (footer/bloom/stats/geo/fsst) -------------

def test_all_nan_float_stats_omitted():
    from hyparquet_writer_ray.core.statistics import compute_statistics
    from hyparquet_writer_ray.core.types import ParquetType, SchemaElement

    nan = float("nan")
    st = compute_statistics(pa.array([nan, nan, nan], pa.float64()),
                            SchemaElement(name="x", type=ParquetType.DOUBLE))
    assert st.min_bytes is None and st.max_bytes is None  # never inf/-inf
    st16 = compute_statistics(
        pa.array(np.array([nan, nan], np.float16), pa.float16()),
        SchemaElement(name="h", type=ParquetType.FIXED_LEN_BYTE_ARRAY,
                      type_length=2))
    assert st16.min_bytes is None and st16.max_bytes is None


def test_bloom_probe_wrong_type_against_string_column_raises(tmp_path):
    from hyparquet_writer_ray.core.bloom import bloom_might_contain

    t = pa.table({"s": pa.array(["5", "6"])})
    p = str(tmp_path / "s.parquet")
    write_table(t, p, WriteOptions(column_specs={"s": ColumnSpec(bloom_filter=True)}))
    # bytes(5) would hash five ZERO bytes -> false "definitely absent"
    with pytest.raises(TypeError, match="str/bytes"):
        bloom_might_contain(p, "s", 5)
    assert bloom_might_contain(p, "s", "5") == [True]


def test_geo_nested_geometrycollection_bbox():
    from hyparquet_writer_ray.core.geo import (
        geojson_to_wkb, geospatial_statistics,
    )

    gc = {"type": "GeometryCollection", "geometries": [
        {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [9, 9]}]},
        {"type": "Point", "coordinates": [1, 1]},
    ]}
    st = geospatial_statistics([geojson_to_wkb(gc)])
    assert (st.xmin, st.ymin, st.xmax, st.ymax) == (1, 1, 9, 9)


def test_geo_xym_classified_and_roundtripped():
    import struct

    from hyparquet_writer_ray.core.geo import (
        geojson_to_wkb, geospatial_statistics, wkb_to_geojson,
    )

    # WKB POINT M (code 2001), coords (1, 2, 5)
    wkb = b"\x01" + struct.pack("<I", 2001) + struct.pack("<3d", 1, 2, 5)
    geom, _ = wkb_to_geojson(wkb)
    assert geom.get("m_only") is True
    assert geojson_to_wkb(geom) == wkb  # roundtrip keeps the 2xxx code
    st = geospatial_statistics([wkb])
    assert st.geospatial_types == [2001]  # not misfiled as XYZ 1001
    assert (st.mmin, st.mmax) == (5.0, 5.0)
    assert st.zmin is None and st.zmax is None


def test_fsst_saturated_alphabet_keeps_multibyte_symbols():
    from hyparquet_writer_ray.core import fsst as F

    sample = bytes(range(256)) * 4 + b"hello world! " * 600
    table = F.train(sample)
    assert any(len(s) > 1 for s in table.symbols)  # multis survive
    data = b"hello world! " * 200
    comp = F.compress(data, table)
    assert len(comp) < len(data)  # actually compresses
    assert F.decompress(comp, table) == data


def test_geography_algorithm_name_maps_to_enum():
    from hyparquet_writer_ray.core.footer import logical_type_thrift
    from hyparquet_writer_ray.core.types import LogicalType

    out = logical_type_thrift(
        LogicalType("GEOGRAPHY", {"crs": None, "algorithm": "SPHERICAL"}))
    assert out[18][2] == 0  # EdgeInterpolationAlgorithm.SPHERICAL enum
    with pytest.raises(ValueError, match="algorithm"):
        logical_type_thrift(
            LogicalType("GEOGRAPHY", {"crs": None, "algorithm": "BOGUS"}))
