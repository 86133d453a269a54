"""Statistics + page-index tests (reference test/write.statistics.test.js,
test/write.pageindex.test.js; truncation src/unconvert.js:126-171)."""
from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq

from conftest import assert_roundtrip
from hyparquet_writer_ray import WriteOptions
from hyparquet_writer_ray.core.statistics import truncate_statistic
from hyparquet_writer_ray.core.thrift import CompactReader


def md_of(buf):
    return pq.ParquetFile(io.BytesIO(buf)).metadata


def test_int_stats():
    t = pa.table({"x": pa.array([5, -3, 9, None], type=pa.int32())})
    st = md_of(assert_roundtrip(t)).row_group(0).column(0).statistics
    assert (st.min, st.max, st.null_count) == (-3, 9, 1)


def test_string_stats():
    t = pa.table({"s": ["banana", "apple", "cherry"]})
    st = md_of(assert_roundtrip(t)).row_group(0).column(0).statistics
    assert (st.min, st.max) == ("apple", "cherry")


def test_long_string_truncation():
    long_min = "a" * 40
    long_max = "z" * 40
    t = pa.table({"s": [long_min, long_max]})
    st = md_of(assert_roundtrip(t)).row_group(0).column(0).statistics
    assert st.min == "a" * 16  # prefix is a valid lower bound
    assert st.max == "z" * 15 + "{"  # rounded up: last byte incremented
    assert st.max > long_max[:16] or st.max >= long_max[:15]


def test_truncate_statistic_unit():
    assert truncate_statistic(b"a" * 10, False) == b"a" * 10
    assert truncate_statistic(b"a" * 20, False) == b"a" * 16
    assert truncate_statistic(b"a" * 20, True) == b"a" * 15 + b"b"
    # trailing 0xff dropped before increment
    assert truncate_statistic(b"a" * 15 + b"\xff" * 5, True) == b"a" * 14 + b"b"
    # all 0xff: no upper bound representable
    assert truncate_statistic(b"\xff" * 20, True) is None


def test_stats_disabled():
    t = pa.table({"x": pa.array([1, 2], type=pa.int32())})
    st = md_of(assert_roundtrip(t, WriteOptions(statistics=False))).row_group(0).column(0)
    assert st.statistics is None or not st.is_stats_set


def test_signed_zero_normalization():
    t = pa.table({"d": pa.array([0.0, -0.0])})
    buf = assert_roundtrip(t)
    st = md_of(buf).row_group(0).column(0).statistics
    import struct as s

    # raw footer bytes: min must be -0.0, max +0.0
    assert st.min == 0.0 and st.max == 0.0


def _read_footer(buf):
    flen = int.from_bytes(buf[-8:-4], "little")
    r = CompactReader(buf[-8 - flen : -8])
    return r.read_struct()


def test_column_and_offset_index_written():
    t = pa.table({"i": pa.array(range(5000), type=pa.int32())})
    buf = assert_roundtrip(t, WriteOptions(page_size=1024, row_group_size=(5000,)))
    fmeta = _read_footer(buf)
    chunk = fmeta[4][0][1][0]  # row_groups[0].columns[0]
    ci_off, ci_len = chunk[6], chunk[7]
    oi_off, oi_len = chunk[4], chunk[5]
    assert ci_len > 0 and oi_len > 0
    ci = CompactReader(buf[ci_off : ci_off + ci_len]).read_struct()
    # ColumnIndex: ascending boundary order for a sorted column
    assert ci[4] == 1  # ASCENDING
    assert len(ci[1]) == len(ci[2]) == len(ci[3])
    assert not any(ci[1])  # no null pages
    oi = CompactReader(buf[oi_off : oi_off + oi_len]).read_struct()
    pages = oi[1]
    assert pages[0][3] == 0  # first_row_index
    # page offsets must be increasing and point inside the file
    offs = [p[1] for p in pages]
    assert offs == sorted(offs) and offs[-1] < len(buf)
    # first page location = chunk data start
    md = md_of(buf)
    assert offs[0] == md.row_group(0).column(0).data_page_offset


def test_descending_boundary_order():
    t = pa.table({"i": pa.array(range(5000, 0, -1), type=pa.int32())})
    buf = assert_roundtrip(t, WriteOptions(page_size=1024))
    fmeta = _read_footer(buf)
    chunk = fmeta[4][0][1][0]
    ci = CompactReader(buf[chunk[6] : chunk[6] + chunk[7]]).read_struct()
    assert ci[4] == 2  # DESCENDING


def test_encoding_stats_emitted():
    t = pa.table({"s": pa.array(["a", "b"][i % 2] for i in range(500))})
    buf = assert_roundtrip(t)
    fmeta = _read_footer(buf)
    meta_data = fmeta[4][0][1][0][3]
    enc_stats = meta_data[13]
    # one DICTIONARY_PAGE entry + one DATA_PAGE_V2 entry
    page_types = {e[1] for e in enc_stats}
    assert 2 in page_types and 3 in page_types
