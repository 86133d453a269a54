"""Value-based schema inference matrix for write_rows — mirrors the
reference's autoSchemaElement semantics (src/schema.js:173-241) and its
test matrix (test/schema.test.js, test/write.rows.test.js), plus the
async row source (src/write-rows.js:142-156)."""
from __future__ import annotations

import asyncio
import datetime
import io
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hyparquet_writer_ray.local import (
    auto_schema_from_rows,
    write_rows,
    write_rows_async,
)


def _write(rows, **kw) -> bytes:
    sink = io.BytesIO()
    write_rows(rows, sink, **kw)
    return sink.getvalue()


def _pq(buf: bytes) -> pq.ParquetFile:
    return pq.ParquetFile(io.BytesIO(buf))


def _col(buf: bytes, i: int):
    return _pq(buf).schema.column(i)


def test_int_infers_int32():
    buf = _write([{"a": 1}, {"a": 2}])
    c = _col(buf, 0)
    assert c.physical_type == "INT32"
    assert pq.read_table(io.BytesIO(buf)).column("a").to_pylist() == [1, 2]


def test_large_int_widens_to_int64():
    buf = _write([{"a": 1}, {"a": 2 ** 40}])
    assert _col(buf, 0).physical_type == "INT64"


def test_int_plus_float_widens_to_double_both_orders():
    for rows in ([{"a": 1}, {"a": 2.5}], [{"a": 2.5}, {"a": 1}]):
        buf = _write(rows)
        assert _col(buf, 0).physical_type == "DOUBLE"
        got = pq.read_table(io.BytesIO(buf)).column("a").to_pylist()
        assert sorted(got) == [1.0, 2.5]


def test_string_infers_utf8():
    buf = _write([{"s": "x"}])
    c = _col(buf, 0)
    assert c.physical_type == "BYTE_ARRAY"
    assert str(c.logical_type) == "String"


def test_bytes_infers_plain_byte_array():
    buf = _write([{"b": b"\x00\x01"}])
    c = _col(buf, 0)
    assert c.physical_type == "BYTE_ARRAY"
    assert str(c.logical_type) == "None"
    assert pq.read_table(io.BytesIO(buf)).column("b").to_pylist() == [b"\x00\x01"]


def test_bool_infers_boolean():
    buf = _write([{"f": True}, {"f": False}])
    assert _col(buf, 0).physical_type == "BOOLEAN"


def test_datetime_infers_timestamp_millis():
    dt = datetime.datetime(2024, 1, 2, 3, 4, 5, 678000)
    buf = _write([{"t": dt}])
    c = _col(buf, 0)
    assert c.physical_type == "INT64"
    assert "Timestamp" in str(c.logical_type)
    assert pq.read_table(io.BytesIO(buf)).column("t").to_pylist() == [dt]


def test_object_infers_json_annotation():
    buf = _write([{"o": {"k": [1, 2], "s": "é"}}])
    c = _col(buf, 0)
    assert c.physical_type == "BYTE_ARRAY"
    assert str(c.logical_type) == "JSON"
    raw = pq.read_table(io.BytesIO(buf)).column("o").to_pylist()[0]
    # compact separators and no ascii-escaping, like JSON.stringify
    assert raw == b'{"k":[1,2],"s":"\xc3\xa9"}'
    assert json.loads(raw) == {"k": [1, 2], "s": "é"}


def test_all_null_falls_back_to_optional_byte_array():
    buf = _write([{"n": None}, {"n": None}])
    c = _col(buf, 0)
    assert c.physical_type == "BYTE_ARRAY"
    assert c.max_definition_level == 1  # OPTIONAL
    assert pq.read_table(io.BytesIO(buf)).column("n").to_pylist() == [None, None]


def test_mixed_types_error():
    with pytest.raises(ValueError, match="parquet cannot write mixed types"):
        _write([{"a": "s"}, {"a": 1}])
    with pytest.raises(ValueError, match="parquet cannot write mixed types"):
        _write([{"a": True}, {"a": 1}])


def test_null_makes_optional_and_missing_keys_are_null():
    buf = _write([{"a": 1, "b": 2}, {"a": 3}, {"b": 4}])
    f = _pq(buf)
    assert f.schema.column(0).max_definition_level == 1
    assert f.schema.column(1).max_definition_level == 1
    t = pq.read_table(io.BytesIO(buf))
    assert t.column("a").to_pylist() == [1, 3, None]
    assert t.column("b").to_pylist() == [2, None, 4]


def test_no_null_stays_required():
    buf = _write([{"a": 1}, {"a": 2}])
    assert _pq(buf).schema.column(0).max_definition_level == 0  # REQUIRED


def test_columns_param_fixes_order():
    buf = _write([{"b": 1, "a": 2}], columns=["a", "b"])
    t = pq.read_table(io.BytesIO(buf))
    assert t.column_names == ["a", "b"]


def test_sampling_caps_at_1000():
    rows = [{"a": 1} for _ in range(1500)]
    schema, _ = auto_schema_from_rows(rows)
    assert schema.field("a").type == pa.int32()


def test_unsupported_value_raises():
    with pytest.raises(TypeError, match="cannot determine parquet type"):
        _write([{"a": object()}])


def test_async_rows_byte_identical_to_sync():
    rows = [{"i": n, "s": f"v{n}", "f": n / 3} for n in range(2500)]

    async def agen():
        for r in rows:
            await asyncio.sleep(0)
            yield r

    sync_buf = _write(iter(rows))

    async_sink = io.BytesIO()
    asyncio.run(write_rows_async(agen(), async_sink))
    assert async_sink.getvalue() == sync_buf
    assert pq.read_table(io.BytesIO(sync_buf)).num_rows == 2500


def test_async_backpressure_one_group_ahead():
    """The source is never pulled more than one row-group window ahead
    of the writer (drainAsync contract, src/write-rows.js:142-156)."""
    pulled = []

    async def agen():
        for n in range(3000):
            pulled.append(n)
            yield {"a": n}

    class Spy(io.BytesIO):
        def __init__(self):
            super().__init__()
            self.pulled_at_write = []

        def write(self, b):
            self.pulled_at_write.append(len(pulled))
            return super().write(b)

    sink = Spy()
    asyncio.run(write_rows_async(agen(), sink))
    # first write happens after exactly the first window (1000 rows,
    # the default schedule's first entry), not after the whole source
    assert sink.pulled_at_write[0] == 1000


def test_inference_fuzz_roundtrip():
    """Random homogeneous row dicts round-trip through inference +
    write + pyarrow decode; mixed-type columns always raise."""
    from hypothesis import given, settings, strategies as st

    scalar = st.one_of(
        st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=12),
        st.binary(max_size=12),
        st.booleans(),
        st.none(),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.fixed_dictionaries({"a": scalar, "b": scalar}),
                    min_size=1, max_size=30))
    def run(rows):
        def is_mixed(col):
            ks = set()
            for r in rows:
                v = r[col]
                if v is None:
                    continue
                if isinstance(v, bool):
                    ks.add("bool")
                elif isinstance(v, int):
                    ks.add("i32" if -(2 ** 31) <= v <= 2 ** 31 - 1 else "i64")
                elif isinstance(v, float):
                    ks.add("f")
                else:
                    ks.add(type(v).__name__)
            # legal widenings: i32+i64, i32+f; i64+f errors (bigint vs
            # Number in the reference), as does any non-numeric mix
            if ks <= {"i32", "i64"} or ks <= {"i32", "f"}:
                return False
            return len(ks) > 1

        mixed = any(is_mixed(c) for c in ("a", "b"))
        if mixed:
            with pytest.raises((ValueError, TypeError)):
                _write(rows)
            return
        buf = _write(rows)
        got = pq.read_table(io.BytesIO(buf))
        assert got.num_rows == len(rows)
        for c in ("a", "b"):
            vals = got.column(c).to_pylist()
            for v, r in zip(vals, rows):
                exp = r[c]
                if isinstance(exp, float) and not isinstance(exp, bool):
                    assert v == exp or (abs(v - exp) < 1e-12)
                elif isinstance(exp, int) and not isinstance(exp, bool) and \
                        any(isinstance(rr[c], float) for rr in rows):
                    assert v == float(exp)  # INT32+DOUBLE widened
                else:
                    assert v == exp

    run()
