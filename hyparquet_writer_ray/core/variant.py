"""Parquet VARIANT binary format encoder/decoder + shredding
(reference: src/variant.js; format per the parquet variant spec).

Design: a variant column becomes an ordinary Arrow struct column
``{metadata: binary, value: binary[, typed_value: ...]}`` built by
``variant_column(values, shredding)``, plus a group-level VARIANT
logical-type annotation; the existing nested Dremel writer then
handles pages/levels with no special cases. MISSING is the sentinel
for an absent row (vs None = present variant null), mirroring the
reference's undefined-vs-null distinction (src/variant.js:60-62).
"""
from __future__ import annotations

import datetime
import struct

import pyarrow as pa

MISSING = object()  # absent row (JS undefined); None is a present variant null
_VARIANT_NULL = b"\x00"
RESERVED_SHREDDING_FIELDS = {"value", "typed_value"}

INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


def _byte_width(max_value: int) -> int:
    if max_value <= 0xFF:
        return 1
    if max_value <= 0xFFFF:
        return 2
    if max_value <= 0xFFFFFF:
        return 3
    return 4


def _unsigned_le(value: int, width: int) -> bytes:
    return value.to_bytes(width, "little")


def write_metadata(dictionary: list[str]) -> bytes:
    """header | dict size | offsets | utf8 data (sorted dictionary)."""
    encoded = [k.encode("utf-8") for k in dictionary]
    total = sum(len(e) for e in encoded)
    osz = _byte_width(total)
    out = bytearray()
    out.append(1 | (1 << 4) | ((osz - 1) << 6))  # version=1, sorted=1
    out += _unsigned_le(len(encoded), osz)
    pos = 0
    for e in encoded:
        out += _unsigned_le(pos, osz)
        pos += len(e)
    out += _unsigned_le(pos, osz)
    for e in encoded:
        out += e
    return bytes(out)


def _collect_keys(value, keys: set) -> None:
    if isinstance(value, dict):
        for k, v in value.items():
            keys.add(k)
            _collect_keys(v, keys)
    elif isinstance(value, (list, tuple)):
        for v in value:
            _collect_keys(v, keys)


def write_value(val, key_index: dict[str, int]) -> bytes:
    out = bytearray()
    _write_value(val, out, key_index)
    return bytes(out)


def _write_value(val, out: bytearray, key_index: dict[str, int]) -> None:
    if val is None or val is MISSING:
        out.append(0x00)
        return
    if val is True:
        out.append(0x04)  # typeId=1
        return
    if val is False:
        out.append(0x08)  # typeId=2
        return
    if isinstance(val, int) and not isinstance(val, bool):
        if -128 <= val <= 127:
            out.append(3 << 2)
            out += struct.pack("<b", val)
        elif -32768 <= val <= 32767:
            out.append(4 << 2)
            out += struct.pack("<h", val)
        elif -(2**31) <= val <= 2**31 - 1:
            out.append(5 << 2)
            out += struct.pack("<i", val)
        elif INT64_MIN <= val <= INT64_MAX:
            out.append(6 << 2)
            out += struct.pack("<q", val)
        else:
            raise OverflowError(f"variant int out of int64 range: {val}")
        return
    if isinstance(val, float):
        out.append(7 << 2)
        out += struct.pack("<d", val)
        return
    if isinstance(val, str):
        data = val.encode("utf-8")
        if len(data) <= 63:
            out.append((len(data) << 2) | 1)  # short string
            out += data
        else:
            out.append(16 << 2)  # long string
            out += struct.pack("<I", len(data))
            out += data
        return
    if isinstance(val, datetime.datetime):
        if val.tzinfo is not None:
            # variant spec: type 12 = timestamp micros ADJUSTED TO UTC;
            # 13 is the NTZ (wall-clock) variant — writing tz-aware
            # values as 13 would shift them by the reader's session tz
            micros = int(val.timestamp() * 1_000_000)
            out.append(12 << 2)  # timestamp_micros (UTC)
        else:
            micros = int(val.replace(
                tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
            out.append(13 << 2)  # timestamp_micros_ntz
        out += struct.pack("<q", micros)
        return
    if isinstance(val, (bytes, bytearray)):
        out.append(15 << 2)  # binary
        out += struct.pack("<I", len(val))
        out += bytes(val)
        return
    if isinstance(val, (list, tuple)):
        _write_array(val, out, key_index)
        return
    if isinstance(val, dict):
        _write_object(val, out, key_index)
        return
    raise TypeError(f"variant cannot encode value: {val!r}")


def _write_object(obj: dict, out: bytearray, key_index: dict[str, int]) -> None:
    entries = sorted(
        ((key_index[k], k) for k, v in obj.items() if v is not MISSING),
    )
    n = len(entries)
    max_id = entries[-1][0] if n else 0
    idw = _byte_width(max_id)
    scratch = bytearray()
    offsets = [0]
    for _, k in entries:
        _write_value(obj[k], scratch, key_index)
        offsets.append(len(scratch))
    ow = _byte_width(offsets[-1])
    is_large = 1 if n > 255 else 0
    out.append((((ow - 1) | ((idw - 1) << 2) | (is_large << 4)) << 2) | 2)
    out += struct.pack("<I", n) if is_large else bytes([n])
    for fid, _ in entries:
        out += _unsigned_le(fid, idw)
    for off in offsets:
        out += _unsigned_le(off, ow)
    out += scratch


def _write_array(arr, out: bytearray, key_index: dict[str, int]) -> None:
    n = len(arr)
    scratch = bytearray()
    offsets = [0]
    for v in arr:
        _write_value(v, scratch, key_index)
        offsets.append(len(scratch))
    ow = _byte_width(offsets[-1])
    is_large = 1 if n > 255 else 0
    out.append((((ow - 1) | (is_large << 2)) << 2) | 3)
    out += struct.pack("<I", n) if is_large else bytes([n])
    for off in offsets:
        out += _unsigned_le(off, ow)
    out += scratch


# ---------------------------------------------------------------------------
# decoder (independent-enough oracle for round-trip tests)
# ---------------------------------------------------------------------------


def read_metadata(data: bytes) -> list[str]:
    header = data[0]
    osz = ((header >> 6) & 3) + 1
    pos = 1
    n = int.from_bytes(data[pos : pos + osz], "little")
    pos += osz
    offsets = [
        int.from_bytes(data[pos + i * osz : pos + (i + 1) * osz], "little")
        for i in range(n + 1)
    ]
    pos += (n + 1) * osz
    return [data[pos + offsets[i] : pos + offsets[i + 1]].decode() for i in range(n)]


def read_value(data: bytes, dictionary: list[str], pos: int = 0):
    header = data[pos]
    basic = header & 3
    if basic == 0:  # primitive
        type_id = header >> 2
        p = pos + 1
        if type_id == 0:
            return None, p
        if type_id == 1:
            return True, p
        if type_id == 2:
            return False, p
        if type_id == 3:
            return struct.unpack_from("<b", data, p)[0], p + 1
        if type_id == 4:
            return struct.unpack_from("<h", data, p)[0], p + 2
        if type_id == 5:
            return struct.unpack_from("<i", data, p)[0], p + 4
        if type_id == 6:
            return struct.unpack_from("<q", data, p)[0], p + 8
        if type_id == 7:
            return struct.unpack_from("<d", data, p)[0], p + 8
        if type_id in (12, 13):
            micros = struct.unpack_from("<q", data, p)[0]
            dt = datetime.datetime.fromtimestamp(
                micros / 1e6, tz=datetime.timezone.utc)
            if type_id == 13:  # NTZ: naive wall-clock
                dt = dt.replace(tzinfo=None)
            return dt, p + 8
        if type_id == 15:
            ln = struct.unpack_from("<I", data, p)[0]
            return bytes(data[p + 4 : p + 4 + ln]), p + 4 + ln
        if type_id == 16:
            ln = struct.unpack_from("<I", data, p)[0]
            return data[p + 4 : p + 4 + ln].decode(), p + 4 + ln
        raise ValueError(f"variant primitive type {type_id}")
    if basic == 1:  # short string
        ln = header >> 2
        return data[pos + 1 : pos + 1 + ln].decode(), pos + 1 + ln
    if basic == 2:  # object
        h = header >> 2
        ow = (h & 3) + 1
        idw = ((h >> 2) & 3) + 1
        is_large = (h >> 4) & 1
        p = pos + 1
        n = int.from_bytes(data[p : p + (4 if is_large else 1)], "little")
        p += 4 if is_large else 1
        ids = [int.from_bytes(data[p + i * idw : p + (i + 1) * idw], "little") for i in range(n)]
        p += n * idw
        offs = [int.from_bytes(data[p + i * ow : p + (i + 1) * ow], "little") for i in range(n + 1)]
        p += (n + 1) * ow
        out = {}
        for i in range(n):
            v, _ = read_value(data, dictionary, p + offs[i])
            out[dictionary[ids[i]]] = v
        return out, p + offs[-1]
    # array
    h = header >> 2
    ow = (h & 3) + 1
    is_large = (h >> 2) & 1
    p = pos + 1
    n = int.from_bytes(data[p : p + (4 if is_large else 1)], "little")
    p += 4 if is_large else 1
    offs = [int.from_bytes(data[p + i * ow : p + (i + 1) * ow], "little") for i in range(n + 1)]
    p += (n + 1) * ow
    out = []
    for i in range(n):
        v, _ = read_value(data, dictionary, p + offs[i])
        out.append(v)
    return out, p + offs[-1]


def decode_variant(metadata: bytes, value: bytes):
    v, _ = read_value(value, read_metadata(metadata))
    return v


# ---------------------------------------------------------------------------
# column builder (+ shredding)
# ---------------------------------------------------------------------------


_INT_BITS = {"INT64": 64, "INT32": 32, "INT16": 16, "INT8": 8}


def _matches_type(value, shred_type: str) -> bool:
    if shred_type == "STRING":
        return isinstance(value, str)
    if shred_type in _INT_BITS:
        if not isinstance(value, int) or isinstance(value, bool):
            return False
        bits = _INT_BITS[shred_type]
        # out-of-range ints are VALID variant values that simply don't
        # shred: they go to the untyped value field (spec), instead of
        # crashing the typed arrow cast
        return -(1 << (bits - 1)) <= value < (1 << (bits - 1))
    if shred_type == "DOUBLE":
        if isinstance(value, bool):
            return False
        if isinstance(value, float):
            return True
        if isinstance(value, int):
            try:  # ints must be EXACTLY representable as float64
                return int(float(value)) == value
            except OverflowError:
                return False
        return False
    if shred_type == "BOOLEAN":
        return isinstance(value, bool)
    if shred_type == "BINARY":
        return isinstance(value, (bytes, bytearray))
    if shred_type == "TIMESTAMP":
        return isinstance(value, datetime.datetime)
    return False


def _shred(value, shred_type, key_index, allow_partial: bool):
    """-> {value: bytes|None, typed_value: ...} per the shredding spec
    (reference src/variant.js:83-147)."""
    if value is None or value is MISSING:
        return {"value": _VARIANT_NULL, "typed_value": None}
    if isinstance(shred_type, list):  # array shred
        if not isinstance(value, (list, tuple)):
            return {"value": write_value(value, key_index), "typed_value": None}
        elem = shred_type[0]
        return {
            "value": None,
            "typed_value": [_shred(v, elem, key_index, False) for v in value],
        }
    if isinstance(shred_type, dict):  # object shred
        if not isinstance(value, dict):
            return {"value": write_value(value, key_index), "typed_value": None}
        remaining = {k: v for k, v in value.items() if k not in shred_type and v is not MISSING}
        if remaining and not allow_partial:
            return {"value": write_value(value, key_index), "typed_value": None}
        # missing-field conflict: a shredded field absent from this object but
        # present in the dictionary is ambiguous -> binary fallback
        if any(
            (f not in value or value[f] is MISSING) and f in key_index
            for f in shred_type
        ):
            return {"value": write_value(value, key_index), "typed_value": None}
        typed = {}
        for f, ft in shred_type.items():
            if f in value and value[f] is not MISSING:
                typed[f] = _shred(value[f], ft, key_index, False)
        return {
            "value": write_value(remaining, key_index) if remaining else None,
            "typed_value": typed,
        }
    if _matches_type(value, shred_type):
        return {"value": None, "typed_value": value}
    return {"value": write_value(value, key_index), "typed_value": None}


_SHRED_ARROW = {
    "STRING": pa.string(), "INT64": pa.int64(), "INT32": pa.int32(),
    "DOUBLE": pa.float64(), "BOOLEAN": pa.bool_(), "BINARY": pa.binary(),
    "TIMESTAMP": pa.timestamp("us"),
}


def _shred_arrow_type(shred_type) -> pa.DataType:
    if isinstance(shred_type, list):
        return pa.list_(pa.struct([
            ("value", pa.binary()),
            ("typed_value", _shred_arrow_type(shred_type[0])),
        ]))
    if isinstance(shred_type, dict):
        return pa.struct([
            (f, pa.struct([
                ("value", pa.binary()),
                ("typed_value", _shred_arrow_type(t)),
            ]))
            for f, t in shred_type.items()
        ])
    return _SHRED_ARROW[shred_type]


def _validate_shredding(shred_type) -> None:
    if isinstance(shred_type, dict):
        for k, v in shred_type.items():
            if k in RESERVED_SHREDDING_FIELDS:
                raise ValueError(f"shredding field name {k!r} is reserved")
            _validate_shredding(v)
    elif isinstance(shred_type, list):
        _validate_shredding(shred_type[0])
    elif shred_type not in _SHRED_ARROW:
        raise ValueError(f"unknown shred type {shred_type!r}")


def variant_column(values: list, shredding=None) -> pa.Array:
    """Encode python values into an arrow struct column ready for the
    writer: {metadata, value[, typed_value]}. MISSING entries become
    null rows. Annotate the column with VARIANT via
    ``variant_schema_override`` (group logical type)."""
    if shredding is not None:
        _validate_shredding(shredding)
        rows = []
        for v in values:
            if v is MISSING:
                rows.append(None)
                continue
            keys: set = set()
            _collect_keys(v, keys)
            dictionary = sorted(keys)
            key_index = {k: i for i, k in enumerate(dictionary)}
            row = {"metadata": write_metadata(dictionary)}
            row.update(_shred(v, shredding, key_index, True))
            rows.append(row)
        typ = pa.struct([
            pa.field("metadata", pa.binary(), nullable=False),
            ("value", pa.binary()),
            ("typed_value", _shred_arrow_type(shredding)),
        ])
        return pa.array(rows, type=typ)

    keys: set = set()
    for v in values:
        if v is not MISSING:
            _collect_keys(v, keys)
    dictionary = sorted(keys)
    key_index = {k: i for i, k in enumerate(dictionary)}
    metadata = write_metadata(dictionary)
    rows = [
        None if v is MISSING else {"metadata": metadata, "value": write_value(v, key_index)}
        for v in values
    ]
    typ = pa.struct([
        pa.field("metadata", pa.binary(), nullable=False),
        pa.field("value", pa.binary(), nullable=False),
    ])
    return pa.array(rows, type=typ)


def variant_schema_override():
    """Group-level VARIANT LogicalType annotation for
    WriteOptions.schema_overrides.

    NOTE: parquet-cpp (pyarrow 16) rejects files whose footer contains a
    LogicalType it does not know, VARIANT included — so this annotation
    makes the whole file unreadable by pyarrow/duckdb. Use it only for
    variant-aware readers (hyparquet); the compatible default is
    ``variant_kv_metadata`` which tags variant columns via file-level
    key/value metadata and keeps the footer plain.
    """
    from .types import LogicalType, SchemaElement

    return SchemaElement(name="", num_children=-1, logical_type=LogicalType("VARIANT"))


def variant_kv_metadata(columns: list[str]) -> list[tuple[str, str]]:
    """Reader-compatible variant tagging for WriteOptions.kv_metadata."""
    return [("hpw.variant.columns", ",".join(columns))]
