"""Column-chunk / page statistics: min, max, null_count with parquet
byte serialization and 16-byte truncation (reference semantics:
src/column.js:245-284, src/unconvert.js:126-272).

min/max computation is ``pyarrow.compute.min_max`` (C kernel: skips
nulls and NaN, unsigned lexicographic for binary) — no Python loop.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .types import ParquetType, SchemaElement

STATS_TRUNCATE_LENGTH = 16


@dataclass
class Stats:
    min_bytes: Optional[bytes]
    max_bytes: Optional[bytes]
    null_count: int
    is_min_exact: Optional[bool]  # only emitted when False
    is_max_exact: Optional[bool]
    # raw scalar values for boundary-order tracking (comparable python objs)
    min_raw: object = None
    max_raw: object = None


def truncate_statistic(data: bytes, is_max: bool) -> Optional[bytes]:
    """Truncate a byte statistic; max is rounded up to remain an upper bound."""
    if len(data) <= STATS_TRUNCATE_LENGTH:
        return data
    prefix = bytearray(data[:STATS_TRUNCATE_LENGTH])
    if not is_max:
        return bytes(prefix)
    i = len(prefix) - 1
    while i >= 0 and prefix[i] == 0xFF:
        i -= 1
    if i < 0:
        return None  # all 0xFF: no shorter upper bound exists
    prefix = prefix[: i + 1]
    prefix[i] += 1
    return bytes(prefix)


def _serialize(value, element: SchemaElement, is_max: bool):
    """(bytes, is_exact) for a python scalar per the physical type."""
    t = element.type
    if t == ParquetType.BOOLEAN:
        return (b"\x01" if value else b"\x00"), None
    if t == ParquetType.INT32:
        return struct.pack("<I", int(value) & 0xFFFFFFFF), None
    if t == ParquetType.INT64:
        return struct.pack("<Q", int(value) & 0xFFFFFFFFFFFFFFFF), None
    if t == ParquetType.FLOAT:
        return struct.pack("<f", float(value)), None
    if t == ParquetType.DOUBLE:
        return struct.pack("<d", float(value)), None
    if t in (ParquetType.BYTE_ARRAY, ParquetType.FIXED_LEN_BYTE_ARRAY):
        if isinstance(value, str):
            data = value.encode("utf-8")
        elif isinstance(value, (bytes, bytearray)):
            data = bytes(value)
        else:
            data = bytes(value)
        out = truncate_statistic(data, is_max)
        if out is None:
            # first 16 bytes all 0xFF: no shorter upper bound exists —
            # fall back to the exact untruncated value (always a valid bound)
            return data, None
        exact = False if len(data) > STATS_TRUNCATE_LENGTH else None
        return out, exact
    raise TypeError(f"unsupported stats type {t}")


def _decimal_flba(value, element: SchemaElement) -> bytes:
    unscaled = int(value.scaleb(element.scale or 0))
    return unscaled.to_bytes(element.type_length, "big", signed=True)


def compute_statistics(arr: pa.Array, element: SchemaElement, null_count: int = 0) -> Stats:
    """``arr`` holds the non-null values; ``null_count`` is supplied by the
    caller (it is a level-space property for nested columns)."""
    if len(arr) == 0:
        return Stats(None, None, null_count, None, None)

    t = arr.type
    if pa.types.is_decimal(t):
        mm = pc.min_max(arr)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        return Stats(
            _decimal_flba(lo, element), _decimal_flba(hi, element),
            null_count, None, None, lo, hi,
        )
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        # compare on the underlying integers
        storage = arr.cast(pa.int64() if t.bit_width == 64 else pa.int32())
        mm = pc.min_max(storage)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
    elif pa.types.is_float16(t):
        vals = arr.cast(pa.float32())
        mm = pc.min_max(vals)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or lo > hi:  # all-NaN column (min_max -> inf/-inf)
            return Stats(None, None, null_count, None, None)
        # parquet spec: a zero min is written -0.0, a zero max +0.0
        if lo == 0:
            lo = -0.0
        if hi == 0:
            hi = 0.0
        lo_b = np.float16(lo).tobytes()
        hi_b = np.float16(hi).tobytes()
        return Stats(lo_b, hi_b, null_count, None, None, lo, hi)
    else:
        mm = pc.min_max(arr)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()

    if lo is None:
        return Stats(None, None, null_count, None, None)
    if isinstance(lo, float) and isinstance(hi, float) and lo > hi:
        # all-NaN column: pyarrow min_max skips NaN and returns the
        # identity elements (+inf, -inf) — spec says omit min/max
        return Stats(None, None, null_count, None, None)

    if isinstance(lo, float):
        # parquet spec: min -> -0.0, max -> +0.0 when zero
        if lo == 0:
            lo = -0.0
        if hi == 0:
            hi = 0.0

    min_bytes, min_exact = _serialize(lo, element, False)
    max_bytes, max_exact = _serialize(hi, element, True)
    return Stats(min_bytes, max_bytes, null_count, min_exact, max_exact, lo, hi)


def statistics_thrift(stats: Stats):
    """Thrift Statistics struct (field ids per parquet.thrift)."""
    from .thrift import I64

    fields: dict[int, object] = {3: I64(stats.null_count)}
    if stats.max_bytes is not None:
        fields[5] = stats.max_bytes
    if stats.min_bytes is not None:
        fields[6] = stats.min_bytes
    if stats.is_max_exact is False:
        fields[7] = False
    if stats.is_min_exact is False:
        fields[8] = False
    return fields
