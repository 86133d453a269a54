"""PLAIN encoding for all physical types, numpy-vectorized
(reference semantics: src/plain.js:10-135)."""
from __future__ import annotations

import numpy as np

from .types import ParquetType

_NP_OUT = {
    ParquetType.INT32: "<i4",
    ParquetType.INT64: "<i8",
    ParquetType.FLOAT: "<f4",
    ParquetType.DOUBLE: "<f8",
}


def plain_fixed(values: np.ndarray, ptype: ParquetType) -> bytes:
    """PLAIN bytes for INT32/INT64/FLOAT/DOUBLE from a numpy array."""
    dt = _NP_OUT[ptype]
    if values.dtype.kind == "u" and ptype in (ParquetType.INT32, ParquetType.INT64):
        # unsigned logical types store their two's-complement bit pattern
        width = 4 if ptype == ParquetType.INT32 else 8
        out = values.astype(f"<u{width}", copy=False).view(dt)
    else:
        out = values.astype(dt, copy=False)
    return out.tobytes()


def plain_boolean(values: np.ndarray) -> bytes:
    """BOOLEAN bit-packed LSB-first."""
    return np.packbits(values.astype(np.uint8), bitorder="little").tobytes()


def plain_byte_array(lengths: np.ndarray, data: np.ndarray) -> bytes:
    """BYTE_ARRAY: u32 little-endian length prefix + raw bytes per value.

    Fully vectorized scatter: output position of each length header and
    each data byte is computed with numpy, no per-value Python loop.
    """
    n = len(lengths)
    total = int(data.nbytes) + 4 * n
    out = np.zeros(total, dtype=np.uint8)
    lengths = lengths.astype(np.int64, copy=False)
    out_starts = np.concatenate([[0], np.cumsum(lengths[:-1])]) + 4 * np.arange(n, dtype=np.int64) if n else np.empty(0, np.int64)
    # scatter the 4-byte length headers
    len_bytes = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    idx = out_starts[:, None] + np.arange(4, dtype=np.int64)
    out[idx.reshape(-1)] = len_bytes.reshape(-1)
    # scatter the data bytes: byte j of value i goes to out_starts[i]+4+j
    if data.nbytes:
        owner = np.repeat(np.arange(n, dtype=np.int64), lengths)
        data_pos = np.arange(data.nbytes, dtype=np.int64)
        value_base = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        out_pos = out_starts[owner] + 4 + (data_pos - value_base[owner])
        out[out_pos] = data
    return out.tobytes()


def plain_flba(matrix: np.ndarray) -> bytes:
    """FIXED_LEN_BYTE_ARRAY: concatenated fixed-size values."""
    return np.ascontiguousarray(matrix).tobytes()
