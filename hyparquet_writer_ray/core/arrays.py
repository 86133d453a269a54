"""Zero-copy-ish extraction of numpy views from Arrow arrays.

All encoders operate on either a fixed-width numpy array or an
``(offsets, data)`` pair for BYTE_ARRAY columns, pulled straight from
the Arrow buffers (no per-row Python objects in the hot path).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# Arrow type id -> numpy dtype for fixed-width physical storage
_FIXED_NP = {
    "int8": np.int8,
    "int16": np.int16,
    "int32": np.int32,
    "int64": np.int64,
    "uint8": np.uint8,
    "uint16": np.uint16,
    "uint32": np.uint32,
    "uint64": np.uint64,
    "float": np.float32,
    "double": np.float64,
    "halffloat": np.uint16,
    "date32[day]": np.int32,
    "time32[s]": np.int32,
    "time32[ms]": np.int32,
    "time64[us]": np.int64,
    "time64[ns]": np.int64,
}


def validity_mask(arr: pa.Array) -> np.ndarray | None:
    """Boolean numpy mask (True = valid) or None if no nulls."""
    if arr.null_count == 0:
        return None
    buf = arr.buffers()[0]
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), bitorder="little"
    )
    return bits[arr.offset : arr.offset + len(arr)].astype(bool)


def single_chunk(col) -> pa.Array:
    """One contiguous Array from an Array or ChunkedArray.
    ``ChunkedArray.combine_chunks`` COPIES even when there is exactly
    one chunk (measured 39 ms on a 56 MB string column) — the 1-chunk
    case, which is what map_batches hands us, is a zero-copy
    ``chunk(0)``."""
    if isinstance(col, pa.ChunkedArray):
        return col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    return col


def drop_null_fast(arr: pa.Array) -> pa.Array:
    """``drop_null`` without copying the data buffer for string/binary
    arrays whose null slots are zero-length (the canonical Arrow
    layout): only the offsets are rebuilt (one vector gather), the
    value bytes are reused zero-copy. For a web-page table the data
    buffer is the dominant payload, so Arrow's drop_null copy showed
    up as ~20% of encode-task CPU. Falls back to ``drop_null`` for
    other types or non-canonical layouts."""
    if arr.null_count == 0:
        return arr
    t = arr.type
    if not (pa.types.is_string(t) or pa.types.is_binary(t)
            or pa.types.is_large_string(t) or pa.types.is_large_binary(t)):
        return arr.drop_null()
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    odt = np.int64 if big else np.int32
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=odt, count=arr.offset + n + 1)
    offs = offs[arr.offset:]
    valid = validity_mask(arr)
    if ((offs[1:] - offs[:-1])[~valid] != 0).any():
        return arr.drop_null()  # non-canonical: null slots own bytes
    new_offs = np.concatenate([offs[:-1][valid], offs[-1:]])
    return pa.Array.from_buffers(
        t, int(valid.sum()),
        [None, pa.py_buffer(np.ascontiguousarray(new_offs, dtype=odt).tobytes()),
         arr.buffers()[2]],
    )


def fixed_values(arr: pa.Array) -> np.ndarray:
    """Numpy view of the value buffer of a fixed-width arrow array
    (including slots that are null — caller masks separately)."""
    t = arr.type
    if pa.types.is_boolean(t):
        buf = arr.buffers()[1]
        bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")
        return bits[arr.offset : arr.offset + len(arr)].astype(bool)
    if pa.types.is_timestamp(t):
        dtype = np.int64
    elif pa.types.is_decimal(t):
        raise TypeError("decimal handled by flba_values")
    else:
        dtype = _FIXED_NP.get(str(t))
        if dtype is None:
            raise TypeError(f"unsupported fixed-width arrow type {t}")
    buf = arr.buffers()[1]
    vals = np.frombuffer(buf, dtype=dtype, count=arr.offset + len(arr))
    return vals[arr.offset : arr.offset + len(arr)]


def byte_array_values(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths:int64, data:uint8) for a string/binary array, offset-normalized.

    ``data`` covers exactly the bytes of the logical slice, in order.
    Null slots have length 0 and contribute no bytes.
    """
    t = arr.type
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    odt = np.int64 if big else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt, count=arr.offset + len(arr) + 1)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(offsets[-1])) if len(arr) else np.empty(0, np.uint8)
    start = int(offsets[0])
    return np.diff(offsets), data[start : int(offsets[-1])]


def flba_values(arr: pa.Array, type_length: int) -> np.ndarray:
    """(n, type_length) uint8 matrix for FIXED_LEN_BYTE_ARRAY storage."""
    t = arr.type
    if pa.types.is_decimal(t):
        # arrow decimal128 is 16-byte little-endian; parquet FLBA decimal is
        # big-endian two's complement — byteswap and take the low type_length
        buf = arr.buffers()[1]
        raw = np.frombuffer(buf, dtype=np.uint8, count=(arr.offset + len(arr)) * 16)
        raw = raw.reshape(-1, 16)[arr.offset : arr.offset + len(arr)]
        be = raw[:, ::-1]  # big-endian 16 bytes
        return np.ascontiguousarray(be[:, 16 - type_length :])
    if pa.types.is_fixed_size_binary(t):
        w = t.byte_width
        buf = arr.buffers()[1]
        raw = np.frombuffer(buf, dtype=np.uint8, count=(arr.offset + len(arr)) * w)
        return raw.reshape(-1, w)[arr.offset : arr.offset + len(arr)]
    if pa.types.is_float16(t):
        vals = fixed_values(arr)  # uint16 view
        return vals.view(np.uint8).reshape(-1, 2)
    raise TypeError(f"unsupported FLBA arrow type {t}")


def drop_null_np(values: np.ndarray, mask: np.ndarray | None) -> np.ndarray:
    return values if mask is None else values[mask]
