"""Parquet RLE / bit-packed hybrid encoding, numpy-vectorized.

Semantics match the reference (src/encoding.js:12-106): runs of >= 8
equal values become RLE runs ``varint(count<<1) + value``; everything
else is bit-packed in groups of 8 values with header
``varint(groups<<1|1)``, LSB-first bit order. Exact byte stream may
differ from the reference (both are valid parquet); correctness is
decode equality through pyarrow/duckdb.

Vectorization strategy: run boundaries via ``np.diff``; only runs of
length >= 8 are visited in Python — high-entropy data (dictionary
indexes) has few such runs and is packed in one vectorized call, while
low-entropy data (definition levels) has few runs overall.
"""
from __future__ import annotations

import numpy as np

from .bufwriter import BufWriter


def _pack_bits(values: np.ndarray, bit_width: int) -> bytes:
    """Bit-pack values (len must be a multiple of 8) LSB-first."""
    if bit_width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    bits = ((v[:, None] >> np.arange(bit_width, dtype=np.uint64)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _write_rle_run(w: BufWriter, value: int, count: int, bit_width: int) -> None:
    w.varint(count << 1)
    nbytes = (bit_width + 7) >> 3
    if nbytes:
        w.write(int(value).to_bytes(nbytes, "little"))


def _write_bitpacked(w: BufWriter, span: np.ndarray, bit_width: int) -> None:
    n = len(span)
    if n == 0:
        return
    pad = (-n) % 8
    if pad:
        span = np.concatenate([span, np.zeros(pad, dtype=span.dtype)])
    groups = len(span) // 8
    w.varint((groups << 1) | 1)
    w.write(_pack_bits(span, bit_width))


def encode_rle_hybrid(w: BufWriter, values: np.ndarray, bit_width: int) -> int:
    """Append the hybrid encoding of ``values`` to ``w``; returns bytes written."""
    start_off = w.offset
    n = len(values)
    if n == 0:
        return 0
    values = np.ascontiguousarray(values)
    # run segmentation
    change = np.nonzero(np.diff(values))[0] + 1
    run_starts = np.concatenate([[0], change]).astype(np.int64)
    run_ends = np.append(run_starts[1:], n)
    run_lengths = run_ends - run_starts
    candidates = np.nonzero(run_lengths >= 8)[0]

    pos = 0
    for ci in candidates:
        rstart = int(run_starts[ci])
        rlen = int(run_lengths[ci])
        lit_len = rstart - pos
        steal = (-lit_len) % 8
        if rlen - steal < 8:
            continue  # run too short once aligned; fold into literals
        if lit_len + steal:
            _write_bitpacked(w, values[pos : rstart + steal], bit_width)
        _write_rle_run(w, int(values[rstart]), rlen - steal, bit_width)
        pos = rstart + rlen
    if pos < n:
        _write_bitpacked(w, values[pos:n], bit_width)
    return w.offset - start_off


def encode_levels(values: np.ndarray, bit_width: int) -> bytes:
    w = BufWriter()
    encode_rle_hybrid(w, values, bit_width)
    return w.getvalue()


def bit_width_of(max_value: int) -> int:
    return int(max_value).bit_length()
