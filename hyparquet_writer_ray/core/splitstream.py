"""BYTE_STREAM_SPLIT encoding (reference: src/splitstream.js:13-54):
transpose value bytes so all byte-0s come first, then byte-1s, etc."""
from __future__ import annotations

import numpy as np


def byte_stream_split(values: np.ndarray) -> bytes:
    """values: fixed-width numpy array (i4/i8/f4/f8) or (n,w) uint8 matrix."""
    if values.ndim == 1:
        width = values.dtype.itemsize
        mat = values.astype(values.dtype.newbyteorder("<"), copy=False).view(np.uint8).reshape(-1, width)
    else:
        mat = values
    return np.ascontiguousarray(mat.T).tobytes()
