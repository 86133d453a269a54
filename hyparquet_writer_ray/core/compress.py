"""Page compression codec registry.

Built-ins go through pyarrow's C codecs (raw block formats, exactly what
parquet pages need). Users may register extra codecs per the reference's
``compressors`` plug-in map (src/types.d.ts:3-4): a callable
``bytes -> bytes`` keyed by codec name.
"""
from __future__ import annotations

from typing import Callable, Optional

import pyarrow as pa

from .types import Codec

_PA_NAME = {
    Codec.SNAPPY: "snappy",
    Codec.GZIP: "gzip",
    Codec.BROTLI: "brotli",
    Codec.LZ4_RAW: "lz4_raw",
    Codec.ZSTD: "zstd",
}

_codec_cache: dict[tuple, pa.Codec] = {}


def compress(data: bytes, codec: Codec,
             compressors: Optional[dict[str, Callable[[bytes], bytes]]] = None,
             level: Optional[int] = None) -> bytes:
    if codec == Codec.UNCOMPRESSED:
        return data
    if compressors and codec.name in compressors:
        return compressors[codec.name](data)
    name = _PA_NAME.get(codec)
    if name is None:
        raise ValueError(f"no compressor for codec {codec.name}")
    key = (codec, level)
    c = _codec_cache.get(key)
    if c is None:
        c = _codec_cache[key] = (
            pa.Codec(name) if level is None else pa.Codec(name, compression_level=level)
        )
    return c.compress(data, asbytes=True)


def decompress(data: bytes, codec: Codec, uncompressed_size: int,
               decompressors: Optional[dict[str, Callable[[bytes, int], bytes]]] = None) -> bytes:
    """Inverse of :func:`compress`. ``decompressors`` mirrors the
    ``compressors`` plug-in map: ``name -> fn(data, uncompressed_size)``
    for codecs pyarrow has no block decoder for (e.g. legacy
    hadoop-framed LZ4) or for overridden built-ins."""
    if codec == Codec.UNCOMPRESSED:
        return data
    if decompressors and codec.name in decompressors:
        return decompressors[codec.name](data, uncompressed_size)
    name = _PA_NAME.get(codec)
    if name is None:
        raise ValueError(
            f"no decompressor for codec {codec.name}: a file written "
            f"through the compressors plug-in map needs a matching "
            f"entry in decompressors")
    return pa.Codec(name).decompress(data, uncompressed_size, asbytes=True)
