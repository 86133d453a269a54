"""Page header serialization (reference: src/datapage.js:107-136).

The optional ``crc`` (PageHeader field 4) is the CRC-32 of the page
bytes as written after the header — for DATA_PAGE_V2 the (uncompressed)
level runs followed by the compressed values, for DICTIONARY_PAGE the
compressed dictionary body. The reference serializes the field when the
caller provides one (src/datapage.js:113) but never computes it; we do
(opt-in ``WriteOptions.page_crc``), and readers such as pyarrow verify
it with ``page_checksum_verification=True``.
"""
from __future__ import annotations

from typing import Optional

from .bufwriter import BufWriter
from .thrift import write_struct
from .types import Encoding, PageType


def _crc_i32(crc: Optional[int]) -> Optional[int]:
    """uint32 CRC reinterpreted as the thrift i32 the spec stores."""
    if crc is None:
        return None
    return crc - (1 << 32) if crc >= (1 << 31) else crc


def write_data_page_v2_header(
    w: BufWriter,
    *,
    uncompressed_page_size: int,
    compressed_page_size: int,
    num_values: int,
    num_nulls: int,
    num_rows: int,
    encoding: Encoding,
    definition_levels_byte_length: int,
    repetition_levels_byte_length: int,
    is_compressed: bool,
    crc: Optional[int] = None,
) -> None:
    write_struct(
        w,
        {
            1: int(PageType.DATA_PAGE_V2),
            2: uncompressed_page_size,
            3: compressed_page_size,
            4: _crc_i32(crc),
            8: {
                1: num_values,
                2: num_nulls,
                3: num_rows,
                4: int(encoding),
                5: definition_levels_byte_length,
                6: repetition_levels_byte_length,
                # field 7 default true; only written when False
                7: None if is_compressed else False,
            },
        },
    )


def write_dictionary_page_header(
    w: BufWriter,
    *,
    uncompressed_page_size: int,
    compressed_page_size: int,
    num_values: int,
    crc: Optional[int] = None,
) -> None:
    write_struct(
        w,
        {
            1: int(PageType.DICTIONARY_PAGE),
            2: uncompressed_page_size,
            3: compressed_page_size,
            4: _crc_i32(crc),
            7: {1: num_values, 2: int(Encoding.PLAIN)},
        },
    )
