"""Page header serialization (reference: src/datapage.js:107-136)."""
from __future__ import annotations

from .bufwriter import BufWriter
from .thrift import write_struct
from .types import Encoding, PageType


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
) -> None:
    write_struct(
        w,
        {
            1: int(PageType.DATA_PAGE_V2),
            2: uncompressed_page_size,
            3: compressed_page_size,
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
) -> None:
    write_struct(
        w,
        {
            1: int(PageType.DICTIONARY_PAGE),
            2: uncompressed_page_size,
            3: compressed_page_size,
            7: {1: num_values, 2: int(Encoding.PLAIN)},
        },
    )
