"""Write options and per-column specs (mirrors the reference's
``ParquetWriteOptions`` / ``ColumnSource`` user surface,
src/types.d.ts:28-58)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Union

from .types import Codec, Encoding

DEFAULT_PAGE_SIZE = 1 << 20  # 1 MiB uncompressed target (src/write.js:25)
DEFAULT_ROW_GROUP_SIZE = (1000, 100000)  # fast-preview schedule (src/write.js:23)


@dataclass
class ColumnSpec:
    """Per-column overrides."""

    encoding: Optional[Encoding] = None  # force E1-E7 path, disables dict
    codec: Optional[Codec] = None
    column_index: bool = True
    offset_index: bool = True
    bloom_filter: Union[bool, dict] = False  # dict: {fpp, max_bytes}
    fsst: bool = False  # opt-in FSST page compression for text
    geospatial: bool = False  # WKB column: bbox + type-code statistics


@dataclass
class WriteOptions:
    codec: Codec = Codec.SNAPPY
    codec_level: int | None = None  # pyarrow compression_level (e.g. zstd 1-22)
    compressors: Optional[dict[str, Callable[[bytes], bytes]]] = None
    statistics: bool = True
    row_group_size: tuple = DEFAULT_ROW_GROUP_SIZE
    page_size: int = DEFAULT_PAGE_SIZE
    kv_metadata: Optional[list[tuple[str, str]]] = None
    # 'reference' = dictionary-or-plain like the reference writer;
    # 'smart' = extended auto-selection (delta for sorted ints/timestamps,
    # delta-length for text, byte-stream-split for floats)
    auto_codec: str = "reference"
    # sort dictionary entries by descending frequency so hot values get
    # the small RLE/bit-packed indices (the reference's own open TODO,
    # src/dictionary.js:133). Opt-in: changes page bytes vs reference.
    dict_sort_frequency: bool = False
    # write PageHeader.crc (CRC-32 of the post-header page bytes) on
    # every data/dictionary page; verified by pyarrow with
    # page_checksum_verification=True. Opt-in: adds ~6 bytes/page and
    # changes bytes vs the reference (which serializes but never
    # computes the field, src/datapage.js:113).
    page_crc: bool = False
    # RowGroup.sorting_columns footer metadata: the rows of every row
    # group are sorted by these columns. Each entry is
    # (column_name, descending, nulls_first); serialized per the spec
    # as leaf ordinals (reference src/metadata.js:92-96). The writer
    # does NOT re-sort — callers assert the order they produced
    # (e.g. write_parquet_dataset(sort_by=...)).
    sorting_columns: Optional[list[tuple[str, bool, bool]]] = None
    column_specs: dict[str, ColumnSpec] = field(default_factory=dict)
    # per-column SchemaElement replacement (logical-type annotations like
    # UUID/JSON/ENUM that keep the same physical layout; reference
    # schemaOverrides, src/schema.js:25-41)
    schema_overrides: dict = field(default_factory=dict)
    created_by: str = "hyparquet-writer-ray 0.1.0"

    def spec(self, column: str) -> ColumnSpec:
        return self.column_specs.get(column) or ColumnSpec()
