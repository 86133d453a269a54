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
    column_specs: dict[str, ColumnSpec] = field(default_factory=dict)
    # per-column SchemaElement replacement (logical-type annotations like
    # UUID/JSON/ENUM that keep the same physical layout; reference
    # schemaOverrides, src/schema.js:25-41)
    schema_overrides: dict = field(default_factory=dict)
    created_by: str = "hyparquet-writer-ray 0.1.0"

    def spec(self, column: str) -> ColumnSpec:
        return self.column_specs.get(column) or ColumnSpec()
