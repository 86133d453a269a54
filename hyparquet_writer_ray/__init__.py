"""hyparquet_writer_ray: a Ray-Data-native parquet column-chunk encoding
engine with the capabilities of hyparam/hyparquet-writer (see SURVEY.md).

Local (single-process) API: write_table / write_table_to_bytes /
ParquetWriter / write_rows. Distributed API: pipelines.write.
"""
from .core.bufwriter import BufWriter
from .core.geo import geojson_to_wkb, wkb_to_geojson
from .core.options import ColumnSpec, WriteOptions
from .core.schema import schema_from_arrow
from .core.types import Codec, Encoding
from .local import (
    ParquetWriter,
    auto_schema_from_rows,
    write_rows,
    write_rows_async,
    write_table,
    write_table_to_bytes,
)
from .pipelines.write import (
    compact_parquet_dataset,
    read_parquet_fused,
    write_parquet_dataset,
    write_parquet_files,
    write_parquet_single_file,
    write_table_parallel,
)

__version__ = "0.1.0"

__all__ = [
    "BufWriter",
    "geojson_to_wkb",
    "wkb_to_geojson",
    "schema_from_arrow",
    "ColumnSpec",
    "WriteOptions",
    "Codec",
    "Encoding",
    "ParquetWriter",
    "write_rows",
    "write_rows_async",
    "auto_schema_from_rows",
    "write_table",
    "write_table_to_bytes",
    "write_parquet_dataset",
    "write_parquet_files",
    "compact_parquet_dataset",
    "read_parquet_fused",
    "write_parquet_single_file",
    "write_table_parallel",
]
