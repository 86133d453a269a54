"""FileMetaData / ColumnIndex / OffsetIndex Thrift serialization
(reference: src/metadata.js:17-168, src/indexes.js:15-62).

Field ids follow parquet.thrift; this is the wire format, so the
structure is necessarily the same as any parquet writer's.
"""
from __future__ import annotations

from typing import Optional

from .bufwriter import BufWriter
from .chunk import ChunkMeta, ColumnIndexData, PageLocation
from .geo import geo_stats_thrift as _geo_thrift
from .statistics import statistics_thrift
from .thrift import I64, Byte, write_struct
from .types import LogicalType, SchemaElement


_GEO_EDGE_ALGOS = {"SPHERICAL": 0, "VINCENTY": 1, "THOMAS": 2,
                   "ANDOYER": 3, "KARNEY": 4}


def logical_type_thrift(lt: Optional[LogicalType]):
    if lt is None:
        return None
    k, p = lt.kind, lt.params
    empty: dict[int, object] = {}
    simple = {
        "STRING": 1, "MAP": 2, "LIST": 3, "ENUM": 4, "DATE": 6,
        "NULL": 11, "JSON": 12, "BSON": 13, "UUID": 14, "FLOAT16": 15,
        "VARIANT": 16,
    }
    if k in simple:
        return {simple[k]: empty}
    if k == "DECIMAL":
        return {5: {1: p["scale"], 2: p["precision"]}}
    if k in ("TIME", "TIMESTAMP"):
        unit = {"MILLIS": 1, "MICROS": 2, "NANOS": 3}[p["unit"]]
        fid = 7 if k == "TIME" else 8
        return {fid: {1: bool(p.get("isAdjustedToUTC", False)), 2: {unit: empty}}}
    if k == "INTEGER":
        return {10: {1: Byte(p["bitWidth"]), 2: bool(p["isSigned"])}}
    if k == "GEOMETRY":
        return {17: {1: p.get("crs")}}
    if k == "GEOGRAPHY":
        algo = p.get("algorithm")
        if isinstance(algo, str):
            # thrift field 2 is the EdgeInterpolationAlgorithm ENUM —
            # a raw string would emit a BINARY field readers reject
            try:
                algo = _GEO_EDGE_ALGOS[algo.upper()]
            except KeyError:
                raise ValueError(
                    f"unknown geography algorithm {algo!r} "
                    f"(one of {sorted(_GEO_EDGE_ALGOS)})") from None
        return {18: {1: p.get("crs"), 2: algo}}
    raise ValueError(f"unknown logical type {k}")


def schema_element_thrift(el: SchemaElement) -> dict[int, object]:
    return {
        1: None if el.type is None else int(el.type),
        2: el.type_length,
        3: None if el.repetition is None else int(el.repetition),
        4: el.name,
        5: el.num_children,
        6: None if el.converted_type is None else int(el.converted_type),
        7: el.scale,
        8: el.precision,
        9: el.field_id,
        10: logical_type_thrift(el.logical_type),
    }


class AbsoluteChunk:
    """A chunk whose offsets have been rebased to absolute file positions."""

    __slots__ = (
        "meta", "file_offset", "data_page_offset", "dictionary_page_offset",
        "offset_index_abs", "column_index_offset", "column_index_length",
        "offset_index_offset", "offset_index_length",
        "bloom_filter_offset", "bloom_filter_length",
    )

    def __init__(self, meta: ChunkMeta, chunk_abs_offset: int) -> None:
        self.meta = meta
        self.file_offset = chunk_abs_offset
        self.data_page_offset = chunk_abs_offset + meta.data_page_offset
        self.dictionary_page_offset = (
            None if meta.dictionary_page_offset is None
            else chunk_abs_offset + meta.dictionary_page_offset
        )
        self.offset_index_abs = (
            None if meta.offset_index is None
            else [
                PageLocation(
                    rel_offset=chunk_abs_offset + p.rel_offset,
                    compressed_page_size=p.compressed_page_size,
                    first_row_index=p.first_row_index,
                )
                for p in meta.offset_index
            ]
        )
        self.column_index_offset = None
        self.column_index_length = None
        self.offset_index_offset = None
        self.offset_index_length = None
        self.bloom_filter_offset = None
        self.bloom_filter_length = None

    def thrift(self) -> dict[int, object]:
        m = self.meta
        meta_data = {
            1: m.ptype,
            2: list(m.encodings),
            3: list(m.path),
            4: m.codec,
            5: I64(m.num_values),
            6: I64(m.total_uncompressed_size),
            7: I64(m.total_compressed_size),
            8: None if getattr(m, "kv_metadata", None) is None else [
                {1: k, 2: v} for k, v in m.kv_metadata
            ],
            9: I64(self.data_page_offset),
            11: None if self.dictionary_page_offset is None else I64(self.dictionary_page_offset),
            12: None if m.stats is None else statistics_thrift(m.stats),
            13: None if m.encoding_stats is None else [
                {1: pt, 2: enc, 3: count} for (pt, enc, count) in m.encoding_stats
            ],
            14: None if self.bloom_filter_offset is None else I64(self.bloom_filter_offset),
            15: self.bloom_filter_length,
            17: None if getattr(m, "geo_stats", None) is None else _geo_thrift(m.geo_stats),
        }
        return {
            2: I64(self.file_offset),
            3: meta_data,
            4: None if self.offset_index_offset is None else I64(self.offset_index_offset),
            5: self.offset_index_length,
            6: None if self.column_index_offset is None else I64(self.column_index_offset),
            7: self.column_index_length,
        }


def column_index_thrift(ci: ColumnIndexData) -> dict[int, object]:
    return {
        1: [bool(x) for x in ci.null_pages],
        2: [bytes(x) for x in ci.min_values],
        3: [bytes(x) for x in ci.max_values],
        4: int(ci.boundary_order),
        5: [I64(x) for x in ci.null_counts],
    }


def offset_index_thrift(pages: list[PageLocation]) -> dict[int, object]:
    return {
        1: [
            {1: I64(p.rel_offset), 2: p.compressed_page_size, 3: I64(p.first_row_index)}
            for p in pages
        ]
    }


def file_metadata_thrift(
    schema: list[SchemaElement],
    row_groups: list[dict],
    num_rows: int,
    kv_metadata: Optional[list[tuple[str, str]]],
    created_by: str,
    num_leaves: int = 0,
) -> dict[int, object]:
    return {
        1: 2,  # version
        2: [schema_element_thrift(el) for el in schema],
        3: I64(num_rows),
        4: row_groups,
        5: None if kv_metadata is None else [{1: k, 2: v} for k, v in kv_metadata],
        6: created_by,
        # column_orders TYPE_ORDER per leaf: readers only trust
        # min_value/max_value statistics when this is present
        7: [{1: {}} for _ in range(num_leaves)] if num_leaves else None,
    }


def row_group_thrift(
    chunks: list[AbsoluteChunk],
    total_byte_size: int,
    num_rows: int,
    file_offset: Optional[int] = None,
    total_compressed_size: Optional[int] = None,
    sorting_columns: Optional[list[tuple[int, bool, bool]]] = None,
) -> dict[int, object]:
    # sorting_columns: (leaf_ordinal, descending, nulls_first) triples,
    # RowGroup field 4 (reference src/metadata.js:92-96)
    return {
        1: [c.thrift() for c in chunks],
        2: I64(total_byte_size),
        3: I64(num_rows),
        4: None if sorting_columns is None else [
            {1: idx, 2: desc, 3: nf} for idx, desc, nf in sorting_columns
        ],
        5: None if file_offset is None else I64(file_offset),
        6: None if total_compressed_size is None else I64(total_compressed_size),
    }


def resolve_sorting_columns(
    schema_ir: list[SchemaElement],
    sorting_columns: Optional[list[tuple[str, bool, bool]]],
) -> Optional[list[tuple[int, bool, bool]]]:
    """Map WriteOptions.sorting_columns names to leaf ordinals.

    SortingColumn.column_idx indexes the row group's column-chunk list,
    which is the depth-first leaf order of the schema. Only TOP-LEVEL
    primitive columns are sortable (sorting by part of a list/map has
    no defined row order), and name resolution considers only those —
    a nested leaf that happens to share the name (e.g. a map's
    ``value``) never shadows a top-level column. Unknown names raise.
    """
    if not sorting_columns:
        return None
    from .types import iter_dfs_leaves

    top_level: dict[str, int] = {}
    for leaf_ord, el, is_top in iter_dfs_leaves(
        schema_ir[0].num_children or 0,
        ((e, e.num_children, e.is_leaf) for e in schema_ir[1:]),
    ):
        if is_top and el.name not in top_level:
            top_level[el.name] = leaf_ord
    out = []
    for name, desc, nulls_first in sorting_columns:
        if name not in top_level:
            raise ValueError(
                f"sorting_columns: {name!r} is not a top-level leaf "
                f"column (sortable: {sorted(top_level)})"
            )
        out.append((top_level[name], bool(desc), bool(nulls_first)))
    return out


def write_footer(
    w: BufWriter,
    schema: list[SchemaElement],
    row_groups: list[dict],
    num_rows: int,
    kv_metadata,
    created_by: str,
    num_leaves: int = 0,
) -> None:
    start = w.offset
    write_struct(
        w,
        file_metadata_thrift(
            schema, row_groups, num_rows, kv_metadata, created_by, num_leaves
        ),
    )
    w.u32(w.offset - start)
    w.write(b"PAR1")
