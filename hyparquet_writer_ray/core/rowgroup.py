"""Row-group encoding: one Arrow table (block) -> one relocatable blob
containing every leaf's column chunk, plus metadata with relative
offsets (reference: src/parquet-writer.js:63-144). This is the pure
function each Ray encode task runs."""
from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from .chunk import ChunkMeta, encode_chunk
from .nested import nested_leaf_arrays
from .options import WriteOptions
from .types import LeafInfo, SchemaElement


@dataclass
class RowGroupMeta:
    num_rows: int
    # (chunk offset within group blob, ChunkMeta) per leaf, schema order
    chunks: list[tuple[int, ChunkMeta]]
    total_byte_size: int  # uncompressed
    total_compressed_size: int


def encode_row_group(
    table: pa.Table,
    schema_ir: list[SchemaElement],
    leaves: list[LeafInfo],
    opts: WriteOptions,
) -> tuple[bytes, RowGroupMeta]:
    parts: list[bytes] = []
    chunks: list[tuple[int, ChunkMeta]] = []
    pos = 0
    total_uncomp = 0

    # leaves are in schema (preorder) order; top-level column name is path[0]
    leaf_arrays = _leaf_arrays(table, leaves)
    for leaf, arr_and_levels in zip(leaves, leaf_arrays):
        key = ".".join(leaf.path)
        spec = opts.column_specs.get(key) or opts.spec(leaf.path[0])
        blob, meta = encode_chunk(arr_and_levels, leaf, spec, opts)
        parts.append(blob)
        chunks.append((pos, meta))
        pos += len(blob)
        total_uncomp += meta.total_uncompressed_size

    return b"".join(parts), RowGroupMeta(
        num_rows=table.num_rows,
        chunks=chunks,
        total_byte_size=total_uncomp,
        total_compressed_size=pos,
    )


def _leaf_arrays(table: pa.Table, leaves: list[LeafInfo]):
    """Resolve each leaf to its values array (+ levels for nested columns)."""
    out = []
    cols_by_name = {name: col for name, col in zip(table.column_names, table.columns)}
    if len(cols_by_name) != table.num_columns:
        # a name-keyed lookup would silently write one column's data into
        # every same-named chunk
        raise ValueError("duplicate top-level column names are unsupported")
    nested_cache: dict[str, list] = {}
    for leaf in leaves:
        top = leaf.path[0]
        col = cols_by_name[top]
        if len(leaf.path) == 1 and leaf.max_repetition_level == 0:
            out.append(col)
        else:
            # nested column: expand all of its leaves once, then consume
            if top not in nested_cache:
                nested_cache[top] = nested_leaf_arrays(col, [l for l in leaves if l.path[0] == top])
            out.append(nested_cache[top].pop(0))
    return out
