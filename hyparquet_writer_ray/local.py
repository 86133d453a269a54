"""Single-process writer API — the reference's entry points re-expressed
over Arrow tables (parquetWrite / parquetWriteBuffer / ParquetWriter /
parquetWriteRows; reference src/write.js:16-72, src/write-rows.js:36-178,
src/parquet-writer.js:18-216).

The distributed path (pipelines.write) reuses the same encode_row_group /
FileAssembler primitives; this module is the local harness used by tests
and small files.
"""
from __future__ import annotations

import io
from typing import BinaryIO, Iterable, Optional, Union

import pyarrow as pa

from .core.assemble import FileAssembler
from .core.options import WriteOptions
from .core.rowgroup import encode_row_group
from .core.schema import normalize_table, schema_from_arrow
from .core.types import SchemaElement, leaf_columns


def row_group_slices(num_rows: int, schedule) -> list[tuple[int, int]]:
    """Row ranges per the reference's rowGroupSize schedule: entries are
    consumed in order and the last one repeats (src/parquet-writer.js:202-216)."""
    if isinstance(schedule, int):
        schedule = (schedule,)
    out = []
    start = 0
    i = 0
    while start < num_rows:
        size = schedule[min(i, len(schedule) - 1)]
        out.append((start, min(start + size, num_rows)))
        start += size
        i += 1
    return out


class ParquetWriter:
    """Incremental writer: call ``write(table)`` repeatedly, then ``finish()``
    (reference src/parquet-writer.js:18 exported class)."""

    def __init__(
        self,
        sink: BinaryIO,
        schema: Union[pa.Schema, list[SchemaElement]],
        opts: Optional[WriteOptions] = None,
    ) -> None:
        self.opts = opts or WriteOptions()
        if isinstance(schema, pa.Schema):
            self.arrow_schema = schema
            self.schema_ir = schema_from_arrow(schema, self.opts.schema_overrides)
        else:
            self.arrow_schema = None
            self.schema_ir = schema
        self.leaves = leaf_columns(self.schema_ir)
        self.assembler = FileAssembler(sink, self.schema_ir, self.opts)
        self._groups_written = 0

    def write(self, table: pa.Table, split_row_groups: bool = True) -> None:
        table = normalize_table(table)
        if split_row_groups:
            slices = row_group_slices(table.num_rows, self._remaining_schedule())
        else:
            slices = [(0, table.num_rows)]
        for (r0, r1) in slices:
            group = table.slice(r0, r1 - r0)
            blob, meta = encode_row_group(group, self.schema_ir, self.leaves, self.opts)
            self.assembler.append_group(blob, meta)
            self._groups_written += 1

    def _remaining_schedule(self):
        sched = self.opts.row_group_size
        if isinstance(sched, int):
            return (sched,)
        return tuple(sched[min(self._groups_written, len(sched) - 1):]) or (sched[-1],)

    def finish(self) -> None:
        self.assembler.finish()


def write_table(
    table: pa.Table,
    sink: Union[str, BinaryIO],
    opts: Optional[WriteOptions] = None,
) -> None:
    """Whole-table write (reference parquetWrite, src/write.js:16-60).

    Path sinks are written via a temp file + atomic rename so a failed
    write never leaves a truncated .parquet behind."""
    opts = opts or WriteOptions()
    table = normalize_table(table)
    if isinstance(sink, str):
        import os

        tmp = sink + ".inprogress"
        try:
            with open(tmp, "wb") as f:
                pw = ParquetWriter(f, table.schema, opts)
                pw.write(table)
                pw.finish()
            os.replace(tmp, sink)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return
    pw = ParquetWriter(sink, table.schema, opts)
    pw.write(table)
    pw.finish()


def write_table_to_bytes(table: pa.Table, opts: Optional[WriteOptions] = None) -> bytes:
    """reference parquetWriteBuffer (src/write.js:68-72)."""
    sink = io.BytesIO()
    write_table(table, sink, opts)
    return sink.getvalue()


def write_rows(
    rows: Iterable[dict],
    sink: Union[str, BinaryIO],
    schema: Optional[pa.Schema] = None,
    opts: Optional[WriteOptions] = None,
) -> None:
    """Streaming row-dict source: buffers one row-group window at a time
    (reference parquetWriteRows, src/write-rows.js:36-178). Peak memory is
    one window regardless of total rows."""
    opts = opts or WriteOptions()
    sched = opts.row_group_size
    if isinstance(sched, int):
        sched = (sched,)
    own = isinstance(sink, str)
    f = open(sink, "wb") if own else sink
    pw: Optional[ParquetWriter] = None
    try:
        window: list[dict] = []
        gi = 0
        target = sched[0]

        def flush() -> None:
            nonlocal pw, gi, target
            if not window:
                return
            table = pa.Table.from_pylist(window, schema=schema)
            table = normalize_table(table)
            if pw is None:
                pw = ParquetWriter(f, table.schema, opts)
            pw.write(table, split_row_groups=False)
            window.clear()
            gi += 1
            target = sched[min(gi, len(sched) - 1)]

        for row in rows:
            window.append(row)
            if len(window) >= target:
                flush()
        flush()
        if pw is None:
            # zero rows: emit a valid empty file (src/write-rows.js:162-172)
            if schema is None:
                raise ValueError("zero rows and no schema: cannot write empty file")
            pw = ParquetWriter(f, schema, opts)
        pw.finish()
    finally:
        if own:
            f.close()
