"""Conformance corpus (FIXTURES.md F5): golden files from
apache/parquet-testing (via the reference's test/files) are read with
pyarrow, re-written with our engine using the same schema, and re-read
expecting deep equality (reference test/write.roundtrip.test.js).

geospatial.parquet is excluded: pyarrow 16 cannot read its GEOMETRY
logical type at all, so there is no arrow-level oracle for it here
(our own WKB/bbox support is covered in test_geo.py).
"""
from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from conftest import assert_roundtrip

FILES_DIR = "/root/reference/test/files"
GOLDEN = [
    "signs.parquet",
    "fixed_length_decimal.parquet",
    "float16_nonzeros_and_nans.parquet",
    "listy.parquet",
    "nullable.impala.parquet",
    "nonnullable.impala.parquet",
]


@pytest.mark.parametrize("fname", GOLDEN)
def test_golden_roundtrip(fname):
    table = pq.read_table(os.path.join(FILES_DIR, fname))
    if fname == "float16_nonzeros_and_nans.parquet":
        # NaN != NaN under table.equals; compare bitwise
        import io

        import numpy as np

        from hyparquet_writer_ray import write_table_to_bytes

        buf = write_table_to_bytes(table)
        got = pq.read_table(io.BytesIO(buf))
        a = np.array(table.column(0).to_pylist(), dtype=np.float16)
        b = np.array(got.column(0).to_pylist(), dtype=np.float16)
        assert (np.isnan(a) == np.isnan(b)).all()
        m = ~np.isnan(a)
        assert (a[m].view(np.uint16) == b[m].view(np.uint16)).all()
        return
    assert_roundtrip(table)


def test_rows_path_matches_columnar_path():
    """The row-streaming source must produce byte-identical output to the
    columnar path for the same data and options
    (reference test/write.rows.test.js:26)."""
    import io

    import pyarrow as pa

    from hyparquet_writer_ray import WriteOptions, write_rows, write_table_to_bytes

    rows = [{"a": i, "s": f"v{i % 7}", "d": i / 3} for i in range(2500)]
    table = pa.Table.from_pylist(rows)
    opts = WriteOptions(row_group_size=(1000,))
    columnar = write_table_to_bytes(table, opts)
    sink = io.BytesIO()
    write_rows(iter(rows), sink, schema=table.schema, opts=WriteOptions(row_group_size=(1000,)))
    assert sink.getvalue() == columnar
