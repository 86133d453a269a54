"""Small shared helpers for operator pipelines."""
from __future__ import annotations

import pyarrow as pa


def ensure_schema(ds, schema: pa.Schema):
    """Normalize a Dataset so every block carries ``schema``.

    Ray's hash aggregations can emit schema-LESS empty blocks for empty
    partitions; a downstream hash join then fails with
    ``No match ... for key field reference`` when such a block reaches
    it. Mapping every batch through a cast (and replacing 0-column
    empties with a typed empty table) makes join inputs safe."""

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return schema.empty_table()
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
