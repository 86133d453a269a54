"""Distribution statistics over integer metric columns.

``exact_quantiles`` computes EXACT discrete quantiles (DuckDB
``quantile_disc`` semantics: the sorted element at index
``floor((n-1)*q)``) with one value-histogram shuffle: each batch
collapses to (value, count) partials via ``np.unique`` BEFORE the
shuffle, the groupby moves distinct-value-sized rows, and the driver
merges only the final histogram. The contract — like ``top_tokens`` —
is that the DISTINCT value set is small (doc lengths, token counts,
quality scores: thousands of values at any corpus size); the raw rows
never leave the cluster.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.arrays import single_chunk

_PART_SCHEMA = pa.schema([("v", pa.int64()), ("n", pa.int64())])


def exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99)) -> pa.Table:
    """(q:double, value:int64) table of exact discrete quantiles of
    ``ds[col]`` (nulls ignored), matching SQL ``quantile_disc``."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _PART_SCHEMA.empty_table()
        arr = single_chunk(batch.column(col))
        if arr.null_count:
            arr = arr.drop_null()
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = hist.groupby("v").sum("n")
    parts = [
        b for b in merged.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    v = t.column("v").to_numpy(zero_copy_only=False)
    n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        idx = int(np.floor((total - 1) * float(q)))  # quantile_disc rule
        k = int(np.searchsorted(cum, idx + 1))
        out_q.append(float(q))
        out_v.append(int(v[k]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})
