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


def _topk_kernel(keys: pa.Array, vals: np.ndarray, ids: np.ndarray,
                 k: int) -> np.ndarray:
    """Row indices of the per-key top-k (value DESC, id ASC ties) —
    one dictionary encode + one lexsort + one rank pass, no per-key
    Python."""
    import pyarrow.compute as pc

    codes = pc.fill_null(
        pc.dictionary_encode(keys).indices.cast(pa.int64()), -1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -vals, codes))
    c_s = codes[order]
    new = np.ones(len(order), bool)
    new[1:] = c_s[1:] != c_s[:-1]
    seg_start = np.nonzero(new)[0]
    rank = np.arange(len(order)) - np.repeat(seg_start, np.diff(
        np.append(seg_start, len(order))))
    return np.sort(order[rank < k])


def group_topk(ds, *, key_col: str, value_col: str, id_col: str,
               k: int = 10, num_buckets: int = 64):
    """Per-group top-k: for every distinct ``key_col`` value, the ``k``
    rows with the highest ``value_col`` (ties keep the smallest
    ``id_col``) — SQL ``row_number() OVER (PARTITION BY key ORDER BY
    value DESC, id) <= k``.

    Scale shape: the top-k is PUSHED INTO the map side — each batch
    shrinks to at most k rows per key it contains before anything
    moves — then ONE constant-bucket shuffle (``hash(key) % NB``, one
    task per bucket, never one per key) finishes with the same
    vectorized kernel. Global sort never happens; bytes moved are
    O(k x distinct keys), not O(rows)."""
    import pyarrow.compute as pc

    NB = max(int(num_buckets), 1)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch
        keys = single_chunk(batch.column(key_col))
        vals = pc.fill_null(
            single_chunk(batch.column(value_col)).cast(pa.float64()),
            float("-inf"),
        ).to_numpy(zero_copy_only=False)
        ids = single_chunk(batch.column(id_col)).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = _topk_kernel(keys, vals, ids, k)
        out = batch.take(pa.array(keep))
        from .joins import _bucket_of

        return out.append_column(
            "__bucket", pa.array(_bucket_of(single_chunk(out.column(key_col)), NB)))

    def final(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return group
        keys = single_chunk(group.column(key_col))
        vals = pc.fill_null(
            single_chunk(group.column(value_col)).cast(pa.float64()),
            float("-inf"),
        ).to_numpy(zero_copy_only=False)
        ids = single_chunk(group.column(id_col)).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = _topk_kernel(keys, vals, ids, k)
        return group.take(pa.array(keep)).drop_columns(["__bucket"])

    reduced = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return reduced.groupby("__bucket").map_groups(final, batch_format="pyarrow")
