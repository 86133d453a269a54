"""Sequence packing: group documents into token-budgeted training
sequences (the pretraining batch-construction step — concatenate short
documents up to a context-length budget so padding waste stays low).

Scale shape: documents are bucketed by ``id % num_buckets`` (a
CONSTANT group count, deterministic in the data, independent of block
layout — pack ids and bin contents are reproducible across runs and
cluster sizes), then each bucket packs independently: sort by token
count DESCENDING (first-fit-decreasing flavor), then next-fit bins via
``np.searchsorted`` jumps over the cumulative sum — O(bins) short
iterations per bucket, never a Python loop over documents. Documents
larger than the budget get a single-doc bin flagged ``oversize`` (the
caller decides truncate vs drop). Next-fit-decreasing guarantees any
two consecutive bins sum over budget, so bins < 2x optimal + 1 per
bucket — the self-verifying bound the query gate asserts.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.arrays import single_chunk

# pack_id = bucket * _PACK_STRIDE + local bin index; buckets hold well
# under 2^40 bins for any realistic batch size
_PACK_STRIDE = 1 << 40


def pack_bucket_arrays(ids: np.ndarray, tokens: np.ndarray,
                       budget: int) -> list[tuple[int, np.ndarray, int]]:
    """Pack one bucket: returns [(local_bin, member_ids, token_sum)].
    Deterministic: sort by (-tokens, id), then next-fit by cumsum
    jumps."""
    order = np.lexsort((ids, -tokens))
    ids_s, tok_s = ids[order], tokens[order]
    csum = np.cumsum(tok_s)
    bins: list[tuple[int, np.ndarray, int]] = []
    start = 0
    n = len(ids_s)
    base = 0  # csum consumed before current bin
    while start < n:
        # longest prefix from `start` with sum <= budget
        end = int(np.searchsorted(csum, base + budget, side="right"))
        if end <= start:  # single doc over budget -> own (oversize) bin
            end = start + 1
        bins.append((len(bins), ids_s[start:end],
                     int(csum[end - 1] - base)))
        base = csum[end - 1]
        start = end
    return bins


def pack_sequences(ds, *, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens", budget: int = 2048,
                   num_buckets: int = 64):
    """Pack (id, token-count) rows into budgeted bins. Returns one row
    per bin: ``pack_id`` (deterministic), ``doc_ids`` (list, in pack
    order), ``n_docs``, ``n_tokens``, ``oversize``. Null token counts
    pack as 0 (the document still lands in exactly one bin)."""
    NB = max(int(num_buckets), 1)
    budget = int(budget)

    def tag(batch: pa.Table) -> pa.Table:
        ids = single_chunk(batch.column(id_col))
        if ids.null_count:
            # a null id would NaN-cast to INT64_MIN and emit a garbage
            # doc id inside the pack manifests
            raise ValueError("pack_sequences: null doc ids unsupported")
        b = ids.to_numpy(zero_copy_only=False).astype(np.int64) % NB
        return pa.table({
            id_col: ids,
            tokens_col: pc.fill_null(
                single_chunk(batch.column(tokens_col)).cast(pa.int64()), 0),
            "__bucket": pa.array(b),
        })

    def pack(group: pa.Table) -> pa.Table:
        if "__bucket" not in group.column_names or group.num_rows == 0:
            return pa.table({
                "pack_id": pa.array([], pa.int64()),
                "doc_ids": pa.array([], pa.list_(pa.int64())),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "oversize": pa.array([], pa.bool_()),
            })
        bucket = int(group.column("__bucket")[0].as_py())
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        toks = group.column(tokens_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bins = pack_bucket_arrays(ids, toks, budget)
        offsets = np.zeros(len(bins) + 1, np.int32)
        for i, (_, members, _) in enumerate(bins):
            offsets[i + 1] = offsets[i] + len(members)
        flat = np.concatenate([m for _, m, _ in bins]) if bins else \
            np.array([], np.int64)
        return pa.table({
            "pack_id": pa.array(
                [bucket * _PACK_STRIDE + b for b, _, _ in bins],
                pa.int64()),
            "doc_ids": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat, pa.int64())),
            "n_docs": pa.array(
                [len(m) for _, m, _ in bins], pa.int64()),
            "n_tokens": pa.array([s for _, _, s in bins], pa.int64()),
            "oversize": pa.array(
                [s > budget for _, _, s in bins], pa.bool_()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    return tagged.groupby("__bucket").map_groups(
        pack, batch_format="pyarrow")
