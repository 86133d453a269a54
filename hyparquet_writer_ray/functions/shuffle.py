"""Deterministic global shuffle for training-data export.

``ray.data.Dataset.random_shuffle`` is nondeterministic across runs and
cluster shapes; a pretraining export wants a SEEDED, reproducible
permutation so a resumed or re-sharded run reads the same epoch order.
The standard trick: give every row the key ``splitmix64(id XOR
mix(seed))`` — a bijection on uint64, so unique ids get unique keys —
and range-sort by it. The sort is Ray Data's sample-based range
exchange (the one intentional all-to-all here: a global shuffle IS an
all-to-all), after which block order == global order and a part-file
export preserves it.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.arrays import single_chunk
from .sketches import _splitmix64


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """uint64 sort keys for ``ids`` under ``seed`` (pure, driver-safe
    for verification)."""
    salt = _splitmix64(np.array([seed], np.uint64))[0]
    return _splitmix64(ids.astype(np.uint64) ^ salt)


def deterministic_shuffle(ds, *, id_col: str = "doc_id", seed: int = 0,
                          keep_key: bool = False):
    """Seeded reproducible permutation of ``ds`` by ``id_col``.

    Returns the dataset globally ordered by the derived key; iterate or
    export it part-by-part to materialize the epoch order. ``keep_key``
    retains the ``__shuffle_key`` column for downstream verification.
    """
    def add_key(batch: pa.Table) -> pa.Table:
        ids = single_chunk(batch.column(id_col)).cast(pa.int64())
        k = shuffle_key(ids.to_numpy(zero_copy_only=False), seed)
        # stored uint64 so the exported order is exactly
        # np.argsort(shuffle_key(ids, seed)) — no signed reinterpretation
        return batch.append_column("__shuffle_key", pa.array(k, pa.uint64()))

    out = ds.map_batches(add_key, batch_format="pyarrow",
                         zero_copy_batch=True).sort("__shuffle_key")
    if keep_key:
        return out
    return out.drop_columns(["__shuffle_key"])
