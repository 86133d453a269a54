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
        if ids.null_count:
            # NaN->uint64 is platform-dependent: a null id would break
            # the reproducible-permutation guarantee silently
            raise ValueError("deterministic_shuffle: null ids unsupported")
        k = shuffle_key(ids.to_numpy(zero_copy_only=False), seed)
        # stored uint64 so the exported order is exactly
        # np.argsort(shuffle_key(ids, seed)) — no signed reinterpretation
        return batch.append_column("__shuffle_key", pa.array(k, pa.uint64()))

    out = ds.map_batches(add_key, batch_format="pyarrow",
                         zero_copy_batch=True).sort("__shuffle_key")
    if keep_key:
        return out
    return out.drop_columns(["__shuffle_key"])


def _unit_uniform(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic u in (0,1): top 53 bits of the shuffle key."""
    k = shuffle_key(ids, seed)
    return ((k >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0 ** -53


def weighted_sample(ds, *, weight_col: str, id_col: str = "doc_id",
                    k: int = 100, seed: int = 0):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis 2006): row i gets key ``ln(u_i) / w_i`` (the
    log form of ``u_i ** (1/w_i)`` — same order, but it never
    saturates to 1.0 at huge weights the way the power form does, so
    determinism survives any weight magnitude) with ``u_i`` derived
    from ``splitmix64(id ^ mix(seed))``; the k largest keys win —
    inclusion probability proportional to weight, reproducible across
    runs/partitionings (the data-mixture primitive: upweight a
    domain/quality score, draw the same sample every epoch).

    Scale shape: each batch reduces to its local top-k (one argpartition
    — no sort of the full batch), so the driver merges only
    k x n_batches candidate rows; no shuffle at all. Rows with
    non-positive or null weights are excluded (P=0). Returns
    ``(id, weight, es_key)`` sorted by key descending, truncated to k.
    """
    def local_topk(batch: pa.Table) -> pa.Table:
        ids = single_chunk(batch.column(id_col)).cast(pa.int64())
        if ids.null_count:
            raise ValueError("weighted_sample: null ids unsupported")
        w = single_chunk(batch.column(weight_col)).cast(pa.float64())
        idv = ids.to_numpy(zero_copy_only=False)
        wv = w.to_numpy(zero_copy_only=False)
        ok = np.isfinite(wv) & (wv > 0)
        idv, wv = idv[ok], wv[ok]
        if len(idv) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64()),
                             "es_key": pa.array([], pa.float64())})
        key = np.log(_unit_uniform(idv, seed)) / wv
        if len(key) > k:
            part = np.argpartition(key, len(key) - k)[len(key) - k:]
            idv, wv, key = idv[part], wv[part], key[part]
        return pa.table({id_col: pa.array(idv),
                         "weight": pa.array(wv),
                         "es_key": pa.array(key)})

    cands = ds.map_batches(local_topk, batch_format="pyarrow",
                           zero_copy_batch=True)
    batches = list(cands.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
    if not batches:  # zero input blocks: typed empty result
        return pa.table({id_col: pa.array([], pa.int64()),
                         "weight": pa.array([], pa.float64()),
                         "es_key": pa.array([], pa.float64())})
    merged = pa.concat_tables(batches)
    order = np.argsort(merged.column("es_key").to_numpy(
        zero_copy_only=False))[::-1][:k]
    return merged.take(pa.array(order))
