"""Windowed aggregates over event streams.

Scale shape: a vectorized per-batch *partial* aggregate (combiner)
collapses each batch to one row per window BEFORE the shuffle, so the
groupby moves only (window, partials) rows — not events
(SURVEY.md §7.3 / 'push aggregation partial').
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.arrays import single_chunk



def _ts_us(arr: pa.Array) -> np.ndarray:
    """Microseconds-since-epoch for a timestamp column of ANY unit
    (timestamp[s/ms/us/ns] all normalize; plain int64 columns are taken
    as microseconds). Null timestamps raise — a window or session at an
    unknown time is undefined (SQL would emit a null group; callers
    should filter nulls explicitly first)."""
    arr = single_chunk(arr) if hasattr(arr, "num_chunks") else arr
    if arr.null_count:
        raise ValueError("window ops: null timestamps are unsupported; "
                         "filter them out first")
    t = arr.type
    if pa.types.is_timestamp(t):
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # integer unit conversion: an arrow safe-cast ns->us would raise
        # on sub-microsecond residue; truncate instead (floor division)
        return {"s": v * 1_000_000, "ms": v * 1_000,
                "us": v, "ns": v // 1_000}[t.unit]
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window_agg(
    ds,
    *,
    ts_col: str = "ts",
    width_seconds: int = 600,
    sum_col: str | None = None,
    sort: bool = True,
):
    """count(*) (+ optional integer sum) per epoch-aligned tumbling
    window. Returns a Dataset with columns
    (w_start:int64 epoch-seconds, n:int64[, sum_<col>:int64]).

    ``sort=True`` (default) orders the output by ``w_start`` so results
    are deterministic — Ray's groupby emits partitions in a
    nondeterministic order, and windowed output is expected in time
    order. The sort runs over the already-aggregated (tiny) table, not
    over the event stream, so its cost is negligible at any scale."""

    width_us = width_seconds * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch.column(ts_col))
        w = (us // width_us) * width_seconds  # window start, epoch seconds
        uniq, inv = np.unique(w, return_inverse=True)
        n = np.bincount(inv)
        cols = {
            "w_start": pa.array(uniq, pa.int64()),
            "n": pa.array(n.astype(np.int64)),
        }
        if sum_col is not None:
            v = batch.column(sum_col)
            v = single_chunk(v)
            vals = v.cast(pa.int64()).to_numpy(zero_copy_only=False)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, vals)
            cols[f"sum_{sum_col}"] = pa.array(sums)
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # final combine: shuffle key is the 8-byte window id over tiny partials
    agg = partials.groupby("w_start").sum(
        ["n"] + ([f"sum_{sum_col}"] if sum_col else [])
    )

    def rename(batch: pa.Table) -> pa.Table:
        cols = {"w_start": batch.column("w_start"), "n": batch.column("sum(n)")}
        if sum_col is not None:
            cols[f"sum_{sum_col}"] = batch.column(f"sum(sum_{sum_col})")
        return pa.table(cols)

    out = agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    if sort:
        out = out.sort("w_start")
    return out


def hopping_window_agg(
    ds,
    *,
    ts_col: str = "ts",
    width_seconds: int = 600,
    slide_seconds: int = 300,
    sum_col: str | None = None,
    sort: bool = True,
):
    """Hopping (sliding) window aggregate: each event lands in
    ``width/slide`` overlapping epoch-aligned windows. Same scale shape
    as the tumbling aggregate — the fan-out happens inside the
    per-batch partial (each batch collapses to one row per touched
    window BEFORE the shuffle), so the groupby still moves only
    (window, partials) rows.

    ``width_seconds`` must be a multiple of ``slide_seconds``."""
    if width_seconds % slide_seconds:
        raise ValueError("width_seconds must be a multiple of slide_seconds")
    m = width_seconds // slide_seconds
    slide_us = slide_seconds * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch.column(ts_col))
        base = us // slide_us  # slide-aligned bucket index
        # windows starting at (base - j) * slide for j in 0..m-1
        w = ((base[None, :] - np.arange(m, dtype=np.int64)[:, None])
             * slide_seconds).reshape(-1)
        uniq, inv = np.unique(w, return_inverse=True)
        n = np.bincount(inv)
        cols = {
            "w_start": pa.array(uniq, pa.int64()),
            "n": pa.array(n.astype(np.int64)),
        }
        if sum_col is not None:
            v = batch.column(sum_col)
            v = single_chunk(v)
            vals = np.tile(v.cast(pa.int64()).to_numpy(zero_copy_only=False), m)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, vals)
            cols[f"sum_{sum_col}"] = pa.array(sums)
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby("w_start").sum(
        ["n"] + ([f"sum_{sum_col}"] if sum_col else [])
    )

    def rename(batch: pa.Table) -> pa.Table:
        cols = {"w_start": batch.column("w_start"), "n": batch.column("sum(n)")}
        if sum_col is not None:
            cols[f"sum_{sum_col}"] = batch.column(f"sum(sum_{sum_col})")
        return pa.table(cols)

    out = agg.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    if sort:
        out = out.sort("w_start")
    return out


def sessionize(
    ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    sort: bool = True,
    num_buckets: int = 256,
):
    """Gap-based sessionization: events of one key belong to the same
    session while consecutive gaps are <= ``gap_seconds``.

    Scale shape: ONE shuffle, grouped on ``hash(key) % num_buckets`` —
    a constant group count (one Python call per bucket, never per key);
    each bucket sessionizes ALL its keys vectorized
    (dictionary-encode the keys, lexsort by (key_code, ts), breaks at
    key change or gap, segment reduces). Keys may be integers, strings
    or binary; the output preserves the key column's type.
    Size ``num_buckets`` so a bucket's events fit one task (~250k rows
    per bucket as a guide).

    Returns (key, session_id:int64 per-key 0-based, n_events,
    s_start:int64 epoch-seconds, s_end:int64)."""
    NB = max(int(num_buckets), 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        col = single_chunk(col)
        t = col.type
        if pa.types.is_integer(t):
            # fill_null before to_numpy: a null would coerce to float64
            # (undefined NaN bucket); null keys land in bucket 0
            k = pa.compute.fill_null(col.cast(pa.int64()), 0).to_numpy(
                zero_copy_only=False)
            b = (k % NB).astype(np.int64)
        elif pa.types.is_string(t) or pa.types.is_binary(t) or \
                pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            from ..core.arrays import byte_array_values
            from ..functions.dedup import _segmented_poly_hash

            lens, data = byte_array_values(col)
            b = (_segmented_poly_hash(lens, data) % np.uint64(NB)).astype(np.int64)
        else:
            raise TypeError(f"sessionize: unsupported key type {t}")
        return batch.append_column("__bucket", pa.array(b))

    def sess_bucket(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            ktype = (
                group.column(key_col).type
                if key_col in group.column_names else pa.int64()
            )
            return pa.table({
                key_col: pa.array([], ktype),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "s_start": pa.array([], pa.int64()),
                "s_end": pa.array([], pa.int64()),
            })
        kcol = group.column(key_col)
        kcol = single_chunk(kcol)
        # collision-free integer key codes of ANY key type, in C;
        # null keys form ONE group via a sentinel code (SQL PARTITION BY)
        denc = pa.compute.dictionary_encode(kcol)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        knulls = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        codes = np.where(knulls, len(denc.dictionary), codes).astype(np.int64)
        us = _ts_us(group.column(ts_col))
        n = len(codes)
        order = np.lexsort((us, codes))
        k_s = codes[order]
        sec_s = us[order] // 1_000_000
        brk = np.ones(n, bool)
        if n > 1:
            same_key = k_s[1:] == k_s[:-1]
            brk[1:] = ~same_key | ((sec_s[1:] - sec_s[:-1]) > gap_seconds)
        seg_start = np.nonzero(brk)[0]
        seg_end = np.append(seg_start[1:], n)
        counts = seg_end - seg_start
        sess_code = k_s[seg_start]
        # per-key 0-based session numbering
        nseg = len(seg_start)
        seg_idx = np.arange(nseg)
        key_first = np.ones(nseg, bool)
        key_first[1:] = sess_code[1:] != sess_code[:-1]
        firsts = seg_idx[key_first]
        base = np.repeat(firsts, np.diff(np.append(firsts, nseg)))
        key_arr = denc.dictionary
        if knulls.any():  # sentinel code -> a null key slot
            key_arr = pa.concat_arrays([key_arr, pa.nulls(1, key_arr.type)])
        return pa.table({
            key_col: key_arr.take(pa.array(sess_code)),
            "session_id": pa.array(seg_idx - base),
            "n_events": pa.array(counts.astype(np.int64)),
            "s_start": pa.array(sec_s[seg_start].astype(np.int64)),
            "s_end": pa.array(sec_s[seg_end - 1].astype(np.int64)),
        })

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    out = bucketed.groupby("__bucket").map_groups(sess_bucket, batch_format="pyarrow")
    if sort:
        out = out.sort([key_col, "session_id"])
    return out
