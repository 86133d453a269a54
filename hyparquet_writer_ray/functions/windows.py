"""Windowed aggregates over event streams.

Scale shape: a vectorized per-batch *partial* aggregate (combiner)
collapses each batch to one row per window BEFORE the shuffle, so the
groupby moves only (window, partials) rows — not events
(SURVEY.md §7.3 / 'push aggregation partial').
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


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
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (us // width_us) * width_seconds  # window start, epoch seconds
        uniq, inv = np.unique(w, return_inverse=True)
        n = np.bincount(inv)
        cols = {
            "w_start": pa.array(uniq, pa.int64()),
            "n": pa.array(n.astype(np.int64)),
        }
        if sum_col is not None:
            v = batch.column(sum_col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
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
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
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
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
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
):
    """Gap-based sessionization: events of one key belong to the same
    session while consecutive gaps are <= ``gap_seconds``.

    Scale shape: ONE shuffle (groupby on the key); each group is
    sessionized vectorized (sort by ts, diff > gap -> session breaks,
    cumsum -> session ids, reduceat -> per-session aggregates). Skewed
    keys are bounded: a key's group holds only its own events.

    Returns (key, session_id:int64 per-key 0-based, n_events,
    s_start:int64 epoch-seconds, s_end:int64)."""

    def per_key(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = np.sort(ts.cast(pa.int64()).to_numpy(zero_copy_only=False))
        sec = us // 1_000_000
        breaks = np.zeros(len(sec), bool)
        if len(sec) > 1:
            breaks[1:] = np.diff(sec) > gap_seconds
        sid = np.cumsum(breaks)
        n_sessions = int(sid[-1]) + 1 if len(sid) else 0
        counts = np.bincount(sid, minlength=n_sessions)
        seg_starts = np.cumsum(counts) - counts
        s_start = sec[seg_starts]
        s_end = sec[np.cumsum(counts) - 1]
        key_val = group.column(key_col)[0].as_py()
        return pa.table({
            key_col: pa.array([key_val] * n_sessions,
                              type=group.column(key_col).type),
            "session_id": pa.array(np.arange(n_sessions, dtype=np.int64)),
            "n_events": pa.array(counts.astype(np.int64)),
            "s_start": pa.array(s_start.astype(np.int64)),
            "s_end": pa.array(s_end.astype(np.int64)),
        })

    out = ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
    if sort:
        out = out.sort([key_col, "session_id"])
    return out
