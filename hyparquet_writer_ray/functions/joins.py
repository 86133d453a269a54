"""Join operators the Dataset API can't express directly — one per
join shape a 100 TB pipeline needs:

- ``asof_join``: backward temporal join (DuckDB ``ASOF LEFT JOIN``
  semantics — greatest right timestamp <= left timestamp per key,
  equality allowed, LEFT OUTER).
- ``interval_join``: range join against non-overlapping per-key
  intervals (event -> covering session/window).
- ``hash_join``: big-x-big equi-join, both sides shuffled once,
  right unique on key (the cluster-scale dimension join).
- ``broadcast_join``: small-side equi-join, zero shuffles (``ray.put``
  once, fetched once per actor).

Scale shape: ONE shuffle. Both sides are tagged and bucketed on
``hash(key) % num_buckets`` (a CONSTANT group count — never one Python
call per key), null-padded to a shared schema and unioned; each bucket
joins ALL its keys vectorized: dictionary-encode the keys once
(collision-free int codes in C), lexsort by (key_code, ts, side) with
right rows ordered before left rows at equal timestamps, then a single
segment-reset running-maximum pass finds every left row's predecessor
right row — no per-row Python, no per-key Python, O(bucket log bucket).
The right side is NEVER broadcast: at web scale both sides stream
through the same bucketed shuffle.

The reference writer has no join operators (SURVEY.md §2.6); this is
an engine extension for the training-data pipeline tier (e.g. "attach
the latest crawl-snapshot metadata at or before each page's WARC
timestamp").

Determinism: if several right rows share one (key, ts), which one wins
is unspecified — pre-reduce the right side to unique (key, ts) first
(the query-level oracle does ``GROUP BY key, ts``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.arrays import single_chunk


def _bucket_of(col: pa.Array, nb: int) -> np.ndarray:
    """Constant-count shuffle bucket for int / string / binary keys."""
    t = col.type
    if pa.types.is_integer(t):
        # fill_null BEFORE to_numpy: a null coerces the column to
        # float64 (NaN-cast bucket is undefined, and ids > 2^53 would
        # bucket differently in batches containing a null). Null keys
        # deterministically land in bucket 0.
        k = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False)
        return (k % nb).astype(np.int64)
    if (pa.types.is_string(t) or pa.types.is_binary(t)
            or pa.types.is_large_string(t) or pa.types.is_large_binary(t)):
        from ..core.arrays import byte_array_values
        from .dedup import _segmented_poly_hash

        lens, data = byte_array_values(col)
        return (_segmented_poly_hash(lens, data) % np.uint64(nb)).astype(np.int64)
    raise TypeError(f"shuffle bucket: unsupported key type {t} "
                    "(int / string / binary keys only)")



def _tag_union(left, right, *, left_key, right_key, right_cols, nb,
               op_name, left_ts=None, right_ts=None):
    """Shared tag-union scaffolding for the bucketed shuffle joins
    (asof_join / hash_join): schema introspection, payload-collision
    check, null-padded left/right row taggers, union. Returns
    ``(left_pa, rfields, out_schema, tagged)``; the caller supplies the
    per-bucket join kernel."""
    left_schema = left.schema()
    left_pa = getattr(left_schema, "base_schema", left_schema)
    right_schema = right.schema()
    right_pa = getattr(right_schema, "base_schema", right_schema)
    if right_cols is None:
        drop = {right_key, right_ts} if right_ts else {right_key}
        right_cols = [n for n in right_pa.names if n not in drop]
    clash = set(right_cols) & set(left_pa.names)
    if clash:
        raise ValueError(
            f"{op_name}: right_cols collide with left columns: {clash}")
    rfields = [right_pa.field(c) for c in right_cols]
    out_schema = pa.schema(list(left_pa) + rfields)
    key_type = left_pa.field(left_key).type

    def left_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = single_chunk(batch.column(left_key))
        cols: dict = {f.name: batch.column(f.name) for f in left_pa}
        for f in rfields:
            cols[f.name] = pa.nulls(n, f.type)
        cols["__key"] = key
        if left_ts is not None:
            cols["__ts"] = single_chunk(batch.column(left_ts)).cast(pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int64))
        cols["__bucket"] = pa.array(_bucket_of(key, nb))
        return pa.table(cols)

    def right_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = single_chunk(batch.column(right_key)).cast(key_type)
        cols = {f.name: pa.nulls(n, f.type) for f in left_pa}
        for f in rfields:
            cols[f.name] = batch.column(f.name)
        cols["__key"] = key
        if right_ts is not None:
            cols["__ts"] = single_chunk(batch.column(right_ts)).cast(pa.int64())
        cols["__side"] = pa.array(np.zeros(n, np.int64))
        cols["__bucket"] = pa.array(_bucket_of(key, nb))
        return pa.table(cols)

    tagged = left.map_batches(
        left_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(
        right_rows, batch_format="pyarrow", zero_copy_batch=True
    ))
    return left_pa, rfields, out_schema, tagged


def asof_join(
    left,
    right,
    *,
    by: str,
    on: str,
    right_by: str | None = None,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
):
    """Backward as-of LEFT join: every left row + the right row with the
    greatest ``right_on`` <= ``on`` for the same key (nulls if none).

    ``right_cols`` are the right-side payload columns to attach; they
    must not collide with left column names. Left rows with a null key
    or timestamp never match (DuckDB semantics) but are still emitted.
    """
    right_by = right_by or by
    right_on = right_on or on
    NB = max(int(num_buckets), 1)
    left_pa, rfields, out_schema, tagged = _tag_union(
        left, right, left_key=by, right_key=right_by,
        right_cols=right_cols, nb=NB, op_name="asof_join",
        left_ts=on, right_ts=right_on)

    def join_bucket(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return out_schema.empty_table()
        side = group.column("__side").to_numpy(zero_copy_only=False)
        # collision-free int codes for ANY key type; null keys -> code -1
        denc = pc.dictionary_encode(single_chunk(group.column("__key")))
        codes = pc.fill_null(denc.indices.cast(pa.int64()), -1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ts = pc.fill_null(group.column("__ts"), np.iinfo(np.int64).min)
        ts = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        null_row = (codes < 0) | (
            pc.is_null(group.column("__ts")).to_numpy(zero_copy_only=False)
        )
        n = len(codes)
        # right rows (side 0) before left rows at equal (key, ts): ">="
        order = np.lexsort((side, ts, codes))
        side_s = side[order]
        code_s = codes[order]
        null_s = null_row[order]
        # last-right-row-so-far per key segment: segment-reset running max
        # via the monotone-offset trick (code_s is sorted ascending, so
        # each segment's shifted range sits strictly above the previous
        # segment's — np.maximum.accumulate can never leak backwards)
        rpos = np.where((side_s == 0) & ~null_s, np.arange(n), -1)
        base = (code_s - code_s.min()).astype(np.int64) * np.int64(n + 2)
        run = np.maximum.accumulate(rpos + 1 + base)
        rec = run - base - 1
        lmask = side_s == 1
        lidx = np.nonzero(lmask)[0]
        m = rec[lidx]
        m[null_s[lidx]] = -1  # null key/ts on the left: no match
        left_take = pa.array(order[lidx], pa.int64())
        matched = np.where(m >= 0, order[m], 0)
        right_take = pa.array(matched, pa.int64(), mask=(m < 0))
        cols = {}
        for f in left_pa:
            cols[f.name] = group.column(f.name).take(left_take)
        for f in rfields:
            cols[f.name] = group.column(f.name).take(right_take)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


class _BroadcastJoiner:
    """Stateful stage: fetch the broadcast right side ONCE per actor
    (``ray.get`` of a ``ray.put`` ref — never re-shipped per batch) and
    pre-combine its chunks; every batch joins via one vectorized
    ``index_in`` lookup + ``take``."""

    def __init__(self, right_ref, on: str, right_on: str,
                 right_cols: list[str], how: str) -> None:
        import ray

        right: pa.Table = ray.get(right_ref).combine_chunks()
        self.keys = single_chunk(right.column(right_on))
        n_uniq = len(pc.unique(self.keys))
        if n_uniq != len(self.keys):
            raise ValueError(
                f"broadcast_join: right side has duplicate keys on "
                f"{right_on!r} ({len(self.keys) - n_uniq} dupes) — the "
                f"match would be ambiguous; pre-reduce the right side")
        self.right = right
        self.on = on
        self.right_cols = right_cols
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        left_keys = batch.column(self.on)
        idx = pc.index_in(left_keys, value_set=self.keys)
        if left_keys.null_count:
            # SQL equi-join semantics (and asof_join/hash_join parity):
            # a null key never matches, even if the right side carries
            # a null-keyed row (index_in would match null to null)
            idx = pc.if_else(pc.is_valid(left_keys), idx,
                             pa.scalar(None, idx.type))
        out = batch
        for c in self.right_cols:
            col = self.right.column(c).take(idx)  # null idx -> null value
            out = out.append_column(c, col)
        if self.how == "inner":
            out = out.filter(pc.is_valid(idx))
        return out


def broadcast_join(ds, right: pa.Table, *, on: str, right_on: str | None = None,
                   right_cols: list[str] | None = None, how: str = "left",
                   concurrency=(1, 4)):
    """Equi-join a Dataset against a SMALL driver-side table without a
    shuffle: the right side is ``ray.put`` once and each actor fetches
    it once in ``__init__`` — the canonical broadcast-hash-join shape
    for dimension tables (at 100 TB, the alternative is an all-to-all
    exchange of the big side). ``how`` is ``"left"`` (unmatched rows
    keep nulls) or ``"inner"`` (unmatched rows dropped). The right side
    must be unique on ``right_on``; duplicates raise.

    For big-x-big joins use the bucketed tag-union shuffle joins
    (``asof_join`` here, ``_bucketed_pair_attach`` in dedup).

    ``concurrency`` defaults to an AUTOSCALING ``(min, max)`` pool:
    a fixed actor count pre-reserves CPUs even when idle, and two
    chained broadcast_join stages with fixed pools can reserve every
    CPU of a small cluster and starve the upstream read into a
    permanent backpressure stall (observed at num_cpus=4)."""
    import ray

    if how not in ("left", "inner"):
        raise ValueError(f"broadcast_join: how={how!r}")
    right_on = right_on or on
    if right_cols is None:
        right_cols = [n for n in right.column_names if n != right_on]
    left_names = set(ds.schema().names)
    clash = [c for c in right_cols if c in left_names]
    if clash:
        # same contract as asof_join/hash_join: never silently
        # overwrite a left column with right-side payload
        raise ValueError(
            f"broadcast_join: right columns {clash} already exist on the "
            f"left side; rename or drop them before joining")
    right_ref = ray.put(right.select([right_on, *right_cols]))
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs=dict(right_ref=right_ref, on=on,
                                   right_on=right_on,
                                   right_cols=right_cols, how=how),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )


def interval_join(left, right, *, by: str, on: str,
                  right_by: str | None = None,
                  start_col: str = "s_start", end_col: str = "s_end",
                  right_cols: list[str] | None = None,
                  num_buckets: int = 64):
    """Range join against NON-OVERLAPPING per-key intervals: every left
    row + the right interval with ``start <= on <= end`` for the same
    key (LEFT OUTER — uncovered rows keep nulls). The classic
    event->session / row->snapshot-window attachment.

    Scale shape: one backward ``asof_join`` on the interval START (the
    single bucketed shuffle) followed by a streaming map that nulls the
    payload where ``on > end`` — for non-overlapping intervals the
    latest-started interval at or before ``on`` is the ONLY candidate,
    so this is exact. Overlapping intervals are out of contract (the
    match would be ambiguous anyway); sessionize output satisfies it
    by construction."""
    right_by = right_by or by
    if right_cols is None:
        right_schema = right.schema()
        right_pa = getattr(right_schema, "base_schema", right_schema)
        right_cols = [n for n in right_pa.names
                      if n not in (right_by, start_col, end_col)]
    attach = list(dict.fromkeys([*right_cols, end_col]))
    joined = asof_join(left, right, by=by, on=on, right_by=right_by,
                       right_on=start_col, right_cols=attach,
                       num_buckets=num_buckets)

    def cover(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch.drop_columns([end_col]) if end_col in batch.column_names else batch
        ok = pc.and_kleene(
            pc.is_valid(batch.column(end_col)),
            pc.less_equal(single_chunk(batch.column(on)).cast(pa.int64()),
                          single_chunk(batch.column(end_col)).cast(pa.int64())),
        )
        ok = pc.fill_null(ok, False)
        out = batch
        for c in right_cols:
            out = out.set_column(out.column_names.index(c), c,
                                 pc.if_else(ok, out.column(c),
                                            pa.nulls(out.num_rows,
                                                     out.column(c).type)))
        if end_col not in right_cols:
            out = out.drop_columns([end_col])
        return out

    return joined.map_batches(cover, batch_format="pyarrow",
                              zero_copy_batch=True)


def hash_join(left, right, *, on: str, right_on: str | None = None,
              right_cols: list[str] | None = None, how: str = "left",
              num_buckets: int = 64):
    """Big-x-big equi-join without broadcasting either side: both sides
    shuffle ONCE on ``hash(key) % num_buckets`` (constant group count)
    and each bucket joins vectorized (dictionary-encode + sort +
    searchsorted — no per-key Python). The right side must be unique on
    ``right_on`` (one-to-many join, the dimension/lookup shape);
    duplicate right keys in a bucket raise rather than silently pick.

    ``how``: ``"left"`` keeps unmatched left rows (null payload),
    ``"inner"`` drops them. For a right side small enough to ship to
    every actor, prefer ``broadcast_join`` (zero shuffles); this
    operator is for right sides that are themselves cluster-scale
    (e.g. a document-frequency table over a web corpus vocabulary).

    Unlike Ray's experimental ``Dataset.join``, empty partitions and
    heterogeneous block schemas are handled (null-padded tag-union,
    the same machinery as asof_join)."""
    import numpy as np

    right_on = right_on or on
    if how not in ("left", "inner"):
        raise ValueError(f"hash_join: how={how!r}")
    NB = max(int(num_buckets), 1)
    left_pa, rfields, out_schema, tagged = _tag_union(
        left, right, left_key=on, right_key=right_on,
        right_cols=right_cols, nb=NB, op_name="hash_join")

    def join_bucket(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return out_schema.empty_table()
        side = group.column("__side").to_numpy(zero_copy_only=False)
        denc = pc.dictionary_encode(single_chunk(group.column("__key")))
        codes = pc.fill_null(denc.indices.cast(pa.int64()), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lidx = np.nonzero(side == 1)[0]
        ridx = np.nonzero((side == 0) & (codes >= 0))[0]
        rcodes = codes[ridx]
        order = np.argsort(rcodes, kind="stable")
        rcodes_s = rcodes[order]
        if len(rcodes_s) > 1 and (rcodes_s[1:] == rcodes_s[:-1]).any():
            raise ValueError(
                "hash_join: right side has duplicate keys — the match "
                "would be ambiguous; pre-reduce the right side")
        lcodes = codes[lidx]
        if len(rcodes_s):
            pos = np.searchsorted(rcodes_s, lcodes)
            pos = np.minimum(pos, len(rcodes_s) - 1)
            ok = (rcodes_s[pos] == lcodes) & (lcodes >= 0)
        else:
            pos = np.zeros(len(lcodes), np.int64)
            ok = np.zeros(len(lcodes), bool)
        if how == "inner":
            lidx = lidx[ok]
            pos = pos[ok]
            ok = np.ones(len(lidx), bool)
        if len(order):
            matched = np.where(ok, ridx[order][pos], 0)
        else:
            matched = np.zeros(len(lidx), np.int64)
        left_take = pa.array(lidx, pa.int64())
        right_take = pa.array(matched, pa.int64(), mask=~ok)
        cols = {}
        for f in left_pa:
            cols[f.name] = group.column(f.name).take(left_take)
        for f in rfields:
            cols[f.name] = group.column(f.name).take(right_take)
        return pa.table(cols, schema=out_schema)

    return tagged.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )
