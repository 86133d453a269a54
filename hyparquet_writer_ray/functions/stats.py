"""Distribution statistics and table profiling.

``exact_quantiles`` computes EXACT discrete quantiles (DuckDB
``quantile_disc`` semantics: the sorted element at rank
``ceil(q*n) - 1``) with one value-histogram shuffle: each batch
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


def exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99)) -> pa.Table:
    """(q:double, value) table of exact discrete quantiles of
    ``ds[col]`` (nulls ignored), matching SQL ``quantile_disc``.
    Integer columns return int64 values; floating columns float64
    (NaNs ignored like nulls). The per-batch partial collapses to
    distinct (value, count) pairs, so the exchange is bounded by the
    column's distinct-value count — exact float quantiles on a
    continuous column degrade to value-sized movement by nature; use a
    histogram/sketch when that is too much."""
    base = ds.schema()
    base = getattr(base, "base_schema", base)
    is_float = pa.types.is_floating(base.field(col).type)
    vt = pa.float64() if is_float else pa.int64()

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"v": pa.array([], vt),
                             "n": pa.array([], pa.int64())})
        arr = single_chunk(batch.column(col))
        if arr.null_count:
            arr = arr.drop_null()
        vals = arr.cast(vt).to_numpy(zero_copy_only=False)
        if is_float:
            vals = vals[~np.isnan(vals)]
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table({"v": pa.array(uniq, vt),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = hist.groupby("v").sum("n")
    parts = [
        b for b in merged.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], vt)})
    t = pa.concat_tables(parts)
    v = t.column("v").to_numpy(zero_copy_only=False)
    n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        # quantile_disc rule pinned against DuckDB: the element at rank
        # ceil(q*n)-1 (floor((n-1)*q) coincides only when q*n is
        # integral — it is one off at e.g. n=4, q=0.9)
        idx = max(int(np.ceil(float(q) * total)) - 1, 0)
        k = int(np.searchsorted(cum, idx + 1))
        out_q.append(float(q))
        out_v.append(float(v[k]) if is_float else int(v[k]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, vt)})


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


def grouped_quantiles(ds, *, key_col: str, col: str, qs=(0.5, 0.9, 0.99),
                      num_buckets: int = 64):
    """EXACT per-key discrete quantiles (``quantile_disc`` semantics,
    nulls ignored): (key, q, value) for every distinct key.

    Scale shape: each batch collapses to (key, value, count) partials
    via one lexsort/run-length pass (the keyed twin of
    ``exact_quantiles``), then ONE shuffle on ``hash(key) % NB`` — a
    constant group count — and each bucket finishes ALL its keys
    vectorized (one cumsum + searchsorted per quantile over the
    bucket's sorted histogram). Bytes shuffled are O(distinct
    (key, value) pairs), never O(rows); no per-key Python anywhere.

    The key keeps its ORIGINAL Arrow type in the output; it is never
    stringified (ADVICE r3: the old large_string cast turned integer
    keys into digit strings). Int / string / binary keys hash natively;
    any other type (dates, timestamps, floats, bools) is cast to string
    for BUCKETING ONLY — the emitted key column is untouched."""
    import pyarrow.compute as pc

    from .joins import _bucket_of

    NB = max(int(num_buckets), 1)
    qs = [float(q) for q in qs]
    sch = ds.schema()
    ktype = dict(zip(sch.names, sch.types))[key_col]
    if not isinstance(ktype, pa.DataType):  # ray Schema may wrap numpy
        ktype = pa.large_string()

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"__k": pa.array([], ktype),
                          "v": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if batch.num_columns == 0 or batch.num_rows == 0:
            return empty
        # null VALUES are excluded; null KEYS form one group (SQL
        # GROUP BY semantics, matching the grouped_dd_quantiles twin)
        valid = pc.is_valid(batch.column(col))
        t = batch.filter(pc.fill_null(valid, False))
        if t.num_rows == 0:
            return empty
        keys = single_chunk(t.column(key_col))
        denc = pc.dictionary_encode(keys)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        nulls = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        codes = np.where(nulls, len(denc.dictionary), codes).astype(np.int64)
        vals = single_chunk(t.column(col)).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((vals, codes))
        c_s, v_s = codes[order], vals[order]
        new = np.ones(len(order), bool)
        new[1:] = (c_s[1:] != c_s[:-1]) | (v_s[1:] != v_s[:-1])
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.append(starts, len(order)))
        key_arr = denc.dictionary.cast(ktype)
        if nulls.any():  # sentinel code len(dict) -> a null key slot
            key_arr = pa.concat_arrays([key_arr, pa.nulls(1, ktype)])
        return pa.table({
            "__k": key_arr.take(pa.array(c_s[starts])),
            "v": pa.array(v_s[starts], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch
        keys = single_chunk(batch.column("__k"))
        t = keys.type
        if not (pa.types.is_integer(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t) or pa.types.is_binary(t)
                or pa.types.is_large_binary(t)):
            keys = keys.cast(pa.large_string())  # bucketing only
        return batch.append_column("__bucket",
                                   pa.array(_bucket_of(keys, NB)))

    def finish(group: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], ktype),
                          "q": pa.array([], pa.float64()),
                          "value": pa.array([], pa.int64())})
        if group.num_columns == 0 or group.num_rows == 0:
            return empty
        denc = pc.dictionary_encode(single_chunk(group.column("__k")))
        codes = denc.indices.to_numpy(zero_copy_only=False)
        nulls = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        codes = np.where(nulls, len(denc.dictionary), codes).astype(np.int64)
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, codes))
        c_s, v_s, n_s = codes[order], v[order], n[order]
        # merge duplicate (key, value) partials from different batches
        new = np.ones(len(order), bool)
        new[1:] = (c_s[1:] != c_s[:-1]) | (v_s[1:] != v_s[:-1])
        starts = np.nonzero(new)[0]
        c_u = c_s[starts]
        v_u = v_s[starts]
        n_u = np.add.reduceat(n_s, starts)
        key_new = np.ones(len(starts), bool)
        key_new[1:] = c_u[1:] != c_u[:-1]
        kstarts = np.nonzero(key_new)[0]
        kends = np.append(kstarts[1:], len(starts))
        out_k, out_q, out_v = [], [], []
        # per-key loop runs once per DISTINCT KEY IN THE BUCKET over tiny
        # histogram slices — the O(rows) work happened in the partials
        for s, e in zip(kstarts, kends):
            cum = np.cumsum(n_u[s:e])
            total = int(cum[-1])
            for q in qs:
                idx = max(int(np.ceil(q * total)) - 1, 0)  # quantile_disc
                out_k.append(int(c_u[s]))
                out_q.append(q)
                out_v.append(int(v_u[s:e][np.searchsorted(cum, idx + 1)]))
        key_arr = denc.dictionary.cast(ktype)
        if nulls.any():
            key_arr = pa.concat_arrays([key_arr, pa.nulls(1, ktype)])
        return pa.table({
            key_col: key_arr.take(pa.array(out_k, pa.int64())),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        })

    hist = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return hist.map_batches(add_bucket, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("__bucket").map_groups(finish, batch_format="pyarrow")


# --- table profiling -------------------------------------------------------

_PROFILE_PART = pa.schema([
    ("col", pa.string()), ("h1", pa.int64()), ("h2", pa.int64()),
    ("n", pa.int64()), ("nn", pa.int64()),
])


def _distinct_lanes(arr: pa.Array, hash_backend: str | None):
    """Non-null values of ``arr`` as two int64 identity/hash lanes.

    Integers, booleans, timestamps and dates are EXACT (the value is
    its own lane); floats are exact after -0.0/NaN canonicalization
    (SQL DISTINCT treats -0.0 = 0.0 and NaN = NaN); strings/binary use
    the repo's 128-bit two-lane content hash (collision odds < 1e-14
    at 10^12 values — the same exactness contract as exact_dedup)."""
    from .dedup import _text_hash128_col

    if arr.null_count:
        arr = arr.drop_null()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) \
            or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        h1, h2 = _text_hash128_col(arr, backend=hash_backend)
        return (h1.to_numpy(zero_copy_only=False).astype(np.int64),
                h2.to_numpy(zero_copy_only=False).astype(np.int64))
    if pa.types.is_floating(t):
        v = arr.cast(pa.float64()).to_numpy(zero_copy_only=False).copy()
        v[v == 0.0] = 0.0          # -0.0 -> +0.0
        v[np.isnan(v)] = np.nan    # every NaN bit pattern -> one NaN
        return v.view(np.int64), np.zeros(len(v), np.int64)
    # bool / int / uint / timestamp / date / time -> exact int64 identity
    v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
    return v, np.zeros(len(v), np.int64)


def profile_table(ds, columns, *, num_buckets: int = 64,
                  hash_backend: str | None = None) -> pa.Table:
    """Per-column profile of ``ds``: (col, n_rows, n_nonnull,
    n_distinct) — SQL ``count(*) / count(col) / count(DISTINCT col)``.

    Scale shape: each batch collapses every profiled column to its
    batch-local DISTINCT lane pairs plus one (n, nn) summary row
    before anything moves; ONE constant-bucket shuffle
    (``h1 % num_buckets``, one task per bucket — never one per value)
    finishes the distinct counts; the driver merges only
    O(num_buckets x n_cols) count rows. Raw values never leave the
    cluster and no stage holds more than a batch's distinct set."""
    import pyarrow.compute as pc

    from .dedup import _HASH_BACKEND

    columns = list(columns)
    NB = max(int(num_buckets), 1)
    backend = hash_backend or _HASH_BACKEND  # pin: shuffle crosses workers

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _PROFILE_PART.empty_table()
        cols, h1s, h2s, ns, nns = [], [], [], [], []
        for c in columns:
            arr = single_chunk(batch.column(c))
            l1, l2 = _distinct_lanes(arr, backend)
            order = np.lexsort((l2, l1))
            l1, l2 = l1[order], l2[order]
            keep = np.ones(len(l1), bool)
            keep[1:] = (l1[1:] != l1[:-1]) | (l2[1:] != l2[:-1])
            l1, l2 = l1[keep], l2[keep]
            cols.append(np.full(len(l1) + 1, c, dtype=object))
            h1s.append(np.append(l1, 0))
            h2s.append(np.append(l2, 0))
            valid = np.zeros(len(l1) + 1, np.int64)
            summary = np.zeros(len(l1) + 1, np.int64)
            valid[-1] = len(arr) - arr.null_count
            summary[-1] = len(arr)
            ns.append(summary)
            nns.append(valid)
        mask = np.concatenate(
            [np.append(np.zeros(len(h) - 1, bool), True) for h in h1s])
        return pa.table({
            "col": pa.array(np.concatenate(cols), pa.string()),
            "h1": pa.array(np.concatenate(h1s), pa.int64(), mask=mask),
            "h2": pa.array(np.concatenate(h2s), pa.int64(), mask=mask),
            "n": pa.array(np.concatenate(ns), pa.int64()),
            "nn": pa.array(np.concatenate(nns), pa.int64()),
        })

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch
        h1 = pc.fill_null(batch.column("h1"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array((h1.view(np.uint64) % NB).astype(np.int64)))

    def finish(group: pa.Table) -> pa.Table:
        empty = pa.table({"col": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64()),
                          "n_nonnull": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64())})
        if group.num_columns == 0 or group.num_rows == 0:
            return empty
        denc = pc.dictionary_encode(single_chunk(group.column("col")))
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        is_hash = pc.is_valid(group.column("h1")).to_numpy(
            zero_copy_only=False).astype(bool)
        h1 = pc.fill_null(group.column("h1"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        h2 = pc.fill_null(group.column("h2"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = group.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        nn = group.column("nn").to_numpy(zero_copy_only=False).astype(np.int64)
        out_c, out_n, out_nn, out_d = [], [], [], []
        for code in range(len(denc.dictionary)):
            m = codes == code
            mh = m & is_hash
            l1, l2_ = h1[mh], h2[mh]
            if len(l1):
                order = np.lexsort((l2_, l1))
                l1, l2_ = l1[order], l2_[order]
                uniq = 1 + int(np.count_nonzero(
                    (l1[1:] != l1[:-1]) | (l2_[1:] != l2_[:-1])))
            else:
                uniq = 0
            out_c.append(denc.dictionary[code].as_py())
            out_n.append(int(n[m].sum()))
            out_nn.append(int(nn[m].sum()))
            out_d.append(uniq)
        return pa.table({"col": pa.array(out_c, pa.string()),
                         "n_rows": pa.array(out_n, pa.int64()),
                         "n_nonnull": pa.array(out_nn, pa.int64()),
                         "n_distinct": pa.array(out_d, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = parts.map_batches(add_bucket, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("__bucket").map_groups(finish, batch_format="pyarrow")
    # driver merge: O(num_buckets x n_cols) count rows
    acc: dict[str, list[int]] = {c: [0, 0, 0] for c in columns}
    for b in merged.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c, nr, nnv, nd in zip(b.column("col").to_pylist(),
                                  b.column("n_rows").to_pylist(),
                                  b.column("n_nonnull").to_pylist(),
                                  b.column("n_distinct").to_pylist()):
            acc[c][0] += nr
            acc[c][1] += nnv
            acc[c][2] += nd
    order = sorted(columns)
    return pa.table({
        "col": pa.array(order, pa.string()),
        "n_rows": pa.array([acc[c][0] for c in order], pa.int64()),
        "n_nonnull": pa.array([acc[c][1] for c in order], pa.int64()),
        "n_distinct": pa.array([acc[c][2] for c in order], pa.int64()),
    })


def histogram(ds, col: str, *, lo: float, hi: float, bins: int = 64):
    """Fixed-width histogram of ``col`` over ``[lo, hi]`` —
    ``(bin:int64, lo_edge:double, hi_edge:double, n:int64)``, empty
    bins included.

    Scale shape: each batch collapses to one ``bins``-long bincount
    partial BEFORE the shuffle, so the exchange moves O(bins) rows per
    batch regardless of input size; the final groupby sums at most
    ``bins`` keys. Bin rule (mirrored token-for-token by the SQL
    oracle so edge values land identically in IEEE double):
    ``bin = floor((v - lo) / ((hi - lo) / bins))`` for
    ``lo <= v <= hi``, with the top edge clamped into the last bin;
    values outside [lo, hi] and nulls are excluded.
    """
    import pyarrow.compute as pc

    nb = int(bins)
    if nb < 1:
        raise ValueError(f"histogram: bins must be >= 1, got {bins}")
    if not (float(hi) > float(lo)):
        raise ValueError(
            f"histogram: need hi > lo, got lo={lo!r} hi={hi!r}")
    width = (float(hi) - float(lo)) / nb

    def partial(batch: pa.Table) -> pa.Table:
        v = single_chunk(batch.column(col)).cast(pa.float64())
        x = v.to_numpy(zero_copy_only=False)  # float64; nulls -> NaN
        x = x[(x >= lo) & (x <= hi)]  # NaN compares False: nulls drop
        b = np.minimum(np.floor((x - lo) / width).astype(np.int64), nb - 1)
        counts = np.bincount(b, minlength=nb)
        return pa.table({
            "bin": pa.array(np.arange(nb, dtype=np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partials.groupby("bin").sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": batch.column("bin"),
            "lo_edge": pa.array(lo + b * width, pa.float64()),
            "hi_edge": pa.array(lo + (b + 1) * width, pa.float64()),
            "n": batch.column("sum(n)").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
