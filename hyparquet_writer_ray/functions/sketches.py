"""Distributed sketches for large-scale profiling.

HyperLogLog distinct counting (Flajolet et al. 2007, the standard
bias-corrected variant): each batch collapses to one 2^p-byte register
row (a *partial*), the tiny partials merge by elementwise max — the
only data movement is n_batches x 2^p bytes, never the values. The
estimate is fully deterministic for a given input set (hash is a fixed
splitmix64), so tests can pin exact outputs.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.arrays import single_chunk


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_column(col: pa.Array, *, aligned: bool = False) -> np.ndarray:
    """64-bit hashes of a column (ints hashed by value; strings/binary
    by their segmented polynomial hash). Default drops nulls; with
    ``aligned=True`` the output is row-aligned (nulls hashed as the
    zero value — callers mask them out)."""
    col = single_chunk(col)
    if aligned:
        import pyarrow.compute as pc
    else:
        col = col.drop_null()
    t = col.type
    if pa.types.is_integer(t):
        if aligned:
            col = pc.fill_null(col, 0)
        vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        return _splitmix64(vals)
    if (pa.types.is_string(t) or pa.types.is_binary(t)
            or pa.types.is_large_string(t) or pa.types.is_large_binary(t)):
        from ..core.arrays import byte_array_values
        from .dedup import _segmented_poly_hash

        if aligned:
            col = pc.fill_null(col, "")
        # byte_array_values handles 32- and 64-bit offsets natively —
        # no cast (a cast to pa.binary() would overflow on >2GB chunks)
        lens, data = byte_array_values(col)
        return _splitmix64(_segmented_poly_hash(lens, data))
    raise TypeError(f"sketch hash: unsupported column type {t}")


def _idx_rho(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-hash (register index, rho) pairs — rho = leading-zero count
    of the remaining 64-p bits + 1, exact vectorized clz by binary
    search (6 masked shifts)."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    lz = np.full(len(rest), 64 - p, np.uint8)
    nz = rest != 0
    cur = rest[nz].copy()
    shift_total = np.zeros(cur.shape, np.uint8)
    for w in (32, 16, 8, 4, 2, 1):
        zero_high = (cur >> np.uint64(64 - w)) == 0
        shift_total += np.where(zero_high, w, 0).astype(np.uint8)
        cur = np.where(zero_high, cur << np.uint64(w), cur)
    lz[nz] = np.minimum(shift_total, 64 - p)
    rho = (lz + 1).astype(np.uint8)
    return idx, rho


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    reg = np.zeros(m, np.uint8)
    if not len(hashes):
        return reg
    idx, rho = _idx_rho(hashes, p)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate with the standard
    small/large-range corrections."""
    m = len(reg)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((reg == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    elif est > (1 << 64) / 30.0:
        est = -(1 << 64) * np.log1p(-est / (1 << 64))
    return float(est)


def _hash_column_aligned(col: pa.Array) -> np.ndarray:
    """Row-aligned 64-bit hashes (no null drop — callers mask)."""
    return _hash_column(col, aligned=True)


def grouped_hll_distinct(ds, *, key_col: str, value_col: str,
                         p: int = 12, num_buckets: int = 64):
    """Approximate distinct ``value_col`` per ``key_col`` (the
    per-domain / per-language cardinality profile). Returns one row
    per key: (key, n_distinct_approx:int64).

    Scale shape: each batch collapses to ONE 2^p-byte register row per
    key present in the batch (np.maximum.at into a (keys x m) matrix —
    no Python per row), so the shuffle moves O(keys-per-batch) x 4 KiB
    partials, never the values; one constant-bucket groupby merges
    registers per key by np.maximum.reduceat and estimates. Standard
    error ~1.04/sqrt(2^p) (~1.6% at p=12), deterministic for a given
    input set. Null keys form one group (SQL GROUP BY); null values
    are not counted (SQL count(DISTINCT) semantics)."""
    import pyarrow.compute as pc

    m = 1 << p
    NB = max(int(num_buckets), 1)

    def partial(batch: pa.Table) -> pa.Table:
        keys = single_chunk(batch.column(key_col))
        vals = single_chunk(batch.column(value_col))
        keep = pc.is_valid(vals)
        keys, vals = keys.filter(keep), vals.filter(keep)
        denc = pc.dictionary_encode(keys)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        null_keys = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        nk = len(denc.dictionary)
        codes = np.where(null_keys, nk, codes).astype(np.int64)
        n_rows = nk + int(null_keys.any())
        mat = np.zeros((n_rows, m), np.uint8)
        if len(vals):
            idx, rho = _idx_rho(_hash_column_aligned(vals), p)
            np.maximum.at(mat, (codes, idx), rho)
        key_out = denc.dictionary
        if n_rows > nk:
            key_out = pa.concat_arrays(
                [key_out, pa.nulls(1, key_out.type)])
        kb = _splitmix64(_hash_column_aligned(key_out)).astype(
            np.int64) % NB
        kb[pc.is_null(key_out).to_numpy(zero_copy_only=False)
           .astype(bool)] = 0  # null key deterministically in bucket 0
        return pa.table({
            key_col: key_out,
            "__reg": pa.array([r.tobytes() for r in mat], pa.binary()),
            "__bucket": pa.array(kb),
        })

    def resolve(group: pa.Table) -> pa.Table:
        if "__reg" not in group.column_names or group.num_rows == 0:
            # defensive: preserve the real key type so an empty block
            # can never conflict with other groups' schema
            kt = (group.schema.field(key_col).type
                  if key_col in group.column_names else pa.string())
            return pa.table({key_col: pa.array([], kt),
                             "n_distinct_approx": pa.array([], pa.int64())})
        keys = single_chunk(group.column(key_col))
        denc = pc.dictionary_encode(keys)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        null_keys = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        nk = len(denc.dictionary)
        codes = np.where(null_keys, nk, codes).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        mat = np.stack([
            np.frombuffer(v, np.uint8)
            for v in group.column("__reg").to_pylist()
        ])[order]
        sorted_codes = codes[order]
        starts = np.nonzero(np.r_[True,
                                  sorted_codes[1:] != sorted_codes[:-1]])[0]
        merged = np.maximum.reduceat(mat, starts, axis=0)
        uniq_codes = sorted_codes[starts]
        key_out_parts = []
        for c in uniq_codes:
            key_out_parts.append(None if c == nk
                                 else denc.dictionary[c].as_py())
        est = [int(round(hll_estimate(merged[i])))
               for i in range(len(starts))]
        return pa.table({
            key_col: pa.array(key_out_parts, denc.dictionary.type),
            "n_distinct_approx": pa.array(est, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow")


def hll_distinct(ds, col: str, *, p: int = 12) -> dict:
    """Approximate distinct count of ``ds[col]``.

    Returns {"estimate": float, "registers": np.ndarray}. Standard
    error ~1.04/sqrt(2^p) (~1.6% at p=12). The per-batch partial is the
    ONLY map over the data; the driver folds n_batches tiny register
    rows."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        reg = _registers(_hash_column(batch.column(col)), p)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    reg = np.zeros(m, np.uint8)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for v in b.column("reg"):
            reg = np.maximum(reg, np.frombuffer(v.as_py(), np.uint8))
    return {"estimate": hll_estimate(reg), "registers": reg}


def _cms_rows(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices: row d uses an independent splitmix
    lane (seeded re-mix) of the value hash."""
    idx = np.empty((depth, len(hashes)), np.int64)
    for d in range(depth):
        seed = (0xA076_1D64_78BD_642F * (d + 1)) & 0xFFFF_FFFF_FFFF_FFFF
        lane = _splitmix64(hashes ^ np.uint64(seed))
        idx[d] = (lane % np.uint64(width)).astype(np.int64)
    return idx


def count_min_sketch(ds, col: str, *, depth: int = 4, width: int = 8192):
    """Count-min sketch of value frequencies in ``ds[col]``: a
    (depth x width) uint64 count matrix. Point query
    ``cms_estimate(sketch, value)`` never underestimates and
    overestimates by at most ``2 * n / width`` with probability
    ``1 - 2^-depth`` (Cormode & Muthukrishnan 2005).

    Scale shape: each batch collapses to one depth x width partial
    (np.add.at over dictionary-pre-counted values), partials merge by
    elementwise SUM on the driver — depth*width*8 bytes per batch is
    the only movement, never the values. Deterministic (fixed
    splitmix64 lanes), so the same input always yields the same
    sketch. Returns ``{"sketch": np.ndarray, "n": int, "depth": ...,
    "width": ...}``."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = single_chunk(batch.column(col))
        v = v.filter(pc.is_valid(v))
        mat = np.zeros((depth, width), np.uint64)
        n = len(v)
        if n:
            # pre-count duplicates so add.at touches distinct values only
            denc = pc.dictionary_encode(v)
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            counts = np.bincount(codes, minlength=len(denc.dictionary)) \
                .astype(np.uint64)
            idx = _cms_rows(_hash_column(denc.dictionary), depth, width)
            for d in range(depth):
                np.add.at(mat[d], idx[d], counts)
        return pa.table({
            "part": pa.array([mat.tobytes()], pa.large_binary()),
            "n": pa.array([n], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    sketch = np.zeros((depth, width), np.uint64)
    total = 0
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob, n in zip(b.column("part").to_pylist(),
                           b.column("n").to_pylist()):
            sketch += np.frombuffer(blob, np.uint64).reshape(depth, width)
            total += n
    return {"sketch": sketch, "n": total, "depth": depth, "width": width}


def cms_estimate(cms: dict, values: pa.Array) -> np.ndarray:
    """Estimated frequency of each value (vectorized min over rows).
    Nulls are rejected: the sketch never counts them, and silently
    dropping them here would misalign the result with ``values``."""
    values = single_chunk(values)
    if values.null_count:
        raise ValueError("cms_estimate: values must not contain nulls")
    idx = _cms_rows(_hash_column(values), cms["depth"], cms["width"])
    ests = np.stack([cms["sketch"][d][idx[d]]
                     for d in range(cms["depth"])])
    return ests.min(axis=0).astype(np.int64)


def _dd_buckets(x: np.ndarray, gamma_ln: float) -> np.ndarray:
    """DDSketch bucket index ceil(ln(x)/ln(gamma)) for positive x."""
    return np.ceil(np.log(x) / gamma_ln).astype(np.int64)


def dd_quantile_sketch(ds, col: str, *, alpha: float = 0.01):
    """Mergeable relative-error quantile sketch (DDSketch, Masson et
    al. VLDB 2019): any quantile of the sketched column is answered
    within relative error ``alpha``, with memory O(log(range)/alpha)
    REGARDLESS of the distinct-value count — the scale path where
    ``exact_quantiles`` on a continuous column would move every
    distinct value. Negative values use a mirrored store, zeros an
    exact counter; nulls, NaN and +/-inf are excluded; counts (and
    therefore ranks) are exact, only the within-bucket value is
    approximated.

    Scale shape: each batch collapses to its (bucket, count) pairs via
    one log + bincount-over-unique pass; the driver merges bounded
    histograms (a few thousand buckets at alpha=0.01). Deterministic.
    Returns ``{"alpha", "gamma", "neg", "zero", "pos", "n"}`` with
    neg/pos as {bucket: count} dicts."""
    import pyarrow.compute as pc

    gamma = (1.0 + alpha) / (1.0 - alpha)
    gamma_ln = float(np.log(gamma))

    def partial(batch: pa.Table) -> pa.Table:
        v = single_chunk(batch.column(col)).cast(pa.float64())
        x = v.to_numpy(zero_copy_only=False)
        # nulls, NaN AND +/-inf are excluded: log(inf) would cast to
        # INT64_MIN and silently rank inf as the smallest positive
        x = x[np.isfinite(x)]
        n_zero = int((x == 0).sum())
        out_b, out_c, out_s = [], [], []
        for sign, vals in ((1, x[x > 0]), (-1, -x[x < 0])):
            if len(vals):
                b = _dd_buckets(vals, gamma_ln)
                uniq, cnt = np.unique(b, return_counts=True)
                out_b.append(uniq)
                out_c.append(cnt.astype(np.int64))
                out_s.append(np.full(len(uniq), sign, np.int64))
        if n_zero:
            out_b.append(np.zeros(1, np.int64))
            out_c.append(np.array([n_zero], np.int64))
            out_s.append(np.zeros(1, np.int64))
        if not out_b:
            return pa.table({"b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({"b": pa.array(np.concatenate(out_b)),
                         "c": pa.array(np.concatenate(out_c)),
                         "s": pa.array(np.concatenate(out_s))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    neg: dict = {}
    pos: dict = {}
    zero = 0
    for t in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for b, c, s in zip(t.column("b").to_pylist(),
                           t.column("c").to_pylist(),
                           t.column("s").to_pylist()):
            if s == 0:
                zero += c
            elif s > 0:
                pos[b] = pos.get(b, 0) + c
            else:
                neg[b] = neg.get(b, 0) + c
    n = zero + sum(pos.values()) + sum(neg.values())
    return {"alpha": alpha, "gamma": gamma, "neg": neg, "zero": zero,
            "pos": pos, "n": n}


def dd_quantile_estimate(sk: dict, qs) -> list[float]:
    """Quantile estimates from a DDSketch (rank rule ceil(q*n)-1,
    matching ``exact_quantiles``/``quantile_disc``; rank walk is over
    exact counts, so only the within-bucket midpoint approximates).
    Raises on an empty sketch (no finite values — SQL would say
    NULL)."""
    if sk["n"] == 0:
        raise ValueError("dd_quantile_estimate: empty sketch")
    gamma = sk["gamma"]
    # global ascending order: negatives by descending bucket (most
    # negative first), then zeros, then positives by ascending bucket
    entries = []
    for b in sorted(sk["neg"], reverse=True):
        entries.append((-2.0 * gamma ** b / (gamma + 1.0), sk["neg"][b]))
    if sk["zero"]:
        entries.append((0.0, sk["zero"]))
    for b in sorted(sk["pos"]):
        entries.append((2.0 * gamma ** b / (gamma + 1.0), sk["pos"][b]))
    cum = np.cumsum([c for _, c in entries])
    out = []
    for q in qs:
        idx = max(int(np.ceil(float(q) * sk["n"])) - 1, 0)
        k = int(np.searchsorted(cum, idx + 1))
        out.append(float(entries[k][0]))
    return out


def grouped_dd_quantiles(ds, *, key_col: str, col: str, qs=(0.5, 0.9),
                         alpha: float = 0.01, num_buckets: int = 64):
    """Per-key relative-error quantiles (grouped DDSketch) — the scale
    complement to ``grouped_quantiles`` exactly as ``dd_quantile_sketch``
    is to ``exact_quantiles``: every key's quantiles within relative
    error ``alpha`` while each key's state is O(log(range)/alpha)
    buckets, never its distinct values. Returns one row per (key, q):
    ``(key, q:double, value_est:double)``.

    Scale shape: each batch collapses to (key, sign, bucket, count)
    partials via one lexsort/run-length pass over ALL keys at once
    (no Python per key); one constant-bucket shuffle on hash(key)
    co-locates each key's whole histogram and the bucket task
    estimates all its keys vectorized per key group. Nulls/NaN/inf
    values excluded; null keys form one group."""
    import pyarrow.compute as pc

    gamma = (1.0 + alpha) / (1.0 - alpha)
    gamma_ln = float(np.log(gamma))
    NB = max(int(num_buckets), 1)
    qs = [float(q) for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        keys = single_chunk(batch.column(key_col))
        vals = single_chunk(batch.column(col)).cast(pa.float64())
        x = vals.to_numpy(zero_copy_only=False)
        ok = np.isfinite(x)
        keys = keys.filter(pa.array(ok))
        x = x[ok]
        if len(x) == 0:  # all null/NaN/inf (or a 0-row block)
            return pa.table({
                key_col: keys.slice(0, 0),
                "__s": pa.array([], pa.int64()),
                "__b": pa.array([], pa.int64()),
                "__n": pa.array([], pa.int64()),
                "__bucket": pa.array([], pa.int64()),
            })
        denc = pc.dictionary_encode(keys)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        nulls = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        nk = len(denc.dictionary)
        codes = np.where(nulls, nk, codes).astype(np.int64)
        sign = np.sign(x).astype(np.int64)
        b = np.zeros(len(x), np.int64)
        nz = sign != 0
        b[nz] = np.ceil(np.log(np.abs(x[nz])) / gamma_ln).astype(np.int64)
        order = np.lexsort((b, sign, codes))
        ck, cs, cb = codes[order], sign[order], b[order]
        starts = np.nonzero(np.r_[True, (ck[1:] != ck[:-1]) |
                                  (cs[1:] != cs[:-1]) |
                                  (cb[1:] != cb[:-1])])[0]
        cnt = np.diff(np.r_[starts, len(ck)])
        u_codes = ck[starts]
        key_arr = denc.dictionary
        if nulls.any():
            key_arr = pa.concat_arrays(
                [key_arr, pa.nulls(1, key_arr.type)])
        out_keys = key_arr.take(pa.array(u_codes))
        kb = _splitmix64(_hash_column_aligned(out_keys)).astype(
            np.int64) % NB
        kb[pc.is_null(out_keys).to_numpy(zero_copy_only=False)
           .astype(bool)] = 0
        return pa.table({
            key_col: out_keys,
            "__s": pa.array(cs[starts]),
            "__b": pa.array(cb[starts]),
            "__n": pa.array(cnt.astype(np.int64)),
            "__bucket": pa.array(kb),
        })

    def resolve(group: pa.Table) -> pa.Table:
        keys = single_chunk(group.column(key_col))
        denc = pc.dictionary_encode(keys)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        nulls = np.isnan(codes) if codes.dtype.kind == "f" else \
            np.zeros(len(codes), bool)
        nk = len(denc.dictionary)
        codes = np.where(nulls, nk, codes).astype(np.int64)
        s = group.column("__s").to_numpy(zero_copy_only=False)
        b = group.column("__b").to_numpy(zero_copy_only=False)
        n = group.column("__n").to_numpy(zero_copy_only=False)
        # global ascending value order WITHIN each key: sign asc, then
        # bucket asc for positives but DESC for negatives -> order by
        # (sign, sign*bucket)
        order = np.lexsort((s * b, s, codes))
        ck, cs, cb, cn = codes[order], s[order], b[order], n[order]
        key_starts = np.nonzero(np.r_[True, ck[1:] != ck[:-1]])[0]
        key_arr = denc.dictionary
        if nulls.any():
            key_arr = pa.concat_arrays(
                [key_arr, pa.nulls(1, key_arr.type)])
        out_k, out_q, out_v = [], [], []
        for gi, st in enumerate(key_starts):
            en = key_starts[gi + 1] if gi + 1 < len(key_starts) else len(ck)
            # merge duplicate (sign,bucket) runs from different batches
            gs, gb, gn = cs[st:en], cb[st:en], cn[st:en]
            runs = np.nonzero(np.r_[True, (gs[1:] != gs[:-1]) |
                                    (gb[1:] != gb[:-1])])[0]
            rs, rb = gs[runs], gb[runs]
            rn = np.add.reduceat(gn, runs)
            # rb is the MAGNITUDE bucket for both signs; the sign only
            # mirrors the value (the sort key above uses rs*rb purely
            # for ordering)
            est = np.where(
                rs == 0, 0.0,
                rs * 2.0 * gamma ** rb / (gamma + 1.0))
            cum = np.cumsum(rn)
            total = int(cum[-1])
            kv = key_arr[int(ck[st])].as_py() if int(ck[st]) != nk else None
            for q in qs:
                idx = max(int(np.ceil(q * total)) - 1, 0)
                k = int(np.searchsorted(cum, idx + 1))
                out_k.append(kv)
                out_q.append(q)
                out_v.append(float(est[k]))
        return pa.table({
            key_col: pa.array(out_k, key_arr.type),
            "q": pa.array(out_q, pa.float64()),
            "value_est": pa.array(out_v, pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow")
