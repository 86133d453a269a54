"""Deduplication operators for large-scale text corpora.

All shuffle-aware: exact dedup groups on a 64-bit content hash (not
the full text — the shuffle key stays 8 bytes/row); MinHash-LSH
shuffles only (band_hash, doc_id) pairs; similarity verification uses
the MinHash signatures themselves (broadcast small side / signature
agreement), never a second pass over the raw text.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _text_hash64(texts: list) -> list:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
        else:
            out.append(int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big", signed=False) >> 1)
    return out


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct ``key`` value.

    Scale shape: hash the key to 64 bits inside map_batches (combiner
    side), then a single groupby on the hash — an 8-byte shuffle key
    regardless of document size."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, key]).append_column(
            "__h", pa.array(_text_hash64(batch.column(key).to_pylist()), type=pa.uint64())
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    kept = hashed.groupby("__h").min(id_col)
    # groupby.min names the column f"min({id_col})"
    return kept.map_batches(
        lambda b: pa.table({id_col: b.column(f"min({id_col})")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _token_hashes(words: list[str]) -> np.ndarray:
    """64-bit per-token hashes via two crc32 lanes (C speed, deterministic
    across processes — unlike builtin hash())."""
    import zlib

    lo = np.fromiter(
        (zlib.crc32(w.encode()) for w in words), dtype=np.uint64, count=len(words)
    )
    hi = np.fromiter(
        (zlib.crc32(w.encode(), 0x9E3779B9) for w in words), dtype=np.uint64, count=len(words)
    )
    return (hi << np.uint64(32)) | lo


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """64-bit hashes of word k-shingles: vectorized polynomial combine of
    per-token hashes (no per-shingle Python)."""
    words = text.split()
    if not words:
        return np.array([np.uint64(0)], dtype=np.uint64)
    th = _token_hashes(words)
    if len(words) < k:
        k = len(words)
    P = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        acc = th[: len(th) - k + 1].copy()
        for j in range(1, k):
            acc = acc * P + th[j : len(th) - k + 1 + j]
    return np.unique(acc)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Stateful actor stage: permutation parameters built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a*h + b) mod p, min over shingles, vectorized (num_perm x n)
        vals = (self.a[:, None] * (h[None, :] % _MERSENNE) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack([
            self.signature(t) if t is not None else np.zeros(self.num_perm, np.uint64)
            for t in texts
        ])
        return pa.table({
            self.id_col: pa.array(ids),
            "sig": pa.array(list(sigs), type=pa.list_(pa.uint64(), self.num_perm)),
        })


def _band_rows(batch: pa.Table, bands: int, id_col: str) -> pa.Table:
    sigs = np.asarray(batch.column("sig").combine_chunks().flatten()).reshape(
        batch.num_rows, -1
    )
    num_perm = sigs.shape[1]
    rows_per_band = num_perm // bands
    ids = np.repeat(np.asarray(batch.column(id_col)), bands)
    band_idx = np.tile(np.arange(bands, dtype=np.int64), batch.num_rows)
    # hash each band slice to one u64 key
    view = sigs.reshape(batch.num_rows, bands, rows_per_band)
    mixed = view * np.uint64(0x9E3779B97F4A7C15)
    bh = mixed.sum(axis=2, dtype=np.uint64) ^ (np.arange(bands, dtype=np.uint64) << np.uint64(56))
    return pa.table({
        id_col: pa.array(ids),
        "band": pa.array(band_idx),
        "band_hash": pa.array(bh.reshape(-1)),
    })


def minhash_lsh_pairs(
    ds,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=2,
):
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold.

    sig -> band rows -> groupby(band_hash) emits candidate pairs ->
    dedup pairs -> verify via signature agreement (the signatures ARE
    the verification data — no second text pass)."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )
    sigs_mat = sigs.materialize()

    band_rows = sigs_mat.map_batches(
        lambda b: _band_rows(b, bands, id_col), batch_format="pyarrow", zero_copy_batch=True
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column(id_col).to_pylist())
        a, b = [], []
        # bucket sizes are tiny for honest thresholds; cap pathological
        # buckets to bound worst-case quadratic blowup (logged via count)
        ids = ids[:64]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pairs = band_rows.groupby("band_hash").map_groups(emit_pairs, batch_format="pyarrow")
    uniq = pairs.groupby(["a", "b"]).count()

    # broadcast signatures (small side: num_perm u64 per doc) and verify
    import ray

    sig_tbl = {}
    for b in sigs_mat.iter_batches(batch_size=None, batch_format="pyarrow"):
        m = np.asarray(b.column("sig").combine_chunks().flatten()).reshape(b.num_rows, -1)
        for i, did in enumerate(b.column(id_col).to_pylist()):
            sig_tbl[did] = m[i]
    sig_ref = ray.put(sig_tbl)

    def verify(batch: pa.Table) -> pa.Table:
        table = ray.get(sig_ref)
        a = batch.column("a").to_pylist()
        bb = batch.column("b").to_pylist()
        keep_a, keep_b, est = [], [], []
        for x, y in zip(a, bb):
            j = float((table[x] == table[y]).mean())
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                est.append(j)
        return pa.table({
            "a": pa.array(keep_a, pa.int64()),
            "b": pa.array(keep_b, pa.int64()),
            "jaccard_est": pa.array(est, pa.float64()),
        })

    return uniq.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over word-feature hashes; stateful actor stage."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        hashes = _token_hashes(words)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [0 if t is None else self.simhash(t) for t in batch.column(self.text_col).to_pylist()]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(np.array(out, dtype=np.uint64)),
        })


def simhashes(ds, concurrency=2, **kw):
    return ds.map_batches(
        SimHasher, fn_constructor_kwargs=kw, batch_format="pyarrow",
        zero_copy_batch=True, concurrency=concurrency,
    )
