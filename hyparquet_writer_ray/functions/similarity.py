"""Similarity search over embedding columns (list<float>).

- ``topk_cosine``: brute-force cosine top-k, scale-shaped: the query
  matrix is broadcast once (ray.put), every batch does one numpy
  matmul, per-batch top-k reduces before the tiny driver-side merge —
  no global sort, no all-to-all.
- ``lsh_bucket_pairs``: random-hyperplane LSH variant for
  all-pairs near-neighbor search: shuffle on a 16-bit bucket key,
  within-bucket matmul. The IVF-style scale path.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.arrays import single_chunk


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    arr = single_chunk(arr)
    if batch.num_rows == 0:
        # reshape(0, -1) raises; infer the width from the type if fixed
        t = arr.type
        d = t.list_size if pa.types.is_fixed_size_list(t) else 0
        return np.empty((0, d), dtype=np.float64)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)



def _merge_topk(reduced, k: int, id_col: str) -> pa.Table:
    """Driver-side k-way merge of per-batch top-k lists (k * n_batches
    rows); ties broken by id ascending for determinism."""
    cand: list[tuple[float, int]] = []
    for b in reduced.iter_batches(batch_size=None, batch_format="pyarrow"):
        cand.extend(zip(b.column("score").to_pylist(),
                        b.column(id_col).to_pylist()))
    cand.sort(key=lambda sv: (-sv[0], sv[1]))
    best = cand[:k]
    return pa.table({
        id_col: pa.array([v for _, v in best], pa.int64()),
        "score": pa.array([s for s, _ in best], pa.float64()),
    })


def topk_cosine(ds, query: np.ndarray, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"):
    """Top-k most cosine-similar rows to ``query``. Returns a small
    pyarrow Table (id, score) — the result is k rows, never a Dataset
    materialization of the input."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def batch_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        qv = ray.get(q_ref)
        m = _embedding_matrix(batch, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        scores = (m @ qv) / norms
        ids = np.asarray(batch.column(id_col))
        kk = min(k, len(scores))
        # deterministic per-batch top-k: ties at the k-th score keep the
        # smallest ids (argpartition would drop an arbitrary tied row and
        # could diverge from the ORDER BY score DESC, id oracle)
        order = np.lexsort((ids, -scores))[:kk]
        return pa.table({
            id_col: pa.array(ids[order]),
            "score": pa.array(scores[order], pa.float64()),
        })

    reduced = ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk(reduced, k, id_col)


class HyperplaneBucketer:
    """Stateful stage: random hyperplanes drawn once per actor (seeded)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(0, 1, (dim, n_planes))
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                self.id_col: batch.column(self.id_col),
                self.vec_col: batch.column(self.vec_col),
                "bucket": pa.array([], pa.uint64()),
            })
        m = _embedding_matrix(batch, self.vec_col)
        signs = (m @ self.planes) > 0
        bucket = (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            self.vec_col: batch.column(self.vec_col),
            "bucket": pa.array(bucket),
        })


def lsh_bucket_pairs(ds, *, dim: int, threshold: float = 0.9, n_planes: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     concurrency=2, max_bucket: int = 2048):
    """Embedding-cosine near-duplicate pairs via hyperplane LSH buckets:
    candidates only form within a bucket (the shuffle key is one u64).

    Skew guard: a bucket larger than ``max_bucket`` does NOT run the
    O(n^2) all-pairs matrix (one hot bucket would otherwise OOM a
    single map_groups task — near-duplicate-heavy corpora produce
    them).  Oversized buckets switch to a *star* scan against the
    bucket's min-id representative (O(n) memory and compute), flagged
    ``from_oversized=true`` and logged — every member is still checked
    against the representative, so duplicate clusters stay connected
    and nothing is silently dropped."""
    bucketed = ds.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )

    def _empty() -> pa.Table:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64()),
                         "from_oversized": pa.array([], pa.bool_())})

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty()
        m = _embedding_matrix(group, vec_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        ids = np.asarray(group.column(id_col))
        if n > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "lsh_bucket_pairs: bucket of %d vectors > max_bucket=%d; "
                "star scan vs representative instead of %d all-pairs",
                n, max_bucket, n * (n - 1) // 2,
            )
            rep = int(np.argmin(ids))
            sims = mn @ mn[rep]
            mask = sims >= threshold
            mask[rep] = False
            return pa.table({
                "a": pa.array(np.minimum(ids[rep], ids[mask]), pa.int64()),
                "b": pa.array(np.maximum(ids[rep], ids[mask]), pa.int64()),
                "cos": pa.array(sims[mask], pa.float64()),
                "from_oversized": pa.array(np.ones(int(mask.sum()), dtype=bool)),
            })
        sims = mn @ mn.T
        iu = np.triu_indices(n, 1)
        mask = sims[iu] >= threshold
        return pa.table({
            "a": pa.array(np.minimum(ids[iu[0]][mask], ids[iu[1]][mask]), pa.int64()),
            "b": pa.array(np.maximum(ids[iu[0]][mask], ids[iu[1]][mask]), pa.int64()),
            "cos": pa.array(sims[iu][mask], pa.float64()),
            "from_oversized": pa.array(np.zeros(int(mask.sum()), dtype=bool)),
        })

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact all-pairs cosine — blocked cross product (the embedding-cosine
# near-duplicate DEDUP path with exact semantics; lsh_bucket_pairs is the
# sub-quadratic approximate path)
# ---------------------------------------------------------------------------


class _BlockPairScorer:
    """Stateful stage for block-pair tasks: loads at most two vector
    blocks per item (tiny per-actor LRU so the diagonal sweep reuses
    the hot block), runs ONE float64 matmul, emits id pairs with
    cosine >= threshold. Per-task memory is bounded by two blocks
    regardless of corpus size."""

    _CACHE_MAX = 4

    def __init__(self, block_dir: str, threshold: float, id_col: str) -> None:
        self.block_dir = block_dir
        self.threshold = float(threshold)
        self.id_col = id_col
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.pop(b, None)
        if hit is not None:
            self._cache[b] = hit  # refresh LRU position
            return hit
        from ..state import fsio

        t = fsio.pq_read_table(
            fsio.join(self.block_dir, f"block-{b}.parquet"))
        ids = np.asarray(t.column(self.id_col), dtype=np.int64)
        m = np.asarray(
            single_chunk(t.column("__nvec")).flatten(), dtype=np.float64
        ).reshape(len(ids), -1)
        if len(self._cache) >= self._CACHE_MAX:
            self._cache.pop(next(iter(self._cache)))
        self._cache[b] = (ids, m)
        return ids, m

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_cos = [], [], []
        for bi, bj in zip(batch.column("bi").to_pylist(),
                          batch.column("bj").to_pylist()):
            ids_i, mi = self._load(bi)
            ids_j, mj = self._load(bj)
            if not len(ids_i) or not len(ids_j):
                continue
            sims = mi @ mj.T
            mask = sims >= self.threshold
            if bi == bj:
                mask &= ids_i[:, None] < ids_j[None, :]  # strict upper pairs
            ii, jj = np.nonzero(mask)
            if not len(ii):
                continue
            ai, bi_ = ids_i[ii], ids_j[jj]
            out_a.append(np.minimum(ai, bi_))
            out_b.append(np.maximum(ai, bi_))
            out_cos.append(sims[ii, jj])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "cos": pa.array(np.concatenate(out_cos), pa.float64()),
        })


def exact_cosine_pairs(ds, *, threshold: float = 0.9,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       rows_per_block: int = 16384,
                       block_dir: str | None = None,
                       concurrency=2):
    """EXACT embedding-cosine near-duplicate pairs: every (a, b) with
    cosine(a, b) >= threshold, a < b. The exact dedup-mode companion to
    the approximate ``lsh_bucket_pairs``.

    Scale shape — exact all-pairs is inherently O(n^2) *similarity
    work*; what must NOT be O(n^2) (or even O(n)) is any single task or
    the driver:

    1. one streaming pass L2-normalizes vectors and assigns each row a
       block by a mixed hash of its id (``splitmix64(id) % B``, B sized
       to ``rows_per_block``); one parquet file per block is
       checkpointed via a constant-B groupby (resume marker ``_DONE``
       — the normalize pass is skipped on rerun, same contract as the
       MinHash signature checkpoint).
    2. the B*(B+1)/2 block pairs fan out as independent tasks
       (``ray.data.from_items``); each task loads exactly two blocks
       (per-actor LRU), does one float64 matmul, emits only
       above-threshold id pairs. Per-task memory: 2 blocks; driver
       memory: O(1); output: the true pair set, streamed.

    On a multi-node cluster pass ``block_dir`` on SHARED storage —
    an nfs/fuse mount or, since r5, an fsspec URI (``s3://…``; the
    marker and block files go through state/fsio.py) — every scorer
    actor must see the checkpoint namespace.
    """
    import ray.data

    from ..state import fsio
    from .sketches import _splitmix64

    if block_dir is None:
        # default routes through HPW_SCRATCH_DIR (shared storage on a
        # multi-node cluster); node-local tempdir only when unset
        from .dedup import _scratch_dir

        block_dir = _scratch_dir("cospairs_blocks_")

    fsio.makedirs(block_dir)
    marker = fsio.join(block_dir, "_DONE")
    if not fsio.exists(marker):
        n = ds.count()
        B = max(1, int(np.ceil(n / max(int(rows_per_block), 1))))

        def normalize(batch: pa.Table):
            if batch.num_rows == 0:
                return  # emit no block: __nvec width is data-dependent
            ids = single_chunk(batch.column(id_col)).cast(pa.int64())
            m = _embedding_matrix(batch, vec_col)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            mn = m / norms[:, None]
            dim = mn.shape[1]
            flat = pa.array(mn.reshape(-1), pa.float64())
            yield pa.table({
                id_col: ids,
                "__nvec": pa.FixedSizeListArray.from_arrays(flat, dim),
                "__block": pa.array(
                    (_splitmix64(ids.to_numpy(zero_copy_only=False)
                                 .astype(np.uint64)) % np.uint64(B)
                     ).astype(np.int64)),
            })

        if fsio.glob_in(block_dir, "block-*.parquet"):
            fsio.rm_tree(block_dir)  # partial write from a crashed run
            fsio.makedirs(block_dir)

        def write_block(group: pa.Table) -> pa.Table:
            from hyparquet_writer_ray.state import fsio as _fsio

            if group.num_columns == 0 or group.num_rows == 0:
                return pa.table({"block": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            b = group.column("__block")[0].as_py()
            _fsio.pq_write_table(
                group.drop_columns(["__block"]),
                _fsio.join(block_dir, f"block-{b}.parquet"))
            return pa.table({"block": pa.array([b], pa.int64()),
                             "n": pa.array([group.num_rows], pa.int64())})

        manifest = (
            ds.map_batches(normalize, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__block")
            .map_groups(write_block, batch_format="pyarrow")
        )
        blocks = sorted(
            b for bt in manifest.iter_batches(batch_size=None,
                                              batch_format="pyarrow")
            for b in bt.column("block").to_pylist()
        )
        fsio.write_marker(marker, ",".join(str(b) for b in blocks))
    else:
        blocks = [int(x) for x in fsio.read_marker(marker).split(",") if x]

    items = [{"bi": bi, "bj": bj}
             for i, bi in enumerate(blocks) for bj in blocks[i:]]
    if not items:  # empty input
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64())}))
    return ray.data.from_items(items).map_batches(
        _BlockPairScorer,
        fn_constructor_kwargs=dict(block_dir=block_dir, threshold=threshold,
                                   id_col=id_col),
        batch_format="pyarrow", batch_size=4, concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate top-k — the scale path for ANN
# ---------------------------------------------------------------------------


def _kmeans(x: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Small Lloyd's k-means on unit vectors (cosine = dot); empty
    clusters are reseeded from random points. Deterministic."""
    rng = np.random.default_rng(seed)
    n = len(x)
    k = min(k, n)
    cent = x[rng.choice(n, k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                cent[c] = v / nv if nv > 0 else x[rng.integers(n)]
            else:
                cent[c] = x[rng.integers(n)]
    return cent


def ivf_topk(ds, query: np.ndarray, k: int = 10, *, n_clusters: int = 16,
             nprobe: int = 4, sample_size: int = 4096, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF-style approximate cosine top-k.

    Scale shape: centroids are trained on a BOUNDED sample
    (``ds.limit(sample_size)`` — fixed-size driver materialization, not
    O(n)), broadcast once via ``ray.put``; every batch assigns its
    vectors to the nearest centroid and scores ONLY vectors whose
    centroid is among the query's ``nprobe`` closest — the candidate
    set shrinks by ~nprobe/n_clusters versus brute force. With
    ``nprobe == n_clusters`` the result is exactly brute-force top-k
    (the SQL-oracle configuration); smaller nprobe trades recall for
    a proportional compute/bandwidth cut."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)

    sample_batches = [b for b in ds.limit(sample_size).iter_batches(
        batch_size=None, batch_format="pyarrow") if b.num_rows]
    if not sample_batches:  # empty dataset: no vectors to search
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    sample = pa.concat_tables(sample_batches)
    xs = _embedding_matrix(sample, vec_col)
    norms = np.linalg.norm(xs, axis=1)
    norms[norms == 0] = 1.0
    cent = _kmeans(xs / norms[:, None], n_clusters, seed=seed)
    probe = np.argsort(-(cent @ q))[: min(nprobe, len(cent))]
    cent_ref = ray.put(cent)
    probe_set = np.zeros(len(cent), dtype=bool)
    probe_set[probe] = True

    def batch_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        c = ray.get(cent_ref)
        m = _embedding_matrix(batch, vec_col)
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        mn = m / nrm[:, None]
        assign = np.argmax(mn @ c.T, axis=1)
        mask = probe_set[assign]
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        scores = mn[mask] @ q
        ids = np.asarray(batch.column(id_col))[mask]
        kk = min(k, len(scores))
        order = np.lexsort((ids, -scores))[:kk]  # ties keep smallest ids
        return pa.table({
            id_col: pa.array(ids[order]),
            "score": pa.array(scores[order], pa.float64()),
        })

    reduced = ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _merge_topk(reduced, k, id_col)
