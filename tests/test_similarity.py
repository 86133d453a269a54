"""Similarity-search operator tests: planted near-duplicate recovery
and the hot-bucket star guard for lsh_bucket_pairs."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from hyparquet_writer_ray.functions.similarity import lsh_bucket_pairs, topk_cosine


def _random_embeddings(n: int, dim: int, seed: int = 11) -> np.ndarray:
    return np.random.default_rng(seed).normal(0, 1, (n, dim))


def _as_table(mat: np.ndarray, ids=None) -> pa.Table:
    n, dim = mat.shape
    if ids is None:
        ids = range(n)
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })


def _pairs(out) -> pa.Table:
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return pa.concat_tables(batches)


def test_lsh_recovers_planted_near_dups(ray_session):
    import ray.data

    mat = _random_embeddings(100, 32)
    # plant: ids 200..204 are scaled copies of ids 0..4 (cosine == 1,
    # identical hyperplane bucket by construction)
    planted = np.vstack([mat, mat[:5] * 2.0])
    t = _as_table(planted, list(range(100)) + list(range(200, 205)))
    out = lsh_bucket_pairs(ray.data.from_arrow(t), dim=32, threshold=0.95)
    res = _pairs(out)
    got = set(zip(res.column("a").to_pylist(), res.column("b").to_pylist()))
    assert {(i, 200 + i) for i in range(5)} <= got
    # random 32-dim gaussians essentially never hit cos >= 0.95
    assert got == {(i, 200 + i) for i in range(5)}
    cos = res.column("cos").to_pylist()
    assert all(abs(c - 1.0) < 1e-9 for c in cos)


def test_lsh_hot_bucket_star_guard(ray_session):
    """All vectors identical -> one bucket of n > max_bucket; the stage
    must emit n-1 flagged star pairs, not n(n-1)/2."""
    import ray.data

    n = 30
    mat = np.tile(_random_embeddings(1, 16), (n, 1))
    out = lsh_bucket_pairs(ray.data.from_arrow(_as_table(mat)), dim=16,
                           threshold=0.9, max_bucket=10)
    res = _pairs(out)
    got = set(zip(res.column("a").to_pylist(), res.column("b").to_pylist()))
    assert got == {(0, i) for i in range(1, n)}
    assert all(res.column("from_oversized").to_pylist())


def test_topk_cosine_exact(ray_session):
    import ray.data

    mat = _random_embeddings(200, 16, seed=3)
    q = mat[7]
    out = topk_cosine(ray.data.from_arrow(_as_table(mat)), q, k=5)
    # independent exact computation (float32 quantization applied, as
    # the table stores float32)
    m32 = mat.astype(np.float32).astype(np.float64)
    q32 = q.astype(np.float32).astype(np.float64)
    sims = (m32 @ (q32 / np.linalg.norm(q32))) / np.linalg.norm(m32, axis=1)
    want = list(np.argsort(-sims)[:5])
    assert out.column("vec_id").to_pylist() == want
    assert out.column("vec_id").to_pylist()[0] == 7


def test_ivf_topk_exact_when_probing_all(ray_session):
    """nprobe == n_clusters must reproduce brute-force top-k exactly."""
    import ray.data

    from hyparquet_writer_ray.functions.similarity import ivf_topk

    mat = _random_embeddings(300, 16, seed=9)
    ds = ray.data.from_arrow(_as_table(mat))
    q = mat[5]
    exact = topk_cosine(ds, q, k=8)
    ivf = ivf_topk(ds, q, k=8, n_clusters=6, nprobe=6, sample_size=300)
    assert ivf.column("vec_id").to_pylist() == exact.column("vec_id").to_pylist()


def test_ivf_topk_recall_on_clustered_data(ray_session):
    """With clustered vectors and nprobe << n_clusters, IVF must find
    the true neighbors (they share the query's cluster)."""
    import ray.data

    from hyparquet_writer_ray.functions.similarity import ivf_topk

    rng = np.random.default_rng(4)
    centers = rng.normal(0, 1, (8, 24))
    mat = np.vstack([c + rng.normal(0, 0.05, (50, 24)) for c in centers])
    ds = ray.data.from_arrow(_as_table(mat))
    q = centers[3] + rng.normal(0, 0.05, 24)
    exact = set(topk_cosine(ds, q, k=10).column("vec_id").to_pylist())
    ivf = ivf_topk(ds, q, k=10, n_clusters=8, nprobe=2, sample_size=400)
    got = set(ivf.column("vec_id").to_pylist())
    recall = len(got & exact) / 10
    assert recall >= 0.9, recall
    # every hit lives in the query's true cluster id range [150, 200)
    assert all(150 <= v < 200 for v in got)
