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


def _true_pairs(mat: np.ndarray, ids: list[int], threshold: float):
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mn = mat / norms[:, None]
    sims = mn @ mn.T
    out = set()
    arr = np.asarray(ids)
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if sims[i, j] >= threshold:
                out.add((min(arr[i], arr[j]), max(arr[i], arr[j])))
    return out


def test_exact_cosine_pairs_matches_bruteforce(ray_session, tmp_path):
    """Blocked exact all-pairs == in-test O(n^2) brute force, with
    enough rows to exercise MULTIPLE blocks (diagonal and off-diagonal
    block-pair tasks)."""
    import ray.data

    from hyparquet_writer_ray.functions.similarity import exact_cosine_pairs

    mat = _random_embeddings(90, 16, seed=3)
    # plant a 3-chain duplicate cluster and one extra pair
    planted = np.vstack([mat, mat[:3] * 2.0, mat[:3] * 3.0])
    ids = list(range(90)) + list(range(200, 203)) + list(range(300, 303))
    t = _as_table(planted, ids)
    # float32 storage: recompute truth from the ROUND-TRIPPED values
    stored = np.array([list(v) for v in t.column("embedding").to_pylist()],
                      dtype=np.float64)
    ds = ray.data.from_arrow(t)
    out = exact_cosine_pairs(ds, threshold=0.8, rows_per_block=16,
                             block_dir=str(tmp_path / "blocks"))
    got = _pairs(out)
    got_set = set(zip(got.column("a").to_pylist(), got.column("b").to_pylist()))
    assert got_set == _true_pairs(stored, ids, 0.8)
    # planted clusters fully connected: (0,200),(0,300),(200,300) present
    assert {(0, 200), (0, 300), (200, 300)} <= got_set
    # cos column sane: all >= threshold, planted pairs ~1.0
    assert all(c >= 0.8 for c in got.column("cos").to_pylist())


def test_exact_cosine_pairs_resumes_from_checkpoint(ray_session, tmp_path):
    """A _DONE-marked block dir is reused: the second call must not
    re-run the normalize pass (we poison the input to prove it)."""
    import ray.data

    from hyparquet_writer_ray.functions.similarity import exact_cosine_pairs

    mat = _random_embeddings(40, 8, seed=7)
    planted = np.vstack([mat, mat[:2] * 2.0])
    ids = list(range(40)) + [100, 101]
    ds = ray.data.from_arrow(_as_table(planted, ids))
    bdir = str(tmp_path / "blocks")
    first = _pairs(exact_cosine_pairs(ds, threshold=0.9, rows_per_block=8,
                                      block_dir=bdir))

    def _boom(batch):
        raise RuntimeError("normalize must not re-run on resume")

    poisoned = ds.map_batches(_boom, batch_format="pyarrow")
    second = _pairs(exact_cosine_pairs(poisoned, threshold=0.9,
                                       rows_per_block=8, block_dir=bdir))
    key = lambda t: sorted(zip(t.column("a").to_pylist(),
                               t.column("b").to_pylist()))
    assert key(first) == key(second)
    assert {(0, 100), (1, 101)} <= set(key(first))
