"""Regression tests for the round-4 functions review findings:
empty-block handling in similarity/graph stages, broadcast_join
null-key and collision semantics, empty-corpus dedup checkpoints."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture
def ray_data(ray_session):
    import ray.data

    return ray.data


def _emb_table(n, d=4, start=0):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, d))
    return pa.table({
        "vec_id": pa.array(range(start, start + n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })


def test_similarity_ops_tolerate_empty_blocks(ray_data, tmp_path):
    from hyparquet_writer_ray.functions.similarity import (
        exact_cosine_pairs, ivf_topk, lsh_bucket_pairs, topk_cosine,
    )

    t = _emb_table(32)
    ds = ray_data.from_arrow([t, t.slice(0, 0)])
    q = np.asarray(t.column("embedding").to_pylist()[0])

    top = topk_cosine(ds, q, k=3)
    assert top.num_rows == 3 and top.column("vec_id").to_pylist()[0] == 0

    got = ivf_topk(ds, q, k=3, n_clusters=2, nprobe=2)
    assert got.num_rows == 3 and got.column("vec_id").to_pylist()[0] == 0

    pairs = lsh_bucket_pairs(ds, dim=4, threshold=0.99, n_planes=4)
    pairs.count()  # must not crash on the empty block

    ep = exact_cosine_pairs(ds, threshold=0.999,
                            block_dir=str(tmp_path / "blocks"))
    ep.count()


def test_ivf_topk_empty_dataset(ray_data):
    from hyparquet_writer_ray.functions.similarity import ivf_topk

    ds = ray_data.from_arrow(_emb_table(0))
    got = ivf_topk(ds, np.ones(4), k=3)
    assert got.num_rows == 0
    assert got.schema.names == ["vec_id", "score"]


def test_drop_near_duplicates_tolerates_empty_blocks(ray_data):
    from hyparquet_writer_ray.functions.graph import drop_near_duplicates

    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                     "text": ["a", "b", "c", "d"]})
    ds = ray_data.from_arrow([docs, docs.slice(0, 0)])
    pairs = ray_data.from_arrow(pa.table({
        "a": pa.array([1], pa.int64()), "b": pa.array([3], pa.int64())}))
    kept = drop_near_duplicates(ds, pairs, num_buckets=4)
    ids = sorted(r["doc_id"] for r in kept.take_all())
    assert ids == [1, 2, 4]  # 3 dropped (cluster rep is min id 1)


def test_broadcast_join_null_keys_never_match(ray_data):
    from hyparquet_writer_ray.functions.joins import broadcast_join

    left = ray_data.from_arrow(pa.table({
        "k": pa.array(["a", None, "b"], pa.string())}))
    right = pa.table({"k": pa.array(["a", None], pa.string()),
                      "v": pa.array([1, 99], pa.int64())})
    out = broadcast_join(left, right, on="k", how="left").take_all()
    by_key = {r["k"]: r["v"] for r in out}
    assert by_key["a"] == 1
    assert by_key[None] is None  # null key must not pick up the 99 row
    inner = broadcast_join(left, right, on="k", how="inner").take_all()
    assert [r["k"] for r in inner] == ["a"]


def test_broadcast_join_rejects_column_collision(ray_data):
    from hyparquet_writer_ray.functions.joins import broadcast_join

    left = ray_data.from_arrow(pa.table({
        "k": ["a"], "v": pa.array([0], pa.int64())}))
    right = pa.table({"k": ["a"], "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="already exist"):
        broadcast_join(left, right, on="k")


def test_minhash_and_ngram_pairs_empty_corpus(ray_data, tmp_path):
    from hyparquet_writer_ray.functions.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs,
    )

    empty = ray_data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    pairs = minhash_lsh_pairs(empty, sig_dir=str(tmp_path / "sigs"))
    assert pairs.count() == 0
    assert set(pairs.schema().names) >= {"a", "b", "jaccard_est"}

    cands = ray_data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    ng = ngram_jaccard_pairs(empty, cands, grams_dir=str(tmp_path / "grams"))
    assert ng.count() == 0
    assert set(ng.schema().names) == {"a", "b", "jaccard"}
