"""Connected components (near-dup cluster resolution): verified
against an independent scalar union-find on random graphs, chains
(diameter stress), and multi-component mixes."""
from __future__ import annotations

import random

import pyarrow as pa
import pytest

from hyparquet_writer_ray.functions.graph import connected_components


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(ray_session, pairs, **kw):
    import ray.data

    t = pa.table({"a": pa.array([a for a, _ in pairs], pa.int64()),
                  "b": pa.array([b for _, b in pairs], pa.int64())})
    out = connected_components(ray.data.from_arrow(t), **kw)
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return {}
    got = pa.concat_tables(batches)
    return dict(zip(got.column("node").to_pylist(),
                    got.column("component").to_pylist()))


def test_components_two_clusters_and_chain(ray_session):
    pairs = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21),
             (5, 4), (4, 3)]  # {1..5}, {10,11,12}, {20,21}
    got = _run(ray_session, pairs, num_buckets=4)
    assert got == _union_find(pairs)
    assert got[5] == 1 and got[12] == 10 and got[21] == 20


def test_components_long_chain_diameter(ray_session):
    # a 40-node path: worst-case diameter for label propagation
    pairs = [(i, i + 1) for i in range(40)]
    random.Random(3).shuffle(pairs)
    got = _run(ray_session, pairs, num_buckets=8)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_components_random_vs_union_find(ray_session):
    rng = random.Random(11)
    pairs = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _run(ray_session, pairs, num_buckets=16)
    assert got == _union_find(pairs)


def test_components_empty(ray_session):
    got = _run(ray_session, [])
    assert got == {}


def test_components_nonconvergence_raises(ray_session):
    with pytest.raises(RuntimeError, match="converge"):
        _run(ray_session, [(i, i + 1) for i in range(30)], max_rounds=2)


def test_drop_near_duplicates(ray_session):
    """Keep cluster minima + unpaired rows; all doc columns survive."""
    import ray.data

    from hyparquet_writer_ray.functions.graph import drop_near_duplicates

    docs = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": [f"t{i}" for i in range(10)],
        "score": [float(i) for i in range(10)],
    })
    # clusters {1,2,3}, {7,8}; singletons 0,4,5,6,9
    prs = [(1, 2), (2, 3), (7, 8)]
    pairs = pa.table({"a": pa.array([a for a, _ in prs], pa.int64()),
                      "b": pa.array([b for _, b in prs], pa.int64())})
    out = drop_near_duplicates(
        ray.data.from_arrow(docs), ray.data.from_arrow(pairs),
        id_col="doc_id", num_buckets=4,
    )
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id")
    assert got.column("doc_id").to_pylist() == [0, 1, 4, 5, 6, 7, 9]
    assert got.column("text").to_pylist() == ["t0", "t1", "t4", "t5", "t6", "t7", "t9"]
    assert got.column("score").to_pylist() == [0.0, 1.0, 4.0, 5.0, 6.0, 7.0, 9.0]
    assert got.schema.equals(docs.schema)
