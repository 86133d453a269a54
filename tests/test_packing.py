"""Sequence packing: token-budget bin construction."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from hyparquet_writer_ray.functions.packing import (
    pack_bucket_arrays,
    pack_sequences,
)


def test_pack_bucket_invariants():
    rng = np.random.default_rng(3)
    ids = np.arange(5000, dtype=np.int64)
    toks = rng.integers(1, 700, 5000).astype(np.int64)  # some > budget
    budget = 512
    bins = pack_bucket_arrays(ids, toks, budget)
    seen = np.concatenate([m for _, m, _ in bins])
    assert sorted(seen.tolist()) == ids.tolist()
    tok_of = dict(zip(ids.tolist(), toks.tolist()))
    for _, members, s in bins:
        assert s == sum(tok_of[i] for i in members.tolist())
        assert s <= budget or len(members) == 1
    # next-fit-decreasing bound: consecutive bins sum > budget
    sums = [s for _, _, s in bins]
    for a, b in zip(sums, sums[1:]):
        assert a + b > budget


def test_pack_bucket_deterministic_any_order():
    rng = np.random.default_rng(5)
    ids = rng.permutation(np.arange(1000)).astype(np.int64)
    toks = rng.integers(0, 300, 1000).astype(np.int64)
    a = pack_bucket_arrays(ids, toks, 256)
    order2 = rng.permutation(1000)
    b = pack_bucket_arrays(ids[order2], toks[order2], 256)
    assert [(x, m.tolist(), s) for x, m, s in a] == \
        [(x, m.tolist(), s) for x, m, s in b]


def test_pack_sequences_dataset(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    n, budget = 3000, 300
    t = pa.table({
        "doc_id": pa.array(np.arange(n)),
        "n_tokens": pa.array(
            [None if i % 97 == 0 else int(x)
             for i, x in enumerate(rng.integers(1, 400, n))], pa.int64()),
    })
    out = pack_sequences(ray.data.from_arrow(t).repartition(6),
                         budget=budget, num_buckets=8)
    got = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow"))
    packed = sorted(x for lst in got.column("doc_ids").to_pylist()
                    for x in lst)
    assert packed == list(range(n))
    for s, over, nd in zip(got.column("n_tokens").to_pylist(),
                           got.column("oversize").to_pylist(),
                           got.column("n_docs").to_pylist()):
        assert over == (s > budget)
        assert s <= budget or nd == 1
    # pack ids unique and bucket-deterministic
    pids = got.column("pack_id").to_pylist()
    assert len(pids) == len(set(pids))
