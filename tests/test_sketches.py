"""HyperLogLog sketch tests: accuracy bounds, merge associativity,
string columns, determinism."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from hyparquet_writer_ray.functions.sketches import (
    _hash_column,
    _registers,
    _splitmix64,
    hll_distinct,
    hll_estimate,
)


def test_hll_accuracy_bounds():
    for n in (100, 10_000, 200_000):
        vals = _splitmix64(np.arange(n, dtype=np.uint64))
        est = hll_estimate(_registers(vals, 12))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_single_pass():
    vals = _splitmix64(np.arange(50_000, dtype=np.uint64))
    whole = _registers(vals, 10)
    merged = np.maximum(_registers(vals[:20_000], 10), _registers(vals[20_000:], 10))
    assert (whole == merged).all()


def test_hll_string_column_and_duplicates():
    col = pa.array([f"user-{i % 500}" for i in range(5_000)] + [None])
    est = hll_estimate(_registers(_hash_column(col), 12))
    assert abs(est - 500) / 500 < 0.08


def test_hll_distinct_over_dataset(ray_session):
    import ray.data

    t = pa.table({"k": pa.array(np.arange(30_000, dtype=np.int64) % 7_000)})
    out = hll_distinct(ray.data.from_arrow(t), "k", p=12)
    assert abs(out["estimate"] - 7_000) / 7_000 < 0.05
    # deterministic across runs
    out2 = hll_distinct(ray.data.from_arrow(t), "k", p=12)
    assert out["estimate"] == out2["estimate"]
