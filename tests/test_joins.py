"""asof_join tests: randomized equivalence vs DuckDB ASOF LEFT JOIN,
null-key/null-ts handling, string keys, and empty right side."""
from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from hyparquet_writer_ray.functions.joins import asof_join


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.concat_tables(batches)


def _duck_asof(left: pa.Table, right: pa.Table, payload: str) -> pa.Table:
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(
        f"SELECT l.*, r.{payload} FROM l ASOF LEFT JOIN r "
        f"ON l.k = r.k AND l.ts >= r.ts ORDER BY l.lid"
    ).arrow()


def test_asof_join_matches_duckdb_random(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    nl, nr = 400, 150
    left = pa.table({
        "lid": pa.array(np.arange(nl), pa.int64()),
        "k": pa.array(rng.integers(0, 20, nl), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, nl), pa.int64()),
    })
    # unique (k, ts) on the right (asof tie-winner is unspecified)
    rk = rng.integers(0, 25, nr)          # some keys never on the left
    rt = rng.integers(0, 10_000, nr)
    _, uniq = np.unique(rk * 100_000 + rt, return_index=True)
    right = pa.table({
        "k": pa.array(rk[uniq], pa.int64()),
        "ts": pa.array(rt[uniq], pa.int64()),
        "payload": pa.array(np.arange(len(uniq)) * 7, pa.int64()),
    })
    got = _collect(asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="k", on="ts", right_cols=["payload"], num_buckets=7,
    )).sort_by("lid").combine_chunks()
    want = _duck_asof(left, right, "payload").combine_chunks()
    assert got.cast(want.schema).equals(want)
    # non-vacuous: some rows matched AND some didn't
    nulls = got.column("payload").null_count
    assert 0 < nulls < got.num_rows


def test_asof_join_equal_timestamp_matches(ray_session):
    """Backward direction includes equality: left ts == right ts hits."""
    import ray.data

    left = pa.table({"lid": pa.array([0, 1], pa.int64()),
                     "k": pa.array([5, 5], pa.int64()),
                     "ts": pa.array([100, 99], pa.int64())})
    right = pa.table({"k": pa.array([5], pa.int64()),
                      "ts": pa.array([100], pa.int64()),
                      "payload": pa.array([42], pa.int64())})
    got = _collect(asof_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             by="k", on="ts")).sort_by("lid")
    assert got.column("payload").to_pylist() == [42, None]


def test_asof_join_null_keys_and_ts(ray_session):
    """Null key or null ts on the left never matches but is emitted."""
    import ray.data

    left = pa.table({"lid": pa.array([0, 1, 2], pa.int64()),
                     "k": pa.array([1, None, 1], pa.int64()),
                     "ts": pa.array([50, 50, None], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "ts": pa.array([10], pa.int64()),
                      "payload": pa.array([9], pa.int64())})
    got = _collect(asof_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             by="k", on="ts")).sort_by("lid")
    assert got.column("payload").to_pylist() == [9, None, None]
    assert got.num_rows == 3


def test_asof_join_string_keys(ray_session):
    import ray.data

    left = pa.table({"lid": pa.array([0, 1, 2], pa.int64()),
                     "k": pa.array(["a", "b", "zz"]),
                     "ts": pa.array([5, 5, 5], pa.int64())})
    right = pa.table({"k": pa.array(["a", "b", "b"]),
                      "ts": pa.array([1, 2, 4], pa.int64()),
                      "payload": pa.array([10, 20, 40], pa.int64())})
    got = _collect(asof_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             by="k", on="ts", num_buckets=3)).sort_by("lid")
    assert got.column("payload").to_pylist() == [10, 40, None]


def test_asof_join_empty_right(ray_session):
    import ray.data

    left = pa.table({"lid": pa.array([0, 1], pa.int64()),
                     "k": pa.array([1, 2], pa.int64()),
                     "ts": pa.array([5, 6], pa.int64())})
    right = pa.table({"k": pa.array([], pa.int64()),
                      "ts": pa.array([], pa.int64()),
                      "payload": pa.array([], pa.int64())})
    got = _collect(asof_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             by="k", on="ts")).sort_by("lid")
    assert got.num_rows == 2
    assert got.column("payload").null_count == 2


def test_broadcast_join_left_and_inner(ray_session):
    import ray.data

    left = pa.table({"lid": pa.array([0, 1, 2, 3], pa.int64()),
                     "k": pa.array([10, 20, 99, 10], pa.int64())})
    right = pa.table({"k": pa.array([10, 20], pa.int64()),
                      "name": pa.array(["ten", "twenty"])})
    from hyparquet_writer_ray.functions.joins import broadcast_join

    lj = _collect(broadcast_join(ray.data.from_arrow(left), right,
                                 on="k")).sort_by("lid")
    assert lj.column("name").to_pylist() == ["ten", "twenty", None, "ten"]
    ij = _collect(broadcast_join(ray.data.from_arrow(left), right,
                                 on="k", how="inner")).sort_by("lid")
    assert ij.column("lid").to_pylist() == [0, 1, 3]


def test_broadcast_join_rejects_duplicate_right_keys(ray_session):
    import pytest
    import ray.data
    from ray.exceptions import RayError

    from hyparquet_writer_ray.functions.joins import broadcast_join

    left = pa.table({"k": pa.array([1], pa.int64())})
    right = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "v": pa.array([2, 3], pa.int64())})
    # the ValueError raised in the actor __init__ surfaces as a Ray
    # actor-death error through the Dataset executor
    with pytest.raises((ValueError, RayError)):
        _collect(broadcast_join(ray.data.from_arrow(left), right, on="k"))


def test_interval_join_matches_duckdb_between(ray_session):
    """interval_join == SQL LEFT JOIN ... ON key match AND on BETWEEN
    start AND end, for non-overlapping per-key intervals (randomized)."""
    import ray.data

    from hyparquet_writer_ray.functions.joins import interval_join

    rng = np.random.default_rng(5)
    rows = []
    for k in range(6):
        t = 0
        for s in range(rng.integers(1, 5)):
            start = t + int(rng.integers(1, 50))
            end = start + int(rng.integers(0, 30))
            t = end + 1
            rows.append((k, start, end, k * 100 + s))
    right = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                      "s_start": pa.array([r[1] for r in rows], pa.int64()),
                      "s_end": pa.array([r[2] for r in rows], pa.int64()),
                      "sid": pa.array([r[3] for r in rows], pa.int64())})
    nl = 300
    left = pa.table({"lid": pa.array(np.arange(nl), pa.int64()),
                     "k": pa.array(rng.integers(0, 8, nl), pa.int64()),
                     "on": pa.array(rng.integers(0, 200, nl), pa.int64())})
    got = _collect(interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="k", on="on", right_cols=["sid"], num_buckets=4,
    )).sort_by("lid").combine_chunks()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        'SELECT l.*, r.sid FROM l LEFT JOIN r ON l.k = r.k '
        'AND l."on" BETWEEN r.s_start AND r.s_end ORDER BY l.lid'
    ).arrow().combine_chunks()
    assert got.cast(want.schema).equals(want)
    nulls = got.column("sid").null_count
    assert 0 < nulls < got.num_rows  # both paths exercised


def test_hash_join_matches_duckdb(ray_session):
    """Bucketed big-x-big hash_join == SQL LEFT/INNER JOIN on randomized
    data (right unique on key; some keys absent from each side)."""
    import ray.data

    from hyparquet_writer_ray.functions.joins import hash_join

    rng = np.random.default_rng(9)
    left = pa.table({"lid": pa.array(np.arange(500), pa.int64()),
                     "k": pa.array(rng.integers(0, 40, 500), pa.int64())})
    rk = np.unique(rng.integers(0, 55, 35))
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "v": pa.array(rk * 3, pa.int64()),
                      "s": pa.array([f"x{int(x)}" for x in rk])})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how, sqlhow in (("left", "LEFT JOIN"), ("inner", "JOIN")):
        got = _collect(hash_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", right_cols=["v", "s"], how=how, num_buckets=5,
        )).sort_by("lid").combine_chunks()
        want = con.execute(
            f"SELECT l.*, r.v, r.s FROM l {sqlhow} r ON l.k = r.k "
            f"ORDER BY l.lid").arrow().combine_chunks()
        assert got.cast(want.schema).equals(want), how


def test_hash_join_string_keys_and_dup_raise(ray_session):
    import pytest
    import ray.data
    from ray.exceptions import RayError

    from hyparquet_writer_ray.functions.joins import hash_join

    left = pa.table({"lid": pa.array([0, 1, 2], pa.int64()),
                     "k": pa.array(["a", "b", "zz"])})
    right = pa.table({"k": pa.array(["a", "zz"]),
                      "v": pa.array([1, 2], pa.int64())})
    got = _collect(hash_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(right),
                             on="k", num_buckets=3)).sort_by("lid")
    assert got.column("v").to_pylist() == [1, None, 2]
    dup = pa.table({"k": pa.array(["a", "a"]), "v": pa.array([1, 2], pa.int64())})
    with pytest.raises((ValueError, RayError)):
        _collect(hash_join(ray.data.from_arrow(left),
                           ray.data.from_arrow(dup), on="k"))
