"""profile_table: exact count(*) / count(col) / count(DISTINCT col)
per column against DuckDB, including float -0.0/NaN canonicalization
and null handling."""
import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hyparquet_writer_ray.functions.stats import profile_table


def _oracle(src, cols):
    return duckdb.sql(" UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST(count(*) AS BIGINT) n_rows, "
        f"CAST(count({c}) AS BIGINT) n_nonnull, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) n_distinct FROM '{src}'"
        for c in cols) + " ORDER BY col").arrow()


def test_profile_matches_duckdb_mixed_types(ray_session, tmp_path):
    import ray.data

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "i": pa.array(
            [None if k % 17 == 0 else int(rng.integers(0, 300)) for k in range(n)],
            pa.int64()),
        "s": pa.array(
            [None if k % 23 == 0 else f"s{k % 211}" for k in range(n)],
            pa.string()),
        "f": pa.array(
            [(-0.0 if k % 5 == 0 else 0.0) if k % 11 == 0
             else (math.nan if k % 13 == 0 else float(k % 97) / 7)
             for k in range(n)], pa.float64()),
        "ts": pa.array(
            [k % 400 for k in range(n)], pa.timestamp("us")),
        "b": pa.array([bool(k % 3 == 0) for k in range(n)], pa.bool_()),
    })
    src = tmp_path / "p.parquet"
    pq.write_table(t, src)
    cols = ["i", "s", "f", "ts", "b"]
    got = profile_table(
        ray.data.read_parquet(str(src)), cols, num_buckets=8)
    want = _oracle(src, cols)
    assert got.to_pydict() == want.to_pydict()


def test_profile_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    got = profile_table(ds, ["x"], num_buckets=4)
    assert got.to_pydict() == {
        "col": ["x"], "n_rows": [0], "n_nonnull": [0], "n_distinct": [0]}


def test_profile_single_batch_combiner_dedups(ray_session):
    import ray.data

    # 4 blocks with overlapping value sets: distinct must merge across
    # the shuffle, not sum per-batch uniques
    tables = [pa.table({"v": pa.array([1, 2, 3, None], pa.int64())})
              for _ in range(4)]
    ds = ray.data.from_arrow(tables)
    got = profile_table(ds, ["v"], num_buckets=4)
    assert got.to_pydict() == {
        "col": ["v"], "n_rows": [16], "n_nonnull": [12], "n_distinct": [3]}
