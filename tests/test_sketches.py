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


def test_exact_quantiles_quantile_disc_parity(ray_session):
    """exact_quantiles must match DuckDB quantile_disc exactly:
    element at floor((n-1)*q) of the sorted values, nulls ignored."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.stats import exact_quantiles

    vals = [7, 1, 1, 3, None, 9, 2, 2, 2, 100, 5, None, 4]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    got = exact_quantiles(ds, "x", qs=(0.0, 0.25, 0.5, 0.9, 1.0))
    want = {
        q: duckdb.sql(
            f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest({[v for v in vals if v is not None]}) x)"
        ).fetchone()[0]
        for q in (0.0, 0.25, 0.5, 0.9, 1.0)
    }
    assert dict(zip(got.column("q").to_pylist(), got.column("value").to_pylist())) == want
    empty = exact_quantiles(
        ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())})), "x")
    assert empty.num_rows == 0


def test_group_topk_matches_duckdb_window(ray_session):
    """group_topk == row_number() OVER (PARTITION BY ... ORDER BY value
    DESC, id) <= k on randomized data with heavy value ties."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.stats import group_topk

    rng = np.random.default_rng(23)
    n = 600
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "key": pa.array(rng.integers(0, 12, n).astype("int64")),
        "val": pa.array(rng.integers(0, 9, n).astype("int64")),  # many ties
    })
    out = group_topk(ray.data.from_arrow(t), key_col="key", value_col="val",
                     id_col="id", k=4, num_buckets=5)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).select(["key", "id", "val"]).sort_by(
        [("key", "ascending"), ("val", "descending"), ("id", "ascending")]
    ).combine_chunks()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT key, id, CAST(val AS DOUBLE) AS val FROM ("
        "SELECT *, row_number() OVER (PARTITION BY key ORDER BY val DESC, id)"
        " AS rn FROM t) WHERE rn <= 4 ORDER BY key, val DESC, id"
    ).arrow().combine_chunks()
    assert got.cast(want.schema).equals(want)


def test_grouped_quantiles_matches_duckdb(ray_session):
    """grouped_quantiles == quantile_disc GROUP BY key on randomized
    data with awkward row counts (q*n non-integral exercises the
    ceil(q*n)-1 rank rule)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.stats import grouped_quantiles

    for seed, n in ((3, 5000), (7, 997), (11, 61)):
        rng = np.random.default_rng(seed)
        t = pa.table({"k": pa.array(rng.choice(["en", "de", "fr", "xx"], n)),
                      "v": pa.array(rng.integers(0, 300, n).astype("int64"))})
        out = grouped_quantiles(ray.data.from_arrow(t), key_col="k", col="v",
                                qs=(0.25, 0.5, 0.9), num_buckets=3)
        got = pa.concat_tables(
            b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("k", "ascending"), ("q", "ascending")]).combine_chunks()
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT k, CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.25)"
            " AS BIGINT) AS value FROM t GROUP BY k UNION ALL "
            "SELECT k, 0.5, CAST(quantile_disc(v, 0.5) AS BIGINT) FROM t "
            "GROUP BY k UNION ALL SELECT k, 0.9, CAST(quantile_disc(v, 0.9) "
            "AS BIGINT) FROM t GROUP BY k ORDER BY k, q"
        ).arrow().combine_chunks()
        assert got.cast(want.schema).equals(want), (seed, n)


def test_exact_quantiles_awkward_n(ray_session):
    """Global quantile rank rule at q*n non-integral (caught a latent
    floor((n-1)q) divergence from DuckDB's ceil(q*n)-1)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.stats import exact_quantiles

    rng = np.random.default_rng(7)
    t = pa.table({"v": pa.array(rng.integers(0, 50, 997).astype("int64"))})
    got = exact_quantiles(ray.data.from_arrow(t), "v", qs=(0.3, 0.9, 0.99))
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT CAST(0.3 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.3) AS "
        "BIGINT) AS value FROM t UNION ALL SELECT 0.9, "
        "CAST(quantile_disc(v, 0.9) AS BIGINT) FROM t UNION ALL SELECT "
        "0.99, CAST(quantile_disc(v, 0.99) AS BIGINT) FROM t ORDER BY q"
    ).arrow().combine_chunks()
    assert got.combine_chunks().equals(want.cast(got.schema))


def test_grouped_hll_within_error_envelope(ray_session):
    """Per-key HLL estimates track exact count(DISTINCT) within ±5%
    for every key (string and int keys, null keys/values included),
    and small groups hit exactly via the small-range correction."""
    import duckdb
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.sketches import grouped_hll_distinct

    rng = np.random.default_rng(21)
    n = 30000
    t = pa.table({
        "k": pa.array([None if i % 401 == 0 else f"g{int(x)}"
                       for i, x in enumerate(rng.integers(0, 9, n))],
                      pa.string()),
        "v": pa.array([None if i % 83 == 0 else int(x)
                       for i, x in enumerate(rng.integers(0, 4000, n))],
                      pa.int64()),
    })
    out = grouped_hll_distinct(
        ray.data.from_arrow(t).repartition(7),
        key_col="k", value_col="v", num_buckets=4)
    got_t = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow"))
    got = dict(zip(got_t.column("k").to_pylist(),
                   got_t.column("n_distinct_approx").to_pylist()))
    con = duckdb.connect()
    con.register("t", t)
    want = {r[0]: r[1] for r in con.sql(
        "SELECT k, count(DISTINCT v) FROM t GROUP BY k").fetchall()}
    assert set(got) == set(want)
    for k, w in want.items():
        assert abs(got[k] - w) <= max(0.05 * w, 2), (k, got[k], w)


def test_count_min_sketch_bounds(ray_session):
    """CMS point estimates never underestimate and stay within the
    2n/width bound for every queried value (string and int columns);
    heavy hitters are near-exact."""
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.sketches import (
        cms_estimate, count_min_sketch)

    rng = np.random.default_rng(11)
    zipf = np.minimum(rng.zipf(1.3, 40000), 5000)
    t = pa.table({"v": pa.array([f"tok{int(x)}" for x in zipf])})
    cms = count_min_sketch(
        ray.data.from_arrow(t).repartition(6), "v",
        depth=4, width=4096)
    assert cms["n"] == 40000
    import collections
    true = collections.Counter(t.column("v").to_pylist())
    qvals = pa.array(list(true.keys()))
    est = cms_estimate(cms, qvals)
    errs = est - np.array([true[k] for k in qvals.to_pylist()])
    assert (errs >= 0).all(), "CMS underestimated"
    bound = 2 * cms["n"] / cms["width"]
    # the 2n/width bound is PER-VALUE probabilistic (holds w.p.
    # 1 - 2^-depth): gate the violation fraction, not the max
    assert (errs > bound).mean() <= 2.0 * 2.0 ** -cms["depth"]
    assert errs.mean() <= bound
    # the single heaviest token should be essentially exact
    top = max(true, key=true.get)
    top_est = cms_estimate(cms, pa.array([top]))[0]
    assert abs(top_est - true[top]) <= bound


def test_count_min_deterministic_and_mergeable(ray_session):
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.sketches import count_min_sketch

    t = pa.table({"v": pa.array(list(range(1000)) * 3, pa.int64())})
    a = count_min_sketch(ray.data.from_arrow(t).repartition(2), "v")
    b = count_min_sketch(ray.data.from_arrow(t).repartition(7), "v")
    assert np.array_equal(a["sketch"], b["sketch"]), \
        "sketch depends on partitioning"


def test_cms_estimate_rejects_nulls(ray_session):
    import pytest

    import ray.data

    from hyparquet_writer_ray.functions.sketches import (
        cms_estimate, count_min_sketch)

    t = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    cms = count_min_sketch(ray.data.from_arrow(t), "v")
    with pytest.raises(ValueError, match="null"):
        cms_estimate(cms, pa.array([1, None], pa.int64()))


def test_dd_quantile_sketch_relative_error(ray_session):
    """DDSketch estimates are within relative error alpha of the exact
    quantile_disc values for mixed negative/zero/positive data with
    nulls, at any partitioning."""
    import duckdb
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.sketches import (
        dd_quantile_estimate, dd_quantile_sketch)

    rng = np.random.default_rng(5)
    vals = rng.normal(0, 3, 40000)
    vals[::100] = 0.0
    t = pa.table({"v": pa.array(
        [None if i % 97 == 0 else float(x) for i, x in enumerate(vals)],
        pa.float64())})
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    sk = dd_quantile_sketch(
        ray.data.from_arrow(t).repartition(6), "v", alpha=0.01)
    est = dd_quantile_estimate(sk, qs)
    con = duckdb.connect()
    con.register("t", t)
    for q, e in zip(qs, est):
        true = con.sql(
            f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert abs(e - true) <= 0.01 * abs(true) + 1e-12, (q, e, true)
    # deterministic across partitionings
    sk2 = dd_quantile_sketch(
        ray.data.from_arrow(t).repartition(13), "v", alpha=0.01)
    assert dd_quantile_estimate(sk2, qs) == est
    # exact-zero quantile: rank landing in the zero store returns 0.0
    tz = pa.table({"v": pa.array([0.0] * 50 + [1.0] * 10, pa.float64())})
    skz = dd_quantile_sketch(ray.data.from_arrow(tz), "v", alpha=0.01)
    assert dd_quantile_estimate(skz, (0.5,)) == [0.0]


def test_dd_sketch_ignores_inf_and_rejects_empty(ray_session):
    """+/-inf are excluded like nulls (regression: log(inf) cast to
    INT64_MIN ranked inf as the smallest positive); an empty sketch
    raises instead of crashing with IndexError."""
    import duckdb
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.sketches import (
        dd_quantile_estimate, dd_quantile_sketch)

    vals = np.linspace(1.0, 100.0, 1000)
    t = pa.table({"v": pa.array(
        vals.tolist() + [float("inf"), float("-inf")], pa.float64())})
    sk = dd_quantile_sketch(ray.data.from_arrow(t), "v", alpha=0.01)
    assert sk["n"] == 1000
    est = dd_quantile_estimate(sk, (0.99,))[0]
    con = duckdb.connect()
    tf = pa.table({"v": pa.array(vals, pa.float64())})
    con.register("t", tf)
    true = con.sql("SELECT quantile_disc(v, 0.99) FROM t").fetchone()[0]
    assert abs(est - true) <= 0.01 * true
    import pytest

    empty = dd_quantile_sketch(
        ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())})),
        "v")
    with pytest.raises(ValueError, match="empty"):
        dd_quantile_estimate(empty, (0.5,))


def test_grouped_dd_quantiles_within_alpha(ray_session):
    """Per-key DDSketch quantiles track exact per-key quantile_disc
    within relative error alpha for every key and q, on mixed
    negative/zero/positive data with null keys and values."""
    import duckdb
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.sketches import (
        grouped_dd_quantiles)

    rng = np.random.default_rng(17)
    n = 30000
    ks = [None if i % 301 == 0 else f"d{int(x)}"
          for i, x in enumerate(rng.integers(0, 6, n))]
    vs = rng.normal(0, 5, n)
    vs[::120] = 0.0
    vs_l = [None if i % 97 == 0 else float(x) for i, x in enumerate(vs)]
    t = pa.table({"k": pa.array(ks, pa.string()),
                  "v": pa.array(vs_l, pa.float64())})
    qs = (0.1, 0.5, 0.9)
    out = grouped_dd_quantiles(
        ray.data.from_arrow(t).repartition(7), key_col="k", col="v",
        qs=qs, alpha=0.01, num_buckets=4)
    got = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow"))
    got_map = {(k, q): v for k, q, v in zip(
        got.column("k").to_pylist(), got.column("q").to_pylist(),
        got.column("value_est").to_pylist())}
    con = duckdb.connect()
    con.register("t", t)
    for q in qs:
        want = con.sql(
            f"SELECT k, quantile_disc(v, {q}) FROM t "
            "WHERE v IS NOT NULL GROUP BY k").fetchall()
        for k, true in want:
            est = got_map[(k, q)]
            assert abs(est - true) <= 0.01 * abs(true) + 1e-9, \
                (k, q, est, true)
    assert len(got_map) == len(want) * len(qs)


def test_grouped_quantiles_integer_keys_keep_type(ray_session):
    """Integer key columns come back as int64 (not digit strings) with
    exact per-key quantiles (ADVICE r3: the old large_string cast
    changed the key type and its sort order)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.stats import grouped_quantiles

    rng = np.random.default_rng(13)
    t = pa.table({"k": pa.array(rng.integers(0, 12, 4000).astype("int64")),
                  "v": pa.array(rng.integers(0, 500, 4000).astype("int64"))})
    out = grouped_quantiles(ray.data.from_arrow(t), key_col="k", col="v",
                            qs=(0.5, 0.9), num_buckets=3)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("k", "ascending"), ("q", "ascending")]).combine_chunks()
    assert got.column("k").type == pa.int64()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, CAST(0.5 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.5) AS "
        "BIGINT) AS value FROM t GROUP BY k UNION ALL SELECT k, 0.9, "
        "CAST(quantile_disc(v, 0.9) AS BIGINT) FROM t GROUP BY k "
        "ORDER BY k, q").arrow().combine_chunks()
    assert got.cast(want.schema).equals(want)


def test_grouped_quantiles_timestamp_keys(ray_session):
    """Non-hashable key types (timestamps) are stringified for
    BUCKETING only; the emitted key keeps its original type (the r4
    type-preserving fix must not narrow the accepted key domain)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.stats import grouped_quantiles

    rng = np.random.default_rng(3)
    days = rng.integers(0, 5, 1500).astype("int64") * 86_400_000
    t = pa.table({"k": pa.array(days).cast(pa.timestamp("ms")),
                  "v": pa.array(rng.integers(0, 100, 1500).astype("int64"))})
    out = grouped_quantiles(ray.data.from_arrow(t), key_col="k", col="v",
                            qs=(0.5,), num_buckets=3)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("k", "ascending")]).combine_chunks()
    assert pa.types.is_timestamp(got.column("k").type)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT k, CAST(0.5 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.5) AS "
        "BIGINT) AS value FROM t GROUP BY k ORDER BY k").arrow().combine_chunks()
    assert got.cast(want.schema).equals(want)
