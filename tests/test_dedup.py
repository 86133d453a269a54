"""Dedup operator tests: exact (128-bit key), MinHash-LSH join-based
verification (no driver-side materialization), star policy for hot
buckets, SimHash."""
from __future__ import annotations

import inspect
import random

import numpy as np
import pyarrow as pa

from hyparquet_writer_ray.functions import dedup as dedup_mod
from hyparquet_writer_ray.functions.dedup import (
    MinHasher,
    _sig_matrix,
    _text_hash128,
    exact_dedup,
    minhash_lsh_pairs,
)


def _rand_docs(n: int, seed: int = 7, words: int = 80) -> list[str]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(500)]
    return [" ".join(rng.choice(vocab) for _ in range(words)) for _ in range(n)]


def test_exact_dedup_key_is_128_bits():
    texts = ["hello", None, "", "hello", "héllo 世界", "\x00abc", "abc"]
    for backend in ("polars", "md5"):
        hi, lo = _text_hash128(texts, backend=backend)
        assert hi[1] is None and lo[1] is None
        # equal texts agree; the two halves are independent lanes — no
        # truncation of the 128-bit key
        assert (hi[0], lo[0]) == (hi[3], lo[3])
        assert hi[0] != lo[0]
        distinct = {(hi[i], lo[i]) for i, t in enumerate(texts) if t is not None}
        assert len(distinct) == len({t for t in texts if t is not None})
    # the md5 fallback stays bit-compatible with its definition so a
    # backend pinned to md5 is reproducible everywhere
    import hashlib

    hi, lo = _text_hash128(["hello"], backend="md5")
    d = hashlib.md5(b"hello").digest()
    assert hi[0] == int.from_bytes(d[:8], "big", signed=True)
    assert lo[0] == int.from_bytes(d[8:], "big", signed=True)


def test_text_hash128_col_matches_list_path_and_slices():
    """The Arrow-buffer path must honor array offsets (sliced batches)
    and chunked columns."""
    import pyarrow.compute as pc

    from hyparquet_writer_ray.functions.dedup import _text_hash128_col

    texts = [f"doc {i} " + "x" * (i % 37) for i in range(100)] + [None, ""]
    arr = pa.chunked_array([texts[:40], texts[40:]], pa.string())
    hi, lo = _text_hash128_col(arr)
    sliced = pa.table({"t": arr}).slice(17, 50)
    hi_s, lo_s = _text_hash128_col(sliced.column("t"))
    assert hi.slice(17, 50).to_pylist() == hi_s.to_pylist()
    assert lo.slice(17, 50).to_pylist() == lo_s.to_pylist()
    li_hi, li_lo = _text_hash128(texts)
    assert hi.to_pylist() == li_hi and lo.to_pylist() == li_lo
    assert pc.count(hi, mode="only_null").as_py() == 1


def test_no_driver_side_broadcast_in_dedup_module():
    """The scale contract: minhash verification must not ray.put any
    O(n_docs) structure. Enforced at the source level — the module may
    not call ray.put at all."""
    src = inspect.getsource(dedup_mod)
    assert "ray.put" not in src
    assert ".materialize()" not in src


def test_minhash_planted_near_dups(ray_session, tmp_path):
    import ray.data

    texts = _rand_docs(60)
    base = texts[0]
    texts = [base, base, base + " extra word", base.replace("w0", "v0")] + texts[4:]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = minhash_lsh_pairs(
        ray.data.from_arrow(t), threshold=0.5, num_partitions=2,
        sig_dir=str(tmp_path / "sigs"),
    )
    res = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    pairs = set(zip(res.column("a").to_pylist(), res.column("b").to_pylist()))
    # all pairs among the planted cluster {0,1,2,3}, nothing else
    assert (0, 1) in pairs
    assert all(a < 4 and b < 4 for a, b in pairs)
    j = {
        (a, b): v
        for a, b, v in zip(res.column("a").to_pylist(), res.column("b").to_pylist(),
                           res.column("jaccard_est").to_pylist())
    }
    assert j[(0, 1)] == 1.0  # identical docs agree on every permutation
    assert all(v >= 0.5 for v in j.values())
    assert not any(res.column("from_oversized").to_pylist())


def test_minhash_star_policy_on_hot_bucket(ray_session, tmp_path):
    """A bucket larger than max_bucket must not go quadratic: it emits
    n-1 star pairs flagged from_oversized=true, keeping every member
    connected to the representative (nothing silently dropped)."""
    import ray.data

    n = 40
    texts = ["identical document body " * 10] * n
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts})
    out = minhash_lsh_pairs(
        ray.data.from_arrow(t), threshold=0.5, num_partitions=2,
        max_bucket=8, sig_dir=str(tmp_path / "sigs"),
    )
    res = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    pairs = set(zip(res.column("a").to_pylist(), res.column("b").to_pylist()))
    assert pairs == {(0, i) for i in range(1, n)}  # star around min id
    assert all(res.column("from_oversized").to_pylist())
    # every doc still reachable: ids 1..n-1 all appear
    covered = {b for _, b in pairs} | {a for a, _ in pairs}
    assert covered == set(range(n))


def test_sig_matrix_roundtrip():
    m = MinHasher(num_perm=16)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["alpha beta gamma delta", "epsilon zeta eta theta"]})
    out = m(t)
    assert out.column("sig").type == pa.binary()
    mat = _sig_matrix(out.column("sig"), 16)
    assert mat.shape == (2, 16)
    assert (mat[0] == m.signature("alpha beta gamma delta")).all()
    # sliced column path (non-contiguous offsets start)
    mat2 = _sig_matrix(out.column("sig").slice(1), 16)
    assert (mat2[0] == mat[1]).all()


def test_exact_dedup_keeps_min_id(ray_session):
    import ray.data

    t = pa.table({
        "doc_id": pa.array([5, 3, 9, 1], pa.int64()),
        "text": ["same", "same", "other", "same"],
    })
    out = exact_dedup(ray.data.from_arrow(t))
    kept = sorted(
        pa.concat_tables(
            b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        ).column("doc_id").to_pylist()
    )
    assert kept == [1, 9]


def test_batch_signatures_match_per_doc():
    """The vectorized batch path must be bit-identical to the scalar
    signature() for every doc shape: normal, short (<k tokens), empty,
    null, multi-space, leading/trailing whitespace."""
    import pyarrow as pa

    m = MinHasher(num_perm=32)
    texts = ["alpha beta gamma delta epsilon", "one", "two words", "",
             None, "a  b   c", "  lead trail  ", "x " * 500]
    got = m._batch_signatures(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        want = m.signature(t) if t is not None else np.zeros(32, np.uint64)
        assert (got[i] == want).all(), (i, t)


def test_ngram_jaccard_exact_values(ray_session, tmp_path):
    """Exact k-gram Jaccard equals a hand-computed set ratio and drops
    pairs where either side is shorter than k words."""
    import ray.data

    from hyparquet_writer_ray.functions.dedup import ngram_jaccard_pairs

    texts = [
        "a b c d e",      # grams: abc bcd cde
        "a b c x y",      # grams: abc bcx cxy  -> inter 1, union 5 -> 0.2
        "a b c d e",      # identical to 0 -> 1.0
        "x y",            # < 3 words: no grams -> dropped
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    cands = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 0, 0, 1], pa.int64()),
        "b": pa.array([1, 2, 3, 3], pa.int64()),
    }))
    out = ngram_jaccard_pairs(
        ray.data.from_arrow(t), cands, k=3, threshold=0.05,
        grams_dir=str(tmp_path / "grams"), num_partitions=2,
    )
    res = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("a", "ascending"), ("b", "ascending")])
    got = {
        (a, b): j for a, b, j in zip(res.column("a").to_pylist(),
                                     res.column("b").to_pylist(),
                                     res.column("jaccard").to_pylist())
    }
    assert got == {(0, 1): 0.2, (0, 2): 1.0}


def test_minhash_sig_dir_reuse_no_duplication(ray_session, tmp_path):
    """Rerunning with the same sig_dir must NOT duplicate signatures
    (write_parquet appends!) — the checkpoint is reused via its _DONE
    marker and results are identical, and the expensive signature pass
    is skipped (true resume)."""
    import os

    import ray.data

    texts = _rand_docs(30)
    texts = [texts[0], texts[0]] + texts[2:]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    sd = str(tmp_path / "sigs")

    def run():
        out = minhash_lsh_pairs(ray.data.from_arrow(t), threshold=0.5,
                                num_partitions=2, sig_dir=sd)
        res = pa.concat_tables(
            b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        return sorted(zip(res.column("a").to_pylist(), res.column("b").to_pylist()))

    first = run()
    assert first == [(0, 1)]
    assert os.path.exists(os.path.join(sd, "_DONE"))
    n_files = len([f for f in os.listdir(sd) if f.endswith(".parquet")])
    second = run()  # reuses the checkpoint
    assert second == first  # no 4x duplication
    assert len([f for f in os.listdir(sd) if f.endswith(".parquet")]) == n_files


def test_exact_dedup_rows_matches_exact_dedup(ray_session):
    """Property: the row-carrying dedup keeps exactly the ids the
    id-only dedup selects, on randomized duplicated corpora."""
    import random

    import ray.data

    rng = random.Random(12)
    base = _rand_docs(40, seed=12)
    texts, ids = [], []
    next_id = 0
    for t in base:
        for _ in range(rng.randrange(1, 4)):  # 1-3 copies each
            texts.append(t)
            ids.append(next_id)
            next_id += 1
    order = list(range(len(texts)))
    rng.shuffle(order)
    t = pa.table({
        "doc_id": pa.array([ids[i] for i in order], pa.int64()),
        "text": [texts[i] for i in order],
    })
    ds = ray.data.from_arrow(t)
    want = sorted(pa.concat_tables(
        b for b in exact_dedup(ds).iter_batches(batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    from hyparquet_writer_ray.functions.dedup import exact_dedup_rows
    got_t = pa.concat_tables(
        b for b in exact_dedup_rows(ds).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    got = sorted(got_t.column("doc_id").to_pylist())
    assert got == want
    assert len(got) == 40
    # full rows preserved: text of each kept row matches its id
    by_id = {i: x for i, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    for i, x in zip(got_t.column("doc_id").to_pylist(), got_t.column("text").to_pylist()):
        assert by_id[i] == x


def test_exact_dedup_rows_null_group_matches_sql_semantics(ray_session):
    """Null texts form ONE group (SQL GROUP BY), matching exact_dedup."""
    import ray.data

    t = pa.table({
        "doc_id": pa.array([3, 1, 2, 4, 5], pa.int64()),
        "text": ["x", "x", None, None, "y"],
    })
    from hyparquet_writer_ray.functions.dedup import exact_dedup_rows

    got = sorted(pa.concat_tables(
        b for b in exact_dedup_rows(ray.data.from_arrow(t)).iter_batches(
            batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    want = sorted(pa.concat_tables(
        b for b in exact_dedup(ray.data.from_arrow(t)).iter_batches(
            batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    assert got == want == [1, 2, 5]


def test_latest_by_key_matches_duckdb_window(ray_session):
    """latest_by_key == row_number() OVER (PARTITION BY key ORDER BY
    ts DESC, id DESC) = 1 — randomized, both int and string keys,
    null keys and null timestamps included."""
    import duckdb
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.dedup import latest_by_key

    rng = np.random.default_rng(13)
    n = 4000
    urls = [None if i % 101 == 0 else f"u{int(k)}"
            for i, k in enumerate(rng.integers(0, 80, n))]
    ts = pa.array([None if i % 37 == 0 else int(x)
                   for i, x in enumerate(rng.integers(0, 1000, n))],
                  pa.int64())
    t = pa.table({
        "doc_id": pa.array(np.arange(n)),
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "ikey": pa.array(rng.integers(0, 80, n)),
    })
    con = duckdb.connect()
    con.register("t", t)
    for key in ("url", "ikey"):
        out = latest_by_key(
            ray.data.from_arrow(t).repartition(9),
            key=key, ts_col="warc_ts", id_col="doc_id", num_buckets=7,
        )
        got = pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by("doc_id")
        want = con.sql(f"""
            WITH r AS (SELECT doc_id, url, warc_ts, ikey, row_number()
              OVER (PARTITION BY {key} ORDER BY
                    coalesce(warc_ts, -9223372036854775808) DESC,
                    doc_id DESC) rn FROM t)
            SELECT doc_id, url, warc_ts, ikey FROM r WHERE rn = 1
            ORDER BY doc_id""").arrow()
        assert got.to_pylist() == want.to_pylist(), key


def test_paragraph_dedup_matches_duckdb(ray_session):
    """CCNet-style paragraph dedup == the SQL first-occurrence rule
    (min(doc_id, idx) per distinct paragraph, docs reassembled in
    order, all-duplicate docs dropped) — randomized with planted
    boilerplate paragraphs and null docs."""
    import duckdb
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.dedup import paragraph_dedup

    rng = np.random.default_rng(2)
    boiler = ["copyright footer", "subscribe now", "rights reserved"]
    docs, n = [], 1500
    for i in range(n):
        if i % 151 == 0:
            docs.append(None)
            continue
        k = int(rng.integers(1, 6))
        paras = [f"para {int(rng.integers(0, 500))} content"
                 for _ in range(k)]
        paras.insert(int(rng.integers(0, k + 1)), boiler[i % 3])
        docs.append(".".join(paras))
    t = pa.table({"doc_id": pa.array(np.arange(n)),
                  "text": pa.array(docs, pa.string())})
    out = paragraph_dedup(ray.data.from_arrow(t).repartition(7),
                          sep=".", num_buckets=16)
    got = pa.concat_tables(
        out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id")
    con = duckdb.connect()
    con.register("d", t)
    want = con.sql("""
        WITH p AS (
          SELECT doc_id, i AS idx, paras[i] AS para
          FROM (SELECT doc_id, string_split(text, '.') AS paras FROM d),
               unnest(range(1, len(paras)+1)) AS g(i)),
        keep AS (SELECT para, min(doc_id * 1000000 + idx) AS k
                 FROM p GROUP BY para)
        SELECT p.doc_id, string_agg(p.para, '.' ORDER BY p.idx)
          AS text_dedup
        FROM p JOIN keep ON p.para = keep.para
          AND p.doc_id * 1000000 + p.idx = keep.k
        GROUP BY p.doc_id ORDER BY p.doc_id""").arrow()
    assert got.column("doc_id").to_pylist() == want.column(
        "doc_id").to_pylist()
    assert got.column("text_dedup").to_pylist() == want.column(
        "text_dedup").to_pylist()


def test_exact_dedup_normalize_collapses_case_and_whitespace(ray_session):
    import ray.data

    from hyparquet_writer_ray.functions.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": ["Hello  World", "hello world ", "  HELLO\tWORLD",
                 "different", None, None],
    })
    got = sorted(pa.concat_tables(
        exact_dedup(ray.data.from_arrow(t), normalize=True).iter_batches(
            batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    assert got == [1, 4, 5]
    # without normalize all six survive (all raw strings distinct)
    got_raw = sorted(pa.concat_tables(
        exact_dedup(ray.data.from_arrow(t)).iter_batches(
            batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    assert got_raw == [1, 2, 3, 4, 5]


def test_scratch_dir_knob_routes_all_checkpoints(monkeypatch, tmp_path):
    """HPW_SCRATCH_DIR is the ONE shared-scratch knob: with it set, the
    minhash/ngram/cosine checkpoint defaults all land under it (never
    a bare node-local tempdir)."""
    from hyparquet_writer_ray.functions.dedup import _scratch_dir

    base = tmp_path / "shared_scratch"
    monkeypatch.setenv("HPW_SCRATCH_DIR", str(base))
    for prefix in ("minhash_sigs_", "ngram_sets_", "cospairs_blocks_"):
        d = _scratch_dir(prefix)
        assert d.startswith(str(base)), d
        import os
        assert os.path.isdir(d)
    monkeypatch.delenv("HPW_SCRATCH_DIR")
    d = _scratch_dir("minhash_sigs_")
    assert not d.startswith(str(base))


def test_scratch_dir_uri_routes_through_fsspec(monkeypatch):
    """Since r5 an fsspec URI is a VALID scratch base (the marker
    protocol goes through state/fsio.py) — the returned checkpoint dir
    stays in the URI namespace instead of scattering node-local
    's3:/...' directories. Full URI behavior is in test_fsio.py."""
    from hyparquet_writer_ray.functions.dedup import _scratch_dir
    from hyparquet_writer_ray.state import fsio

    monkeypatch.setenv("HPW_SCRATCH_DIR", "memory://dedup_scratch")
    d = _scratch_dir("minhash_sigs_")
    assert d.startswith("memory://dedup_scratch/minhash_sigs_")
    assert fsio.exists(d)
    fsio.rm_tree("memory://dedup_scratch")
