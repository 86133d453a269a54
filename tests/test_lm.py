"""Bigram LM training + cross-entropy scoring (functions/lm.py)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds):
    return pa.concat_tables(
        b for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
    )


@pytest.fixture()
def corpus():
    return pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "text": pa.array(
            [f"the cat {i % 5} sat on the mat {i % 3}" if i % 7
             else "one token" for i in range(60)]),
    })


def test_bigram_model_counts_match_duckdb(ray_session, corpus):
    import duckdb

    import ray.data

    from hyparquet_writer_ray.functions.lm import bigram_model

    model = _collect(bigram_model(
        ray.data.from_arrow(corpus).repartition(4), num_buckets=3))
    con = duckdb.connect()
    con.register("documents", corpus)
    want = con.sql(
        "WITH toks AS (SELECT doc_id, string_split(text,' ') AS l "
        "FROM documents), big AS (SELECT l[i] AS w1, l[i+1] AS w2 FROM "
        "(SELECT l, unnest(generate_series(1, len(l)-1)) AS i FROM toks)) "
        "SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12, "
        "CAST(sum(count(*)) OVER (PARTITION BY w1) AS BIGINT) AS c1 "
        "FROM big GROUP BY 1, 2 ORDER BY w1, w2"
    ).arrow()
    got = model.sort_by([("w1", "ascending"), ("w2", "ascending")])
    for col in ("w1", "w2", "c12", "c1"):
        assert got.column(col).to_pylist() == want.column(col).to_pylist(), col


def test_vocab_size_exact(ray_session, corpus):
    import duckdb

    import ray.data

    from hyparquet_writer_ray.functions.lm import vocab_size

    V = vocab_size(ray.data.from_arrow(corpus).repartition(5),
                   num_buckets=4)
    con = duckdb.connect()
    con.register("documents", corpus)
    want = con.sql(
        "SELECT count(DISTINCT u.tok) FROM documents, "
        "unnest(string_split(text,' ')) AS u(tok)").fetchone()[0]
    assert V == want


def test_lm_score_unseen_bigrams_and_words(ray_session, corpus):
    """Scoring held-out text exercises both fallbacks: unseen pair with
    seen left context (c12=0, real c1) and fully unseen left word
    (c1=0). Expected values recomputed scalar-by-scalar in the test."""
    import ray.data

    from hyparquet_writer_ray.functions.lm import (
        bigram_model, lm_score, vocab_size)

    train = ray.data.from_arrow(corpus).repartition(3)
    model = _collect(bigram_model(train))
    V = vocab_size(train)
    held = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["the zebra runs", "qq ww"]),
    })
    got = _collect(lm_score(
        ray.data.from_arrow(held), model, V)).sort_by("doc_id")

    pair = {(a, b): (c, d) for a, b, c, d in zip(
        model.column("w1").to_pylist(), model.column("w2").to_pylist(),
        model.column("c12").to_pylist(), model.column("c1").to_pylist())}
    left = {}
    for w1, c1 in zip(model.column("w1").to_pylist(),
                      model.column("c1").to_pylist()):
        left.setdefault(w1, c1)

    def lp(w1, w2):
        c12, c1 = pair.get((w1, w2), (0, left.get(w1, 0)))
        return np.log((c12 + 0.5) / (c1 + 0.5 * V))

    exp = [
        -(lp("the", "zebra") + lp("zebra", "runs")) / 2,
        -lp("qq", "ww") / 1,
    ]
    assert got.column("n_bigrams").to_pylist() == [2, 1]
    assert np.allclose(got.column("xent").to_pylist(), exp, rtol=1e-12)


def test_bigram_model_min_count_prunes_pairs_not_totals(ray_session):
    import ray.data

    from hyparquet_writer_ray.functions.lm import bigram_model

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "a b", "a c"]),
    })
    model = _collect(bigram_model(
        ray.data.from_arrow(docs), min_count=2))
    rows = {(a, b): (c, d) for a, b, c, d in zip(
        model.column("w1").to_pylist(), model.column("w2").to_pylist(),
        model.column("c12").to_pylist(), model.column("c1").to_pylist())}
    # (a,c) pruned, but c1 still counts it: P(b|a) stays 2/3-shaped
    assert rows == {("a", "b"): (2, 3)}


def test_bigram_model_empty_and_short_docs(ray_session):
    """Blocks whose docs all have <=1 token (or are empty) must not
    crash the model build (regression: empty-lexsort IndexError)."""
    import ray.data

    from hyparquet_writer_ray.functions.lm import bigram_model

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["one", "two", "a b", "three"]),
    })
    model = _collect(bigram_model(
        ray.data.from_arrow(docs).repartition(4)))
    assert model.num_rows == 1  # only ("a","b")
    assert model.column("c12").to_pylist() == [1]


def test_lm_score_tokens_with_control_bytes(ray_session):
    """Tokens containing arbitrary bytes (e.g. 0x1f) must not collide
    (regression: joined-string bigram keys)."""
    import ray.data

    from hyparquet_writer_ray.functions.lm import (
        bigram_model, lm_score, vocab_size)

    # "a\x1fb c" vs "a b\x1fc": same joined form under '\x1f', but
    # genuinely different bigrams
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a\x1fb c", "a b\x1fc"]),
    })
    ds = ray.data.from_arrow(docs)
    model = _collect(bigram_model(ds))
    assert model.num_rows == 2
    got = _collect(lm_score(ds, model, vocab_size(ds))).sort_by("doc_id")
    import numpy as np
    V = 4
    # each bigram occurs once with c1=1: lp = ln(1.5 / (1 + 0.5*V))
    exp = -np.log(1.5 / (1 + 0.5 * V))
    assert np.allclose(got.column("xent").to_pylist(), [exp, exp])


def test_mixture_export_composition(ray_session, corpus, tmp_path):
    """The full mixture pipeline composes: quantile filter size, CRC
    re-read, within-part order, disjoint part ranges, pack integrity."""
    import os

    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.shuffle import shuffle_key
    from hyparquet_writer_ray.pipelines.mixture import (
        export_training_mixture, verify_mixture_output)

    out = os.path.join(str(tmp_path), "mix")
    survivors_ds, packs_ds, stats = export_training_mixture(
        ray.data.from_arrow(corpus).repartition(3), out,
        keep_quantile=0.5, pack_budget=64, seed=5)
    survivors, packs = _collect(survivors_ds), _collect(packs_ds)
    assert survivors.num_rows >= 1
    parts = verify_mixture_output(out)
    got = np.concatenate([p.column("doc_id").to_numpy(
        zero_copy_only=False) for p in parts])
    assert sorted(got.tolist()) == sorted(
        survivors.column("doc_id").to_pylist())
    for p in parts:
        k = shuffle_key(p.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64), 5)
        assert (k[1:] >= k[:-1]).all()
    packed = [d for ids in packs.column("doc_ids").to_pylist() for d in ids]
    assert sorted(packed) == sorted(survivors.column("doc_id").to_pylist())
    assert stats["rows"] == survivors.num_rows


def test_train_bigram_lm_equals_separate_passes(ray_session, corpus):
    """The fused single-scan trainer must produce exactly the same
    model and vocabulary as bigram_model + vocab_size run separately,
    including on over-partitioned input with short docs."""
    import ray.data

    from hyparquet_writer_ray.functions.lm import (
        bigram_model, train_bigram_lm, vocab_size)

    ds = ray.data.from_arrow(corpus).repartition(9)
    model_f, v_f = train_bigram_lm(ds, num_buckets=5)
    model_s = _collect(bigram_model(ds, num_buckets=5))
    v_s = vocab_size(ds, num_buckets=5)
    key = [("w1", "ascending"), ("w2", "ascending")]
    assert v_f == v_s
    assert model_f.sort_by(key).equals(model_s.sort_by(key).cast(
        model_f.schema))


def test_mixture_export_owns_out_dir(ray_session, corpus, tmp_path):
    """A rerun with different parameters into the same out_dir must not
    leave stale parts from the previous run (regression: content-hash
    part names never collide, so old parts survived silently)."""
    import os

    import ray.data

    from hyparquet_writer_ray.pipelines.mixture import (
        export_training_mixture, verify_mixture_output)

    out = os.path.join(str(tmp_path), "mix")
    ds = ray.data.from_arrow(corpus).repartition(3)
    export_training_mixture(ds, out, keep_quantile=0.9, seed=1)
    n1 = sum(p.num_rows for p in verify_mixture_output(out))
    s2_ds, _, stats2 = export_training_mixture(ds, out,
                                               keep_quantile=0.25, seed=2)
    n2 = sum(p.num_rows for p in verify_mixture_output(out))
    assert n2 == stats2["rows"] < n1, (n1, n2, stats2["rows"])


def test_mixture_export_empty_corpus(ray_session, tmp_path):
    """All-short-doc corpora (no bigrams anywhere) export cleanly."""
    import os

    import ray.data

    from hyparquet_writer_ray.pipelines.mixture import (
        export_training_mixture)

    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array(["one", "two"])})
    out = os.path.join(str(tmp_path), "mix")
    s, p, stats = export_training_mixture(
        ray.data.from_arrow(docs), out)
    assert stats["rows"] == 0
    assert s.count() == 0
