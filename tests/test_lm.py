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


def _score_table(docs, model, V, alpha=0.5):
    import ray.data

    from hyparquet_writer_ray.functions.lm import lm_score

    out = lm_score(ray.data.from_arrow(docs), model, V, alpha=alpha)
    return _collect(out).sort_by("doc_id")


def test_lm_score_pruned_model_uses_true_left_totals(ray_session):
    """min_count>1: a w1 whose EVERY pair was pruned must still score
    unseen bigrams with its TRUE c1 via the unpruned left-total side
    rows, matching the documented add-alpha formula over the true
    trained counts (ADVICE r3: surviving-row totals fell back to c1=0
    for a fully-pruned w1)."""
    import math

    import ray.data

    from hyparquet_writer_ray.functions.lm import train_bigram_lm

    train = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b", "a b", "a c", "x y"]),
    })
    model, V = train_bigram_lm(
        ray.data.from_arrow(train), min_count=2, num_buckets=3)
    assert V == 5
    # only (a,b) survives min_count=2; left totals a:3, x:1 unpruned
    pairs = {(w1, w2): (c12, c1) for w1, w2, c12, c1 in zip(
        model.column("w1").to_pylist(), model.column("w2").to_pylist(),
        model.column("c12").to_pylist(), model.column("c1").to_pylist())
        if w2 is not None}
    lefts = {w1: c1 for w1, w2, c1 in zip(
        model.column("w1").to_pylist(), model.column("w2").to_pylist(),
        model.column("c1").to_pylist()) if w2 is None}
    assert pairs == {("a", "b"): (2, 3)}
    assert lefts == {"a": 3, "x": 1}

    a = 0.5
    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["a c x y"])})
    got = _score_table(docs, model, V, alpha=a)
    # (a,c) pruned -> ln(a/(3+aV)); (c,x) unseen w1 -> ln(a/(0+aV));
    # (x,y) pruned -> ln(a/(1+aV))
    exp = -(math.log(a / (3 + a * V)) + math.log(a / (a * V))
            + math.log(a / (1 + a * V))) / 3
    assert math.isclose(got.column("xent")[0].as_py(), exp, rel_tol=1e-12)


def test_lm_max_model_rows_cap(ray_session):
    """Unbinding max_model_rows changes no score by even 1 ulp; a
    binding cap keeps exactly the top-K pairs by count and scores
    pruned pairs as unseen bigrams with their true denominators."""
    import math

    import ray.data

    from hyparquet_writer_ray.functions.lm import train_bigram_lm

    rng = np.random.default_rng(5)
    texts = [" ".join(rng.choice(list("abcdefg"), 12)) for _ in range(80)]
    train = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                      "text": pa.array(texts)})
    ds = ray.data.from_arrow(train)
    model_full, V = train_bigram_lm(ds, num_buckets=4)
    model_loose, V2 = train_bigram_lm(ds, num_buckets=4,
                                      max_model_rows=10_000)
    assert V2 == V
    docs = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                     "text": pa.array(texts[:10])})
    s_full = _score_table(docs, model_full, V)
    s_loose = _score_table(docs, model_loose, V2)
    assert s_full.column("xent").to_pylist() == s_loose.column("xent").to_pylist()

    K = 12
    model_cap, V3 = train_bigram_lm(ds, num_buckets=4, max_model_rows=K)
    kept_pairs = {(w1, w2): (c12, c1) for w1, w2, c12, c1 in zip(
        model_cap.column("w1").to_pylist(), model_cap.column("w2").to_pylist(),
        model_cap.column("c12").to_pylist(), model_cap.column("c1").to_pylist())
        if w2 is not None}
    assert len(kept_pairs) == K
    full = {(w1, w2): (c12, c1) for w1, w2, c12, c1 in zip(
        model_full.column("w1").to_pylist(), model_full.column("w2").to_pylist(),
        model_full.column("c12").to_pylist(), model_full.column("c1").to_pylist())}
    # deterministic top-K by (c12 desc, w1, w2)
    want_kept = dict(sorted(full.items(),
                            key=lambda kv: (-kv[1][0], kv[0]))[:K])
    assert kept_pairs == want_kept
    lefts = {w1: c1 for w1, w2, c1 in zip(
        model_cap.column("w1").to_pylist(), model_cap.column("w2").to_pylist(),
        model_cap.column("c1").to_pylist()) if w2 is None}
    a = 0.5
    got = _score_table(docs, model_cap, V3, alpha=a)
    for row_id, xent in zip(got.column("doc_id").to_pylist(),
                            got.column("xent").to_pylist()):
        toks = texts[row_id].split(" ")
        lps = []
        for w1, w2 in zip(toks, toks[1:]):
            c12, c1 = kept_pairs.get((w1, w2), (0, lefts.get(w1, 0)))
            lps.append(math.log((c12 + a) / (c1 + a * V3)))
        assert math.isclose(xent, -sum(lps) / len(lps), rel_tol=1e-12)


def test_mixture_sketch_threshold_matches_exact_bounds(ray_session, tmp_path):
    """Default (sketch) threshold keeps every doc clearly below the
    exact quantile_disc threshold and none clearly above it; with
    exact_threshold=True the surviving set equals the exact rule."""
    import os

    import ray.data

    from hyparquet_writer_ray.pipelines.mixture import export_training_mixture

    rng = np.random.default_rng(23)
    n = 400
    texts = [" ".join(rng.choice(list("abcdefghij"), rng.integers(3, 20)))
             for _ in range(n)]
    docs = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts)})
    ds = ray.data.from_arrow(docs).repartition(4)

    out_e = os.path.join(str(tmp_path), "mix_exact")
    s_exact, _, _ = export_training_mixture(
        ds, out_e, keep_quantile=0.6, seed=3, exact_threshold=True)
    exact_t = _collect(s_exact)
    xs = np.sort(exact_t.column("xent").to_numpy(zero_copy_only=False))

    out_s = os.path.join(str(tmp_path), "mix_sketch")
    a = 0.005
    s_sk, _, _ = export_training_mixture(
        ds, out_s, keep_quantile=0.6, seed=3, threshold_alpha=a)
    sk_t = _collect(s_sk)
    # exact survivors' max xent IS the exact quantile_disc threshold
    v_true = float(xs[-1])
    kept = set(sk_t.column("doc_id").to_pylist())
    for d, x in zip(exact_t.column("doc_id").to_pylist(),
                    exact_t.column("xent").to_pylist()):
        if x <= v_true * (1 - a * a) - 1e-12:
            assert d in kept, (d, x, v_true)
    for x in sk_t.column("xent").to_pylist():
        assert x <= v_true * (1 + a) ** 2 + 1e-12, (x, v_true)


def test_mixture_resume_skips_scoring_scan(ray_session, corpus, tmp_path):
    """Kill-resume over the composition: a rerun with resume=True
    reuses the _DONE-marked score checkpoint (train+score corpus scans
    skipped — checkpoint files untouched) and re-fills the killed part
    output to the identical row set."""
    import glob
    import os

    import ray.data

    from hyparquet_writer_ray.pipelines.mixture import (
        export_training_mixture, verify_mixture_output)

    out = os.path.join(str(tmp_path), "mix")
    ds = ray.data.from_arrow(corpus).repartition(3)
    s1, _, stats1 = export_training_mixture(ds, out, keep_quantile=0.5, seed=7)
    rows1 = sorted(sum((p.column("doc_id").to_pylist()
                        for p in verify_mixture_output(out)), []))
    score_files = sorted(glob.glob(os.path.join(out, "_scores", "*.parquet")))
    assert score_files and os.path.exists(
        os.path.join(out, "_scores", "_DONE"))
    sig = [(f, os.stat(f).st_mtime_ns, os.path.getsize(f))
           for f in score_files]

    # simulate a kill after scoring: the exported parts are gone, the
    # durable score checkpoint survives
    for p in glob.glob(os.path.join(out, "*.parquet")):
        os.unlink(p)
    s2, _, stats2 = export_training_mixture(
        ds, out, keep_quantile=0.5, seed=7, resume=True)
    rows2 = sorted(sum((p.column("doc_id").to_pylist()
                        for p in verify_mixture_output(out)), []))
    assert rows2 == rows1
    assert [(f, os.stat(f).st_mtime_ns, os.path.getsize(f))
            for f in score_files] == sig, "score checkpoint was rewritten"
