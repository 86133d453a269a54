"""fsspec-backed checkpoint namespaces (VERDICT r4 item 3): the _DONE
marker protocol, scratch knob, block files and score checkpoints must
work against object-store-style URIs, not just POSIX mounts. memory://
covers the helper semantics in-process; file:// URIs drive the full
distributed kill-resume paths end-to-end through real Ray workers
(every byte routed through the fsspec branch of state/fsio.py)."""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from hyparquet_writer_ray.state import fsio


def test_is_uri_schemes_and_windows_drive():
    # ADVICE r4: 'C://shared/scratch' is a Windows drive path, not a URI
    assert not fsio.is_uri("C://shared/scratch")
    assert not fsio.is_uri("/tmp/x")
    assert not fsio.is_uri("relative/dir")
    assert fsio.is_uri("s3://bucket/key")
    assert fsio.is_uri("memory://ckpt")
    assert fsio.is_uri("file:///tmp/x")


def test_memory_uri_marker_glob_rmtree():
    base = "memory://fsio_t1"
    fsio.makedirs(base)
    marker = fsio.join(base, "_DONE")
    assert not fsio.exists(marker)
    fsio.write_marker(marker, "1,2,3")
    assert fsio.exists(marker)
    assert fsio.read_marker(marker) == "1,2,3"
    fsio.pq_write_table(pa.table({"x": [1, 2, 3]}),
                        fsio.join(base, "block-0.parquet"))
    fsio.pq_write_table(pa.table({"x": [4]}),
                        fsio.join(base, "block-1.parquet"))
    got = fsio.glob(fsio.join(base, "block-*.parquet"))
    assert [os.path.basename(p) for p in got] == \
        ["block-0.parquet", "block-1.parquet"]
    assert all(p.startswith("memory://") for p in got)  # caller namespace
    assert fsio.parquet_num_rows(got[0]) == 3
    t = fsio.pq_read_table(got[1])
    assert t.column("x").to_pylist() == [4]
    fsio.rm_tree(base)
    assert not fsio.exists(marker)
    fsio.rm_tree(base)  # second removal is a no-op, not an error


def test_mkdtemp_memory_base_unique():
    a = fsio.mkdtemp("sigs_", base="memory://fsio_scratch")
    b = fsio.mkdtemp("sigs_", base="memory://fsio_scratch")
    assert a != b and a.startswith("memory://fsio_scratch/sigs_")
    assert fsio.exists(a) and fsio.exists(b)
    fsio.rm_tree("memory://fsio_scratch")


def test_scratch_dir_accepts_uri_and_windows_drive(monkeypatch, tmp_path):
    from hyparquet_writer_ray.functions.dedup import _scratch_dir

    monkeypatch.setenv("HPW_SCRATCH_DIR", "memory://fsio_knob")
    d = _scratch_dir("minhash_sigs_")
    assert d.startswith("memory://fsio_knob/minhash_sigs_")
    assert fsio.exists(d)
    fsio.rm_tree("memory://fsio_knob")
    # one-letter scheme = Windows drive syntax: treated as a LOCAL path
    # (the old substring test raised ValueError on it)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HPW_SCRATCH_DIR", "C://shared/scratch")
    d = _scratch_dir("ngram_sets_")
    assert os.path.isdir(d)


def test_checkpoint_partial_write_cleared_memory():
    """A dir with parquet but NO marker is a crashed partial write and
    must be cleared before re-checkpointing (URI branch semantics)."""
    from hyparquet_writer_ray.functions.dedup import _checkpoint_is_empty

    base = "memory://fsio_partial"
    fsio.makedirs(base)
    fsio.pq_write_table(pa.table({"x": [1]}),
                        fsio.join(base, "p0.parquet"))
    assert not _checkpoint_is_empty(base)
    assert not fsio.exists(fsio.join(base, "_DONE"))
    fsio.rm_tree(base)


def _file_uri(p) -> str:
    return f"file://{p}"


def test_minhash_file_uri_checkpoint_kill_resume(ray_session, tmp_path):
    """The existing sig_dir kill-resume contract, driven through a
    file:// URI so every marker/glob/write/read crosses the fsspec
    branch with real multi-process Ray workers."""
    import ray.data

    from hyparquet_writer_ray.functions.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(30)]
    texts = [texts[0], texts[0]] + texts[2:]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    sd = _file_uri(tmp_path / "sigs")

    def run():
        out = minhash_lsh_pairs(ray.data.from_arrow(t), threshold=0.5,
                                num_partitions=2, sig_dir=sd)
        res = pa.concat_tables(
            b for b in out.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
        return sorted(zip(res.column("a").to_pylist(),
                          res.column("b").to_pylist()))

    first = run()
    assert (0, 1) in first
    marker = os.path.join(str(tmp_path / "sigs"), "_DONE")
    assert os.path.exists(marker)  # URI write landed on the real fs
    n_files = len([f for f in os.listdir(str(tmp_path / "sigs"))
                   if f.endswith(".parquet")])
    assert n_files > 0
    second = run()  # resume: checkpoint reused, no append duplication
    assert second == first
    assert len([f for f in os.listdir(str(tmp_path / "sigs"))
                if f.endswith(".parquet")]) == n_files
    # kill-before-marker: partial dir is cleared and rebuilt
    os.unlink(marker)
    third = run()
    assert third == first


def test_exact_cosine_file_uri_block_resume(ray_session, tmp_path):
    """Block files + blocklist marker through file:// URIs; the resume
    must not re-run the normalize pass (poisoned input proves it)."""
    import ray.data

    from hyparquet_writer_ray.functions.similarity import exact_cosine_pairs

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 8))
    planted = np.vstack([mat, mat[:2] * 2.0])
    ids = list(range(40)) + [100, 101]
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in planted],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    bdir = _file_uri(tmp_path / "blocks")

    def pairs(out):
        res = pa.concat_tables(
            b for b in out.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
        return sorted(zip(res.column("a").to_pylist(),
                          res.column("b").to_pylist()))

    first = pairs(exact_cosine_pairs(ds, threshold=0.9, rows_per_block=8,
                                     block_dir=bdir))
    assert {(0, 100), (1, 101)} <= set(first)
    assert os.path.exists(str(tmp_path / "blocks" / "_DONE"))

    def _boom(batch):
        raise RuntimeError("normalize must not re-run on resume")

    poisoned = ds.map_batches(_boom, batch_format="pyarrow")
    second = pairs(exact_cosine_pairs(poisoned, threshold=0.9,
                                      rows_per_block=8, block_dir=bdir))
    assert second == first


def test_mixture_score_dir_file_uri(ray_session, tmp_path):
    """export_training_mixture with a URI score_dir: the score
    checkpoint lives off the POSIX out_dir and resume still skips the
    corpus scans."""
    import ray.data

    from hyparquet_writer_ray.pipelines.mixture import (
        export_training_mixture, verify_mixture_output)

    rng = np.random.default_rng(11)
    words = ["the", "data", "web", "page", "crawl", "content"]
    docs = [" ".join(rng.choice(words, 20)) for _ in range(40)]
    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": docs})
    ds = ray.data.from_arrow(t).repartition(2)
    out = str(tmp_path / "mix")
    sd = _file_uri(tmp_path / "scores_remote")
    s1, _, _ = export_training_mixture(ds, out, keep_quantile=0.5,
                                       seed=7, score_dir=sd)
    rows1 = sorted(sum((p.column("doc_id").to_pylist()
                        for p in verify_mixture_output(out)), []))
    assert rows1
    assert os.path.exists(str(tmp_path / "scores_remote" / "_DONE"))
    scores = sorted(f for f in os.listdir(str(tmp_path / "scores_remote"))
                    if f.endswith(".parquet"))
    assert scores
    sig = [(f, os.stat(os.path.join(str(tmp_path / "scores_remote"), f))
            .st_mtime_ns) for f in scores]
    for p in [f for f in os.listdir(out) if f.endswith(".parquet")]:
        os.unlink(os.path.join(out, p))
    s2, _, _ = export_training_mixture(ds, out, keep_quantile=0.5,
                                       seed=7, score_dir=sd, resume=True)
    rows2 = sorted(sum((p.column("doc_id").to_pylist()
                        for p in verify_mixture_output(out)), []))
    assert rows2 == rows1
    assert [(f, os.stat(os.path.join(str(tmp_path / "scores_remote"), f))
             .st_mtime_ns) for f in scores] == sig, "checkpoint rewritten"
