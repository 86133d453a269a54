"""Pretraining mixture export: the end-to-end composition of the
engine's quality/mixing/packing/encode stages —

    bigram LM score  ->  keep the best-quality quantile
    ->  big-x-big hash join back to the corpus rows
    ->  deterministic seeded shuffle (epoch order)
    ->  token-budgeted sequence packing
    ->  CRC-checksummed parquet part output with lineage

Every stage is individually oracle-gated elsewhere (text_lm_score,
join_shuffle_hash, shuffle_export, pack_sequences, roundtrip gates);
this pipeline proves they COMPOSE: one streaming pass over the corpus
with exactly two shuffles (the LM bucket pass and the join bucket pass
— the shuffle sort is the deliberate epoch-order exchange), a
vocabulary-bounded broadcast, and no driver byte path for the corpus
rows.
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def export_training_mixture(
    ds,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_quantile: float = 0.75,
    pack_budget: int = 512,
    seed: int = 0,
):
    """Run the full mixture-export composition over a documents
    dataset. Returns ``(survivors, packs, write_stats)``:
    the surviving (id, n_bigrams, xent) table, the pack manifest
    table, and the part-writer stats dict. ``out_dir`` receives
    CRC-checksummed parquet parts of the shuffled surviving rows plus
    the lineage manifest.
    """
    import ray.data

    from ..core.options import WriteOptions
    from ..functions.joins import hash_join
    from ..functions.lm import lm_score, train_bigram_lm
    from ..functions.packing import pack_sequences
    from ..functions.shuffle import deterministic_shuffle
    from ..functions.stats import exact_quantiles
    from .write import write_parquet_dataset

    def collect(d):
        return pa.concat_tables(
            b for b in d.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))

    # 1. quality model + exact vocab, fused into ONE corpus scan
    model, V = train_bigram_lm(ds, text_col=text_col)
    scored = lm_score(ds, model, V, text_col=text_col, id_col=id_col)
    scored_t = collect(scored)

    # 2. keep the best `keep_quantile` of documents by cross-entropy
    # (exact distributed quantile; quantile_disc rank rule)
    th = exact_quantiles(
        ray.data.from_arrow(scored_t), "xent", qs=(keep_quantile,)
    ).column("value").to_pylist()[0]
    survivors = scored_t.filter(
        pc.less_equal(scored_t.column("xent"), pa.scalar(th)))

    # 3. join scores back onto the corpus rows (big-x-big: at cluster
    # scale the score table is corpus-sized — no broadcast)
    joined = hash_join(
        ds, ray.data.from_arrow(survivors), on=id_col,
        right_cols=["n_bigrams", "xent"], how="inner")

    # 4. reproducible epoch order, then CRC-checksummed part output
    shuffled = deterministic_shuffle(joined, id_col=id_col, seed=seed)
    stats = write_parquet_dataset(
        shuffled, out_dir, WriteOptions(page_crc=True),
        concurrency=(1, 4))

    # 5. token-budgeted packing manifest over the survivors
    packs = collect(pack_sequences(
        ray.data.from_arrow(survivors), id_col=id_col,
        tokens_col="n_bigrams", budget=pack_budget))
    return survivors, packs, stats


def verify_mixture_output(out_dir: str) -> list[pa.Table]:
    """Re-read every part with page-CRC verification enabled and
    return one table per part (raises on any corrupted page). Parts
    are content-hash-named, so global epoch order is reconstructed by
    range: rows are sorted within each part and part key-ranges are
    disjoint (the caller asserts both)."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".parquet"))
    return [pq.ParquetFile(f, page_checksum_verification=True).read()
            for f in files]
