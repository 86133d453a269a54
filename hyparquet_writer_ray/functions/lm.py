"""Bigram language-model quality scoring (the CCNet-style perplexity
filter): train token-bigram counts over a corpus, then score every
document's per-token cross-entropy under the model with add-alpha
smoothing — ``logP(w2|w1) = ln((c12 + a) / (c1 + a*V))``.

Scale shape:
- **Training** is ONE constant-bucket shuffle keyed on ``hash(w1)``:
  each batch pre-aggregates its (w1, w2) pair counts (dictionary
  encode + lexsort + reduceat — no Python per token) so the exchange
  moves distinct-pairs-per-batch rows, and because a bucket holds ALL
  continuations of its w1 tokens, both the bigram count c12 and the
  left-context total c1 come out of the same pass.
- **The model** is vocabulary-bounded, not corpus-bounded; prune with
  ``min_count`` when the long tail outgrows worker memory. Scoring
  broadcasts it once (``ray.put``) into an actor pool — each actor
  builds its lookup dict in ``__init__``, batches probe it only on
  dictionary-encoded DISTINCT bigrams, and per-doc sums are one
  ``np.bincount``. For a model too large to broadcast, compose two
  ``hash_join``s against the model table instead (same outputs).
- **Vocabulary size** (the smoothing constant V) is exact distinct
  tokens via per-batch ``pc.unique`` partials into a bucketed count.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.arrays import byte_array_values, single_chunk


def _doc_bigrams(batch: pa.Table, text_col: str):
    """(w1, w2, doc_row_index, flat_tokens) for all within-document
    adjacent token pairs of a batch; single-space tokenization (SQL
    string_split parity). ``flat_tokens`` is the full token stream so
    callers that also need unigrams (the fused trainer's vocabulary
    sentinels) don't tokenize the text a second time."""
    text = single_chunk(batch.column(text_col))
    toks = pc.split_pattern(pc.fill_null(text, ""), " ")
    nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = single_chunk(pc.list_flatten(toks))
    doc_idx = np.repeat(np.arange(len(nper), dtype=np.int64), nper)
    if len(doc_idx) < 2:
        empty = pa.array([], flat.type)
        return empty, empty, np.zeros(0, np.int64), flat
    mask = pa.array(doc_idx[1:] == doc_idx[:-1])
    w1 = flat.slice(0, len(flat) - 1).filter(mask)
    w2 = flat.slice(1).filter(mask)
    return w1, w2, doc_idx[:-1][np.asarray(mask)], flat


def _pair_counts(w1: pa.Array, w2: pa.Array):
    """Distinct (w1, w2) pairs + counts via lexsort (no Python loop)."""
    if len(w1) == 0:
        empty = pa.array([], w1.type)
        return empty, empty, np.zeros(0, np.int64)
    d1, d2 = pc.dictionary_encode(w1), pc.dictionary_encode(w2)
    c1 = d1.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    c2 = d2.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((c2, c1))
    s1, s2 = c1[order], c2[order]
    starts = np.nonzero(
        np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])])[0]
    n = np.diff(np.r_[starts, len(s1)])
    return (d1.dictionary.take(pa.array(s1[starts])),
            d2.dictionary.take(pa.array(s2[starts])),
            n.astype(np.int64))


def _resolve_pairs(group: pa.Table, min_count: int,
                   left_totals: bool = False) -> pa.Table:
    """Bucket finalizer shared by ``bigram_model`` / ``train_bigram_lm``:
    sum pre-aggregated (w1, w2, n) rows into (w1, w2, c12, c1).

    With ``left_totals=True`` also appends one UNPRUNED
    ``(w1, w2=null, c12=0, c1=total)`` row per distinct w1 so scorers
    keep the exact left-context denominator even when every pair of a
    w1 was pruned by ``min_count`` / a model-size cap (the side table
    is vocabulary-bounded, never corpus-bounded)."""
    w1a = single_chunk(group.column("w1"))
    if len(w1a) == 0:
        return pa.table({
            "w1": pa.array([], w1a.type),
            "w2": pa.array([], w1a.type),
            "c12": pa.array([], pa.int64()),
            "c1": pa.array([], pa.int64()),
        })
    d1 = pc.dictionary_encode(w1a)
    d2 = pc.dictionary_encode(single_chunk(group.column("w2")))
    c1 = d1.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    c2 = d2.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n = group.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((c2, c1))
    s1, s2, sn = c1[order], c2[order], n[order]
    pair_starts = np.nonzero(
        np.r_[True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])])[0]
    c12 = np.add.reduceat(sn, pair_starts)
    p1 = s1[pair_starts]
    w1_starts = np.nonzero(np.r_[True, p1[1:] != p1[:-1]])[0]
    totals = np.add.reduceat(c12, w1_starts)
    c1_of_pair = np.repeat(totals, np.diff(np.r_[w1_starts, len(p1)]))
    keep = c12 >= min_count
    out = pa.table({
        "w1": d1.dictionary.take(pa.array(p1[keep])),
        "w2": d2.dictionary.take(pa.array(s2[pair_starts][keep])),
        "c12": pa.array(c12[keep].astype(np.int64)),
        "c1": pa.array(c1_of_pair[keep].astype(np.int64)),
    })
    if not left_totals:
        return out
    lefts = pa.table({
        "w1": d1.dictionary.take(pa.array(p1[w1_starts])),
        "w2": pa.nulls(len(w1_starts), d2.dictionary.type),
        "c12": pa.array(np.zeros(len(w1_starts), np.int64)),
        "c1": pa.array(totals.astype(np.int64)),
    })
    return pa.concat_tables([out, lefts])


def bigram_model(ds, *, text_col: str = "text", num_buckets: int = 64,
                 min_count: int = 1, left_totals: bool = False):
    """Corpus bigram model: ``(w1, w2, c12:int64, c1:int64)`` rows,
    where c1 = total bigram occurrences with left context w1 (so the
    conditional is c12/c1). ``min_count`` prunes rare PAIRS from the
    output but after c1 is computed, so probabilities stay exact.

    ``left_totals=True`` additionally emits one
    ``(w1, w2=null, c12=0, c1=total)`` row per distinct w1 (unpruned):
    pass it whenever ``min_count > 1`` and the model will feed
    ``lm_score``, so unseen-bigram fallbacks use the true c1 even for
    a w1 whose every pair was pruned (``LMScorer`` reads the side rows
    natively; without them a fully-pruned w1 falls back to c1=0)."""
    from .dedup import _segmented_poly_hash
    from .sketches import _splitmix64

    NB = max(int(num_buckets), 1)

    def partial(batch: pa.Table) -> pa.Table:
        w1, w2, _, _ = _doc_bigrams(batch, text_col)
        u1, u2, n = _pair_counts(w1, w2)
        lens, data = byte_array_values(u1)
        bucket = (_splitmix64(_segmented_poly_hash(lens, data))
                  .astype(np.int64) % NB)
        return pa.table({"w1": u1, "w2": u2, "n": pa.array(n),
                         "__bucket": pa.array(bucket)})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("__bucket").map_groups(
        lambda g: _resolve_pairs(g, min_count, left_totals),
        batch_format="pyarrow")


def train_bigram_lm(ds, *, text_col: str = "text", num_buckets: int = 64,
                    min_count: int = 1,
                    max_model_rows: int | None = None) -> tuple[pa.Table, int]:
    """Fused training: the bigram model AND the exact vocabulary size
    from ONE corpus scan + one shuffle (``bigram_model`` then
    ``vocab_size`` separately would scan the text twice — at 100 TB a
    whole extra pass). Each batch's DISTINCT tokens ride the same
    bucket exchange as sentinel rows (``w2`` null, bucketed by token
    hash, a distinct-tokens-per-batch overhead on top of the pair
    rows); each bucket resolves its model rows plus one
    ``(w1=null, w2=null, c12=<distinct tokens in bucket>)`` summary
    row — disjoint across buckets because the bucket is a pure token
    hash. Returns ``(model_table, vocab)``.

    **Bounded-memory contract**: the broadcast model is O(distinct
    surviving bigrams). ``max_model_rows=K`` caps it at the K
    highest-count pairs (ties broken by (w1, w2) so the cap is
    deterministic); whenever pruning can drop pairs (``min_count > 1``
    or a binding cap) the model also carries the UNPRUNED
    vocabulary-bounded ``(w1, w2=null, c1)`` left-total side rows, so
    a pruned pair scores as an unseen bigram with its TRUE
    denominator: ``ln(a / (c1 + a*V))`` instead of
    ``ln((c12 + a) / (c1 + a*V))``. The per-bigram log-prob error is
    therefore at most ``ln((c_cut + a) / a)`` where ``c_cut`` is the
    largest pruned count (≤ the (K+1)-th largest c12), and it applies
    only to occurrences of pruned pairs; an unbinding cap changes no
    score by even 1 ulp (gated in tests/test_lm.py)."""
    from .dedup import _segmented_poly_hash
    from .sketches import _splitmix64

    NB = max(int(num_buckets), 1)

    def tok_bucket(arr: pa.Array) -> np.ndarray:
        lens, data = byte_array_values(arr)
        return (_splitmix64(_segmented_poly_hash(lens, data))
                .astype(np.int64) % NB)

    def partial(batch: pa.Table) -> pa.Table:
        w1, w2, _, flat = _doc_bigrams(batch, text_col)
        u1, u2, n = _pair_counts(w1, w2)
        toks = pc.unique(flat)  # tokenized once — reuse the stream
        return pa.table({
            "w1": pa.concat_arrays([u1.combine_chunks()
                                    if isinstance(u1, pa.ChunkedArray)
                                    else u1, toks]),
            "w2": pa.concat_arrays(
                [u2.combine_chunks() if isinstance(u2, pa.ChunkedArray)
                 else u2, pa.nulls(len(toks), toks.type)]),
            "n": pa.array(np.r_[n, np.zeros(len(toks), np.int64)]),
            "__bucket": pa.array(np.r_[tok_bucket(u1), tok_bucket(toks)]),
        })

    def resolve(group: pa.Table) -> pa.Table:
        w2 = single_chunk(group.column("w2"))
        is_tok = pc.is_null(w2)
        toks = single_chunk(group.column("w1")).filter(is_tok)
        n_vocab = len(pc.unique(toks))
        pairs = group.filter(pc.invert(is_tok))
        model = _resolve_pairs(pairs, min_count,
                               left_totals=(min_count > 1
                                            or max_model_rows is not None))
        summary = pa.table({
            "w1": pa.nulls(1, model.column("w1").type),
            "w2": pa.nulls(1, model.column("w2").type),
            "c12": pa.array([n_vocab], pa.int64()),
            "c1": pa.array([0], pa.int64()),
        })
        return pa.concat_tables([model, summary])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = parts.groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow")
    t = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    is_summary = pc.is_null(t.column("w1"))
    vocab = int(pc.sum(t.filter(is_summary).column("c12")).as_py() or 0)
    model = t.filter(pc.invert(is_summary)).combine_chunks()
    if max_model_rows is not None:
        is_left = pc.is_null(model.column("w2"))
        pairs_t = model.filter(pc.invert(is_left))
        if pairs_t.num_rows > int(max_model_rows):
            order = pc.sort_indices(pairs_t, sort_keys=[
                ("c12", "descending"), ("w1", "ascending"),
                ("w2", "ascending")])
            kept = pairs_t.take(order.slice(0, int(max_model_rows)))
            model = pa.concat_tables(
                [kept, model.filter(is_left)]).combine_chunks()
    return model, vocab


def vocab_size(ds, *, text_col: str = "text",
               num_buckets: int = 64) -> int:
    """Exact distinct token count (the smoothing constant V): per-batch
    ``pc.unique`` partials, bucketed distinct count, driver sums one
    int per bucket."""
    from .dedup import _segmented_poly_hash
    from .sketches import _splitmix64

    NB = max(int(num_buckets), 1)

    def partial(batch: pa.Table) -> pa.Table:
        text = single_chunk(batch.column(text_col))
        toks = pc.unique(single_chunk(
            pc.list_flatten(pc.split_pattern(pc.fill_null(text, ""), " "))))
        lens, data = byte_array_values(toks)
        bucket = (_splitmix64(_segmented_poly_hash(lens, data))
                  .astype(np.int64) % NB)
        return pa.table({"tok": toks, "__bucket": pa.array(bucket)})

    def resolve(group: pa.Table) -> pa.Table:
        n = len(pc.unique(single_chunk(group.column("tok"))))
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    counts = parts.groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow")
    return sum(
        sum(b.column("n").to_pylist())
        for b in counts.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    )


class LMScorer:
    """Actor stage: per-document cross-entropy under a broadcast bigram
    model. Lookup dicts built once per actor in ``__init__``; per batch
    only DISTINCT bigrams touch Python (separate dictionary encodes +
    one combined-code unique — no joined-string key, so tokens may
    contain any byte)."""

    def __init__(self, model_ref, vocab: int, alpha: float,
                 text_col: str, id_col: str) -> None:
        import ray
        model: pa.Table = ray.get(model_ref)
        # (w1, w2=null) rows are the unpruned left-total side table a
        # min_count>1 / max_model_rows trainer ships; split them out so
        # unseen-bigram fallbacks use the TRUE c1 even when every pair
        # of a w1 was pruned (ADVICE r3: surviving-row totals deviate
        # from the documented add-alpha formula otherwise).
        is_left = pc.is_null(model.column("w2"))
        if pc.any(is_left).as_py():
            lefts = model.filter(is_left)
            model = model.filter(pc.invert(is_left))
            self.left = dict(zip(
                lefts.column("w1").to_pylist(),
                lefts.column("c1").to_numpy(zero_copy_only=False).tolist()))
        else:
            self.left = {}
        c12 = model.column("c12").to_numpy(zero_copy_only=False)
        c1 = model.column("c1").to_numpy(zero_copy_only=False)
        w1l = model.column("w1").to_pylist()
        self.pair = dict(zip(zip(w1l, model.column("w2").to_pylist()),
                             zip(c12.tolist(), c1.tolist())))
        for w1, c in zip(w1l, c1.tolist()):
            self.left.setdefault(w1, c)
        self.vocab = int(vocab)
        self.alpha = float(alpha)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        w1, w2, doc_of, _ = _doc_bigrams(batch, self.text_col)
        ids = single_chunk(batch.column(self.id_col)).cast(pa.int64())
        a, V = self.alpha, self.vocab
        if len(doc_of) == 0:
            return pa.table({self.id_col: pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "xent": pa.array([], pa.float64())})
        d1, d2 = pc.dictionary_encode(w1), pc.dictionary_encode(w2)
        k1 = d1.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k2 = d2.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        combined = k1 * len(d2.dictionary) + k2
        uniq, codes = np.unique(combined, return_inverse=True)
        u1 = d1.dictionary.take(
            pa.array(uniq // len(d2.dictionary))).to_pylist()
        u2 = d2.dictionary.take(
            pa.array(uniq % len(d2.dictionary))).to_pylist()
        lp_u = np.empty(len(uniq), np.float64)
        for i, (a1, b2) in enumerate(zip(u1, u2)):
            hit = self.pair.get((a1, b2))
            if hit is not None:
                c12, c1 = hit
            else:
                c12 = 0
                c1 = self.left.get(a1, 0)
            # formula mirrored by the SQL oracle token-for-token
            lp_u[i] = np.log((c12 + a) / (c1 + a * V))
        lp = lp_u[codes]
        nb = np.bincount(doc_of, minlength=batch.num_rows)
        sums = np.bincount(doc_of, weights=lp, minlength=batch.num_rows)
        has = nb > 0
        return pa.table({
            self.id_col: ids.filter(pa.array(has)),
            "n_bigrams": pa.array(nb[has].astype(np.int64)),
            "xent": pa.array(-sums[has] / nb[has], pa.float64()),
        })


def lm_score(ds, model: pa.Table, vocab: int, *, alpha: float = 0.5,
             text_col: str = "text", id_col: str = "doc_id",
             concurrency=(1, 4)):
    """Score every document of ``ds`` under a trained bigram model.
    Returns ``(id, n_bigrams, xent)``; documents with no bigram
    (fewer than two tokens) are excluded, matching the SQL oracle."""
    import ray

    model_ref = ray.put(model.combine_chunks())
    return ds.map_batches(
        LMScorer,
        fn_constructor_kwargs=dict(model_ref=model_ref, vocab=vocab,
                                   alpha=alpha, text_col=text_col,
                                   id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )
