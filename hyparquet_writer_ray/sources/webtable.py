"""Deterministic Common-Crawl-style web-page table synthesis
(BASELINE.json input_hint; FIXTURES.md F0).

Schema: url:string, warc_ts:timestamp[ms], html:binary (~1% null,
heavy-tailed sizes for skew tests), text:string (~2% null, repeated
word pool so dict/FSST gains are measurable), lang:string (12 codes,
zipf-ish). Deterministic in the row index (seed folded into a
splitmix-style hash) — same rows at any scale, any partitioning.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_MS = 1_577_836_800_000  # 2020-01-01
LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl", "pl", "tr"]
_WORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "data", "web", "page", "crawl", "content", "search", "index", "link",
    "site", "archive", "record", "stream", "parquet", "column", "encode",
]


def _mix(idx: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style deterministic hash of row indices (vectorized)."""
    mult = np.uint64((0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF)
    z = idx.astype(np.uint64) + mult
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def synthesize_batch(start: int, count: int, *, skew_every: int = 5000) -> pa.Table:
    """Rows [start, start+count) of the deterministic web table."""
    idx = np.arange(start, start + count, dtype=np.int64)
    h0 = _mix(idx, 0)
    h1 = _mix(idx, 1)
    h2 = _mix(idx, 2)

    host = (idx % 1000).astype(np.int64)
    urls = [f"https://host{h}.example.org/path/{i:010d}" for h, i in zip(host, idx)]

    warc_ts = EPOCH_MS + idx * 1000 + (h0 % 750).astype(np.int64)

    # zipf-ish lang pick: low ranks much more likely
    lang_rank = (np.log2((h1 % 4096) + 1).astype(np.int64)) % len(LANGS)
    langs = [LANGS[r] for r in lang_rank]

    # text: repeated word pool + a row-specific token
    n_words = 20 + (h2 % 60).astype(np.int64)
    text_null = (h2 % 100) < 2  # ~2% null
    texts: list[str | None] = []
    wp = _WORDS
    nw = len(wp)
    for i in range(count):
        if text_null[i]:
            texts.append(None)
            continue
        k = int(n_words[i])
        seed = int(h0[i])
        words = [wp[(seed + 7 * j) % nw] for j in range(k)]
        words.append(f"tok_{seed & 0xFFFF:04x}")
        texts.append(" ".join(words))

    # html wraps text; heavy-tailed size; ~1% null; skew rows ~100 KiB
    html_null = (h1 % 100) < 1
    pad_len = 100 + (h0 % 2000).astype(np.int64)
    htmls: list[bytes | None] = []
    for i in range(count):
        if html_null[i]:
            htmls.append(None)
            continue
        body = texts[i] or ""
        pad = int(pad_len[i])
        if skew_every and (start + i) % skew_every == 0:
            pad = 100_000 + int(h2[i] % 50_000)  # heavy-tail skew rows
        filler = (b"<div class=x>" * (pad // 13 + 1))[:pad]
        htmls.append(b"<html><body>" + filler + body.encode() + b"</body></html>")

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(warc_ts, type=pa.timestamp("ms")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def synthesize_table(num_rows: int, **kw) -> pa.Table:
    return synthesize_batch(0, num_rows, **kw)


def webtable_dataset(num_rows: int, *, rows_per_block: int = 20_000):
    """Distributed deterministic synthesis as a ray.data.Dataset: range ->
    map_batches(generate), so each block is produced on a worker."""
    import ray.data

    n_blocks = max(1, (num_rows + rows_per_block - 1) // rows_per_block)
    starts = [
        {"start": b * rows_per_block,
         "count": min(rows_per_block, num_rows - b * rows_per_block)}
        for b in range(n_blocks)
    ]

    def gen(batch) -> pa.Table:
        out = [synthesize_batch(int(s), int(c)) for s, c in zip(batch["start"], batch["count"])]
        return pa.concat_tables(out)

    ds = ray.data.from_items(starts, override_num_blocks=n_blocks)
    return ds.map_batches(gen, batch_size=1, batch_format="pandas", zero_copy_batch=True)
