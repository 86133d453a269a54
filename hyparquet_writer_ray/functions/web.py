"""Webtext operators: HTML text extraction and URL parsing/stats.

Training-data pipelines over Common-Crawl-style tables (SURVEY.md §1.3
north-rule input: ``url``, ``html``, ``text`` columns) need exactly two
web-specific primitives the reference writer has no equivalent of:
turning raw ``html`` payloads into clean training text, and slicing
``url`` into scheme/host/path for per-domain curation decisions.

Both are shuffle-free per-batch Arrow RE2 kernels — the SAME regex
engine DuckDB's ``regexp_replace``/``regexp_extract`` use — so SQL
oracles are pattern-for-pattern exact (the ``functions.text.redact``
precedent). ``domain_stats`` adds the one wide step: a per-batch
(host, count, bytes) combiner BEFORE a host-cardinality-sized groupby,
so the shuffle moves O(distinct hosts × batches) rows, never O(rows) —
the ``top_tokens`` scale shape.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .text import single_chunk

# (pattern, replacement) chain applied IN ORDER by both the Arrow
# kernel and the SQL oracle. RE2 in both engines: (?is) = case-
# insensitive dotall, non-greedy .*? supported, no backrefs used.
HTML_STRIP_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),  # script blocks incl. body
    (r"(?is)<style[^>]*>.*?</style>", " "),    # style blocks incl. body
    (r"(?s)<!--.*?-->", " "),                  # comments
    (r"(?s)<[^>]*>", " "),                     # any remaining tag
)

# Fixed-string entity decodes, applied after tag stripping. &amp; is
# LAST on purpose: "&amp;lt;" must decode to the literal "&lt;", not
# "<" (the standard single-pass entity rule).
HTML_ENTITY_RULES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_to_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "extracted_text") -> pa.Table:
    """Strip one batch's HTML column to clean text: drop script/style
    blocks (with bodies), comments and tags, decode the common
    entities, collapse runs of whitespace and trim. Null passthrough;
    binary input is reinterpreted as utf-8; no per-row Python."""
    col = single_chunk(batch.column(html_col))
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        try:
            col = col.cast(pa.string())
        except pa.lib.ArrowInvalid:
            # real crawl payloads carry mis-declared charsets: decode
            # with U+FFFD replacement (Python loop ONLY on a batch that
            # actually contains invalid utf-8 — the cast fast path
            # covers the rest)
            col = pa.array(
                (None if v is None else v.decode("utf-8", "replace")
                 for v in col.to_pylist()),
                pa.string())
    for pattern, replacement in HTML_STRIP_RULES:
        col = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=replacement)
    for literal, replacement in HTML_ENTITY_RULES:
        col = pc.replace_substring(col, pattern=literal,
                                   replacement=replacement)
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    col = pc.utf8_trim_whitespace(col)
    out = batch
    if out_col in out.column_names:
        out = out.drop_columns([out_col])
    return out.append_column(out_col, col)


def html_to_text(ds, *, html_col: str = "html",
                 out_col: str = "extracted_text"):
    """Dataset-level HTML→text extraction (see html_to_text_batch).
    Shuffle-free, streaming, resume-safe."""
    return ds.map_batches(
        lambda b: html_to_text_batch(b, html_col, out_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# One RE2 pass captures scheme/host/path/query; query group optional.
# Anchored so partial garbage cannot match mid-string.
_URL_PATTERN = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
                r"(?P<path>[^?#]*)(?:\?(?P<query>.*))?$")


def parse_url_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Split ``url_col`` into ``scheme``/``host``/``path``/``query``
    columns with ONE RE2 extract per batch. Non-matching or null urls
    yield null components (extract_regex's null-on-no-match); a url
    without '?' yields query="" — SQL parity via
    coalesce(regexp_extract(...), '')."""
    col = single_chunk(batch.column(url_col))
    parts = pc.extract_regex(col, pattern=_URL_PATTERN)
    out = batch
    for name in ("scheme", "host", "path", "query"):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, pc.struct_field(parts, name))
    return out


def parse_urls(ds, *, url_col: str = "url"):
    """Dataset-level URL parsing (see parse_url_batch)."""
    return ds.map_batches(
        lambda b: parse_url_batch(b, url_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _canonical_host(host):
    """RFC-3986 host canonicalization for blocklist matching: strip
    userinfo (``user@``) and ``:port``, lowercase. A filter that
    matches the raw authority verbatim is trivially bypassed by
    ``https://Bad.org:8080/`` — compliance filters must not be."""
    host = pc.replace_substring_regex(host, pattern=r"^[^@]*@",
                                      replacement="")
    host = pc.replace_substring_regex(host, pattern=r":[0-9]*$",
                                      replacement="")
    return pc.utf8_lower(host)


class DomainFilter:
    """Stateful stage: drop rows whose url host is on a blocklist (the
    crawl-curation domain filter). The blocklist rides in the actor
    constructor args — serialized ONCE per actor at creation,
    restart-safe (no loose ObjectRef). Each batch does one RE2 host
    extract + canonicalization + one ``is_in`` membership kernel.
    Hosts are matched canonically (lowercased, userinfo/port
    stripped). Unparseable or null urls are KEPT (no host to match)
    unless ``strict``."""

    def __init__(self, blocked: pa.Array, url_col: str,
                 strict: bool) -> None:
        self.blocked = blocked
        self.url_col = url_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch
        host = single_chunk(
            parse_url_batch(batch.select([self.url_col]), self.url_col)
            .column("host"))
        blocked = pc.fill_null(
            pc.is_in(_canonical_host(host), value_set=self.blocked),
            False)
        if self.strict:
            blocked = pc.or_(blocked, pc.is_null(host))
        return batch.filter(pc.invert(blocked))


def filter_domains(ds, blocked_hosts, *, url_col: str = "url",
                   strict: bool = False, concurrency=(1, 4)):
    """Drop rows whose url host appears in ``blocked_hosts`` (matched
    canonically: case-insensitive, userinfo/port ignored).
    Shuffle-free, streaming, resume-safe; the blocklist ships once per
    actor in the constructor args, never per batch. ``strict`` also
    drops rows whose url cannot be parsed."""
    blocked = _canonical_host(
        pa.array(sorted(set(blocked_hosts)), pa.string()))
    return ds.map_batches(
        DomainFilter,
        fn_constructor_kwargs=dict(blocked=blocked, url_col=url_col,
                                   strict=strict),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )


def domain_stats(ds, *, url_col: str = "url", bytes_col: str | None = None):
    """Per-host corpus stats: ``n_docs`` (and ``n_bytes`` when
    ``bytes_col`` is given) per registered host, host ascending.

    Scale shape: each batch parses its urls and collapses to
    (host, n_docs, n_bytes) partials via dictionary_encode + bincount
    BEFORE the shuffle — the groupby moves O(hosts) rows per batch,
    never O(rows). Null/unparseable urls count under host=None."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        parsed = parse_url_batch(batch, url_col)
        host = single_chunk(parsed.column("host"))
        denc = pc.dictionary_encode(host)
        idx = denc.indices.to_numpy(zero_copy_only=False)
        valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(
            len(idx), bool)
        codes = np.where(valid, idx, -1).astype(np.int64)
        nd = len(denc.dictionary)
        counts = np.bincount(codes[valid], minlength=nd)
        hosts = denc.dictionary
        n_docs = counts.astype(np.int64)
        cols = {"host": hosts, "n_docs": pa.array(n_docs)}
        if bytes_col is not None:
            w = pc.fill_null(batch.column(bytes_col), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # int64 accumulator (np.bincount weights go through float64,
            # which silently rounds past 2^53)
            byte_sums = np.zeros(nd, np.int64)
            np.add.at(byte_sums, codes[valid], w[valid])
            cols["n_bytes"] = pa.array(byte_sums)
        t = pa.table(cols)
        n_null = int((~valid).sum())
        if n_null:
            null_row = {"host": pa.array([None], type=hosts.type),
                        "n_docs": pa.array([n_null], type=pa.int64())}
            if bytes_col is not None:
                null_row["n_bytes"] = pa.array(
                    [int(w[~valid].sum())], type=pa.int64())
            t = pa.concat_tables([t, pa.table(null_row)])
        return t

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partials.groupby("host").sum(
        ["n_docs"] + (["n_bytes"] if bytes_col is not None else []))
    names = {"sum(n_docs)": "n_docs", "sum(n_bytes)": "n_bytes"}

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns([names.get(c, c) for c in b.column_names])

    return agg.sort("host").map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True)
