"""Column-chunk encoding: codec decision, dictionary page, page loop,
statistics, page indexes — the pure-function core of the engine
(reference: src/column.js:22-199, src/datapage.js:17-101).

``encode_chunk`` returns a relocatable blob whose internal offsets are
all relative to the blob start; the assembler rebases them
(SURVEY.md §7.0 invariant 1). Flat and nested columns share one "slot"
model: ``values`` are the non-null leaf values, ``def/rep`` level
arrays cover every Dremel slot, and pages are slot ranges aligned to
row starts.
"""
from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import arrays as A
from .bufwriter import BufWriter
from .compress import compress
from .delta import delta_binary_pack, delta_byte_array, delta_length_byte_array
from .nested import LeveledValues
from .options import ColumnSpec, WriteOptions
from .pages import write_data_page_v2_header, write_dictionary_page_header
from .plain import plain_boolean, plain_byte_array, plain_fixed, plain_flba
from .rle import bit_width_of, encode_rle_hybrid
from .splitstream import byte_stream_split
from .statistics import Stats, compute_statistics
from .types import Codec, Encoding, FIXED_WIDTH, LeafInfo, ParquetType

DICT_SAMPLE = 1000  # sample size for the dictionary decision (src/dictionary.js:80)
DICT_MAX_RATIO = 0.5


@dataclass
class PageLocation:
    rel_offset: int  # page start relative to chunk blob start
    compressed_page_size: int  # header + levels + body
    first_row_index: int


@dataclass
class ColumnIndexData:
    null_pages: list = field(default_factory=list)
    min_values: list = field(default_factory=list)  # bytes (b'' for all-null pages)
    max_values: list = field(default_factory=list)
    null_counts: list = field(default_factory=list)
    boundary_order: int = 0


@dataclass
class ChunkMeta:
    path: list[str]
    ptype: int
    encodings: list[int]
    codec: int
    num_values: int  # total slots (levels count)
    total_compressed_size: int
    total_uncompressed_size: int
    data_page_offset: int  # relative to chunk start
    dictionary_page_offset: Optional[int]
    stats: Optional[Stats]
    encoding_stats: Optional[list[tuple[int, int, int]]]
    column_index: Optional[ColumnIndexData]
    offset_index: Optional[list[PageLocation]]
    bloom: Optional[bytes]
    kv_metadata: Optional[list] = None  # per-chunk key/value (e.g. hpw_fsst)
    geo_stats: Optional[object] = None  # GeoStats for GEOMETRY columns


def _prepare(col, leaf: LeafInfo) -> LeveledValues:
    """Normalize input (flat arrow column or LeveledValues) to the slot model."""
    if isinstance(col, LeveledValues):
        return col
    arr = A.single_chunk(col)
    max_def = leaf.max_definition_level
    n = len(arr)
    if max_def == 0:
        if arr.null_count:
            raise ValueError(f"null value in REQUIRED column {'.'.join(leaf.path)}")
        return LeveledValues(arr, None, None, 0, 0, n, 0)
    mask = A.validity_mask(arr)
    if mask is None:
        def_levels = np.full(n, max_def, dtype=np.uint8)
        values = arr
        nulls = 0
    else:
        def_levels = mask.astype(np.uint8) * max_def
        values = A.drop_null_fast(arr)
        nulls = arr.null_count
    return LeveledValues(values, def_levels, None, max_def, 0, n, nulls)


def _encode_values(page: BufWriter, arr: pa.Array, leaf: LeafInfo, encoding: Encoding) -> None:
    """Encode non-null values into ``page``."""
    el = leaf.element
    t = el.type
    if encoding == Encoding.PLAIN:
        if t == ParquetType.BOOLEAN:
            page.write(plain_boolean(A.fixed_values(arr)))
        elif t == ParquetType.BYTE_ARRAY:
            lengths, data = A.byte_array_values(arr)
            page.write(plain_byte_array(lengths, data))
        elif t == ParquetType.FIXED_LEN_BYTE_ARRAY:
            page.write(plain_flba(A.flba_values(arr, el.type_length)))
        else:
            page.write(plain_fixed(A.fixed_values(arr), t))
    elif encoding == Encoding.RLE:
        if t != ParquetType.BOOLEAN:
            raise ValueError("RLE encoding only supported for BOOLEAN type")
        body = BufWriter()
        encode_rle_hybrid(body, A.fixed_values(arr).astype(np.uint8), 1)
        page.u32(body.offset)  # u32 byte-length prefix (src/datapage.js:45)
        page.write(body.getvalue())
    elif encoding == Encoding.DELTA_BINARY_PACKED:
        if t not in (ParquetType.INT32, ParquetType.INT64):
            raise ValueError("DELTA_BINARY_PACKED only supports INT32/INT64")
        delta_binary_pack(page, A.fixed_values(arr))
    elif encoding == Encoding.DELTA_LENGTH_BYTE_ARRAY:
        if t != ParquetType.BYTE_ARRAY:
            raise ValueError("DELTA_LENGTH_BYTE_ARRAY only supports BYTE_ARRAY")
        lengths, data = A.byte_array_values(arr)
        delta_length_byte_array(page, lengths, data)
    elif encoding == Encoding.DELTA_BYTE_ARRAY:
        if t != ParquetType.BYTE_ARRAY:
            raise ValueError("DELTA_BYTE_ARRAY only supports BYTE_ARRAY")
        lengths, data = A.byte_array_values(arr)
        delta_byte_array(page, lengths, data)
    elif encoding == Encoding.BYTE_STREAM_SPLIT:
        if t == ParquetType.FIXED_LEN_BYTE_ARRAY:
            page.write(byte_stream_split(A.flba_values(arr, el.type_length)))
        elif t in FIXED_WIDTH:
            v = np.ascontiguousarray(A.fixed_values(arr))
            width = FIXED_WIDTH[t]
            if v.dtype.itemsize != width:
                # narrow arrow ints (int8/16, uint8/16/32) split at the
                # parquet PHYSICAL width, not their arrow width
                v = v.astype(
                    f"<i{width}" if v.dtype.kind == "i" else f"<u{width}")
            page.write(byte_stream_split(v))
        else:
            raise ValueError("BYTE_STREAM_SPLIT unsupported for this type")
    else:
        raise ValueError(f"unsupported encoding {encoding}")


def _value_sizes(values: pa.Array, leaf: LeafInfo):
    t = leaf.element.type
    if t == ParquetType.BOOLEAN:
        return 0.125
    if t == ParquetType.FIXED_LEN_BYTE_ARRAY:
        return float(leaf.element.type_length)
    if t == ParquetType.BYTE_ARRAY:
        lengths, _ = A.byte_array_values(values)
        return lengths.astype(np.float64)
    return float(FIXED_WIDTH[t])


def _page_bounds(lv: LeveledValues, leaf: LeafInfo, page_size: int,
                 value_size: "float | None" = None) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Slot-range pages aligned to row starts.

    Returns (bounds, vcum) where ``vcum[s]`` = number of values before
    slot ``s`` (exclusive prefix count of value-bearing slots).
    """
    n_slots = lv.num_rows if lv.def_levels is None else len(lv.def_levels)
    if lv.def_levels is None:
        vcum = np.arange(n_slots + 1, dtype=np.int64)
        has_val = None
    else:
        has_val = lv.def_levels == lv.max_def
        vcum = np.concatenate([[0], np.cumsum(has_val, dtype=np.int64)])

    if not page_size or n_slots == 0:
        return [(0, n_slots)], vcum

    sizes = value_size if value_size is not None else \
        _value_sizes(lv.values, leaf)
    if isinstance(sizes, float):
        slot_sizes = None
        per_page = max(1, int(page_size / max(sizes, 1e-9)))
    else:
        # scatter per-value sizes onto their slots
        slot_sizes = np.zeros(n_slots, dtype=np.float64)
        if has_val is None:
            slot_sizes[:] = sizes
        else:
            slot_sizes[has_val] = sizes
    if lv.rep_levels is not None:
        row_starts = np.nonzero(lv.rep_levels == 0)[0]
    else:
        row_starts = None  # every slot is a row start

    bounds = []
    if slot_sizes is None and row_starts is None:
        # fixed width, flat: uniform split
        step = per_page
        for s in range(0, n_slots, step):
            bounds.append((s, min(s + step, n_slots)))
        return bounds, vcum

    cum = np.cumsum(slot_sizes) if slot_sizes is not None else None
    start = 0
    base = 0.0
    while start < n_slots:
        if cum is None:
            cut = start + per_page - 1
        else:
            cut = int(np.searchsorted(cum, base + page_size))
        end = min(cut + 1, n_slots)
        if row_starts is not None:
            # round end down to a row start > start (pages begin at rows)
            j = int(np.searchsorted(row_starts, end))
            if j < len(row_starts):
                cand = int(row_starts[j - 1]) if j > 0 else 0
                end = cand if cand > start else int(row_starts[j])
            else:
                end = n_slots
        end = max(end, start + 1)
        end = min(end, n_slots)
        bounds.append((start, end))
        if cum is not None:
            base = float(cum[end - 1])
        start = end
    return bounds, vcum


def _try_dictionary(values: pa.Array, leaf: LeafInfo, spec: ColumnSpec, opts: WriteOptions):
    """Reference dictionary decision (src/dictionary.js:72-135)."""
    el = leaf.element
    forced = spec.encoding == Encoding.RLE_DICTIONARY
    if spec.encoding is not None and not forced:
        return None
    if el.type == ParquetType.BOOLEAN:
        if forced:
            raise TypeError(
                "ColumnSpec(encoding=RLE_DICTIONARY) is unsupported for "
                "BOOLEAN columns"
            )
        return None
    if not forced:
        # sample-based auto decision; an explicit request bypasses it
        sample = values.slice(0, DICT_SAMPLE)
        n_sample = len(sample)
        if n_sample == 0:
            return None
        distinct = pc.count_distinct(sample).as_py()
        if distinct == 0 or distinct / n_sample > DICT_MAX_RATIO:
            return None
    try:
        dict_arr = pc.dictionary_encode(values)
    except pa.ArrowNotImplementedError:
        if forced:
            raise TypeError(
                f"ColumnSpec(encoding=RLE_DICTIONARY) requested but type "
                f"{values.type} cannot be dictionary-encoded"
            )
        return None
    dictionary = dict_arr.dictionary
    if el.type == ParquetType.BYTE_ARRAY:
        dict_bytes = dictionary.nbytes
    elif el.type == ParquetType.FIXED_LEN_BYTE_ARRAY:
        dict_bytes = len(dictionary) * (el.type_length or 0)
    else:
        dict_bytes = len(dictionary) * FIXED_WIDTH.get(el.type, 8)
    if not forced and opts.page_size and dict_bytes > opts.page_size:
        return None
    if opts.dict_sort_frequency and len(dictionary):
        dict_arr = _sort_dict_by_frequency(dict_arr)
    return dict_arr


def _sort_dict_by_frequency(dict_arr: pa.DictionaryArray) -> pa.DictionaryArray:
    """Reorder dictionary entries by descending frequency (ties by
    original order) and remap indices — hot values get small indices,
    which pack into fewer bits per RLE run (reference TODO,
    src/dictionary.js:133)."""
    import numpy as np

    idx = dict_arr.indices
    ivals = idx.to_numpy(zero_copy_only=False)
    valid = ~np.isnan(ivals) if ivals.dtype.kind == "f" else np.ones(len(ivals), bool)
    ii = ivals[valid].astype(np.int64)
    counts = np.bincount(ii, minlength=len(dict_arr.dictionary))
    order = np.argsort(-counts, kind="stable")
    remap = np.empty(len(order), np.int64)
    remap[order] = np.arange(len(order))
    new_vals = np.zeros(len(ivals), np.int64)
    new_vals[valid] = remap[ii]
    new_idx = pa.array(new_vals, mask=~valid)
    return pa.DictionaryArray.from_arrays(
        new_idx, dict_arr.dictionary.take(pa.array(order))
    )


_DELTA_TYPES = (ParquetType.INT32, ParquetType.INT64)


def _smart_encoding(values: pa.Array, leaf: LeafInfo) -> Encoding:
    """Extended auto-selection ('smart' mode): delta for integer columns with
    small deltas (sorted-ish ids/timestamps), delta-length for text,
    byte-stream-split for floats. Samples the first 1000 values —
    deterministic per chunk."""
    el = leaf.element
    if el.type in _DELTA_TYPES:
        sample = values.slice(0, DICT_SAMPLE)
        if len(sample) >= 8:
            v = A.fixed_values(sample).astype(np.int64)
            deltas = np.abs(np.diff(v.astype(np.uint64)).view(np.int64))
            maxd = int(np.max(deltas)) if len(deltas) else 0
            width = FIXED_WIDTH[el.type] * 8
            if int(maxd).bit_length() + 8 < width:
                return Encoding.DELTA_BINARY_PACKED
        return Encoding.PLAIN
    if el.type == ParquetType.BYTE_ARRAY:
        return Encoding.DELTA_LENGTH_BYTE_ARRAY
    if el.type in (ParquetType.FLOAT, ParquetType.DOUBLE):
        return Encoding.BYTE_STREAM_SPLIT
    return Encoding.PLAIN


def encode_chunk(
    col,
    leaf: LeafInfo,
    spec: ColumnSpec,
    opts: WriteOptions,
) -> tuple[bytes, ChunkMeta]:
    """Encode one column chunk (one row group x one leaf column)."""
    lv = _prepare(col, leaf)
    el = leaf.element
    values = lv.values
    n_slots = len(lv.def_levels) if lv.def_levels is not None else lv.num_rows
    codec = spec.codec if spec.codec is not None else opts.codec

    w = BufWriter()
    encodings: list[int] = []
    enc_stats: list[tuple[int, int, int]] = []

    stats = (
        compute_statistics(values, el, null_count=lv.null_count)
        if opts.statistics else None
    )
    geo_stats = None
    if spec.geospatial and opts.statistics:
        from .geo import geospatial_statistics
        if el.type != ParquetType.BYTE_ARRAY:
            raise ValueError("geospatial stats require a BYTE_ARRAY (WKB) column")
        geo_stats = geospatial_statistics(values.to_pylist())
        if stats is not None:
            # parquet spec: geometry columns carry no byte min/max
            stats = Stats(None, None, lv.null_count, None, None)

    # FSST (opt-in, north-rule extension): train one symbol table per
    # chunk on a head sample of the value bytes; pages carry the table
    # inline and the chunk codec is recorded UNCOMPRESSED + marked via
    # key_value_metadata (not standard-parquet-readable; see core/fsst.py)
    fsst_table = None
    if spec.fsst:
        if el.type != ParquetType.BYTE_ARRAY:
            raise ValueError("fsst only supported for BYTE_ARRAY columns")
        if lv.max_rep or lv.max_def > 1:
            raise ValueError(
                "fsst is only supported on top-level (flat) BYTE_ARRAY "
                "columns: the hpw_fsst reader decodes flat pages only")
        from . import fsst as F
        _, data_head = A.byte_array_values(values.slice(0, min(len(values), 2000)))
        fsst_table = F.train(data_head.tobytes())
        codec = Codec.UNCOMPRESSED
    bloom = None
    if spec.bloom_filter:
        from .bloom import build_bloom
        bloom_opts = spec.bloom_filter if isinstance(spec.bloom_filter, dict) else {}
        bloom = build_bloom(values, el, **bloom_opts)

    # --- encoding decision -------------------------------------------------
    dict_arr = _try_dictionary(values, leaf, spec, opts)
    dictionary_page_offset: Optional[int] = None
    dict_uncomp = 0
    idx_np_all = None
    bit_width = 0
    if dict_arr is not None:
        encoding = Encoding.RLE_DICTIONARY
        dictionary_page_offset = w.offset
        dict_body = BufWriter()
        _encode_values(dict_body, dict_arr.dictionary, leaf, Encoding.PLAIN)
        raw = dict_body.getvalue()
        comp = compress(raw, codec, opts.compressors, opts.codec_level)
        write_dictionary_page_header(
            w, uncompressed_page_size=len(raw), compressed_page_size=len(comp),
            num_values=len(dict_arr.dictionary),
            crc=zlib.crc32(comp) if opts.page_crc else None,
        )
        w.write(comp)
        dict_uncomp = (w.offset - dictionary_page_offset) - len(comp) + len(raw)
        enc_stats.append((2, int(Encoding.PLAIN), 1))
        bit_width = bit_width_of(max(len(dict_arr.dictionary) - 1, 0))
        idx_np_all = A.fixed_values(dict_arr.indices).astype(np.uint32)
    else:
        if spec.encoding is not None:
            encoding = spec.encoding
        elif opts.auto_codec == "smart":
            encoding = _smart_encoding(values, leaf)
            if el.type == ParquetType.BOOLEAN and n_slots > 16:
                encoding = Encoding.RLE
        else:
            encoding = (
                Encoding.RLE
                if el.type == ParquetType.BOOLEAN and n_slots > 16
                else Encoding.PLAIN
            )
    encodings.append(int(encoding))

    # --- page loop ---------------------------------------------------------
    # dictionary chunks write RLE index runs, not raw values: size pages
    # from the index width or a repetitive 1 GB byte-array column would
    # split into thousands of near-empty pages (each paying a header,
    # statistics, and column/offset-index entries)
    dict_value_size = max(bit_width, 1) / 8.0 if idx_np_all is not None else None
    bounds, vcum = _page_bounds(lv, leaf, opts.page_size,
                                value_size=dict_value_size)
    data_page_offset = w.offset
    col_index = ColumnIndexData() if spec.column_index and len(bounds) > 1 else None
    off_index = [] if spec.offset_index and len(bounds) > 1 else None
    ascending = descending = True
    prev_min = prev_max = None
    uncomp_acc = dict_uncomp
    def_bw = bit_width_of(lv.max_def)
    rep_bw = bit_width_of(lv.max_rep)
    # row index per slot start (for offset index first_row_index)
    if lv.rep_levels is not None:
        row_cum = np.concatenate([[0], np.cumsum(lv.rep_levels == 0, dtype=np.int64)])

    for (s0, s1) in bounds:
        page_start = w.offset
        nslots = s1 - s0
        v0, v1 = int(vcum[s0]), int(vcum[s1])

        lvl = BufWriter()
        rep_len = 0
        if lv.rep_levels is not None:
            rep_len = encode_rle_hybrid(lvl, lv.rep_levels[s0:s1], rep_bw)
        def_len = 0
        num_nulls = 0
        if lv.def_levels is not None:
            dslice = lv.def_levels[s0:s1]
            num_nulls = int(nslots - (v1 - v0))
            def_len = encode_rle_hybrid(lvl, dslice, def_bw)
        if lv.rep_levels is not None:
            num_rows = int(row_cum[s1] - row_cum[s0])
        else:
            num_rows = nslots

        body = BufWriter()
        if idx_np_all is not None:
            body.u8(bit_width)
            encode_rle_hybrid(body, idx_np_all[v0:v1], bit_width)
        else:
            _encode_values(body, values.slice(v0, v1 - v0), leaf, encoding)

        raw = body.getvalue()
        if fsst_table is not None:
            from . import fsst as F
            comp = fsst_table.serialize() + F.compress(raw, fsst_table)
        else:
            comp = compress(raw, codec, opts.compressors, opts.codec_level)
        lvl_bytes = lvl.getvalue()
        crc = None
        if opts.page_crc:
            # spec: V2 page CRC covers the page as written after the
            # header — uncompressed level runs then compressed values
            crc = zlib.crc32(comp, zlib.crc32(lvl_bytes))
        write_data_page_v2_header(
            w,
            uncompressed_page_size=lvl.offset + len(raw),
            compressed_page_size=lvl.offset + len(comp),
            num_values=nslots,
            num_nulls=num_nulls,
            num_rows=num_rows,
            encoding=encoding,
            definition_levels_byte_length=def_len,
            repetition_levels_byte_length=rep_len,
            is_compressed=codec != Codec.UNCOMPRESSED or fsst_table is not None,
            crc=crc,
        )
        w.write(lvl_bytes)
        w.write(comp)
        uncomp_acc += (w.offset - page_start) - len(comp) + len(raw)

        if col_index is not None:
            pstats = compute_statistics(
                values.slice(v0, v1 - v0), el, null_count=num_nulls
            )
            all_null = pstats.min_bytes is None
            col_index.null_pages.append(all_null)
            col_index.min_values.append(pstats.min_bytes or b"")
            col_index.max_values.append(pstats.max_bytes or b"")
            col_index.null_counts.append(pstats.null_count)
            if not all_null:
                if prev_min is not None:
                    if pstats.min_raw < prev_min:
                        ascending = False
                    if pstats.min_raw > prev_min:
                        descending = False
                if prev_max is not None:
                    if pstats.max_raw < prev_max:
                        ascending = False
                    if pstats.max_raw > prev_max:
                        descending = False
                prev_min, prev_max = pstats.min_raw, pstats.max_raw
        if off_index is not None:
            first_row = (
                int(row_cum[s0]) if lv.rep_levels is not None else s0
            )
            off_index.append(
                PageLocation(
                    rel_offset=page_start,
                    compressed_page_size=w.offset - page_start,
                    first_row_index=first_row,
                )
            )

    if col_index is not None:
        col_index.boundary_order = 1 if ascending else (2 if descending else 0)
    if opts.statistics:
        enc_stats.append((3, int(encoding), len(bounds)))

    blob = w.getvalue()
    meta = ChunkMeta(
        path=leaf.path,
        ptype=int(el.type),
        encodings=encodings,
        codec=int(codec),
        num_values=n_slots,
        total_compressed_size=len(blob),
        total_uncompressed_size=uncomp_acc,
        data_page_offset=data_page_offset,
        dictionary_page_offset=dictionary_page_offset,
        stats=stats,
        encoding_stats=enc_stats if opts.statistics else None,
        column_index=col_index,
        offset_index=off_index,
        bloom=bloom,
        kv_metadata=[("hpw_fsst", "1")] if fsst_table is not None else None,
        geo_stats=geo_stats,
    )
    return blob, meta
