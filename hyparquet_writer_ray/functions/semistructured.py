"""Semi-structured (JSON string) field extraction.

Web-scale event/telemetry tables carry a free-form JSON ``props``
column; extracting one scalar field out of it is the single most common
semi-structured operation in a curation pipeline.  The reference covers
the *write* side of semi-structured data (JSON logical type,
``src/unconvert.js:49-53``; VARIANT encode ``src/variant.js:23-63``);
this module is the matching read/extract operator, Ray-Data-first.

Design: a vectorized Arrow fast path with an exact fallback.

1. A strict "flat object" safety regex (identifier keys, unescaped
   scalar values, no nesting) is matched per row with
   ``pc.match_substring_regex`` — one Arrow kernel call per batch.
   For rows that pass, a field-anchored ``pc.extract_regex`` pull of
   ``"<field>": <scalar>`` CANNOT be fooled (no escapes or nested
   strings exist in such rows), so the extraction is exact.
2. Rows that fail the safety check (nested objects, escaped strings,
   exotic whitespace, invalid JSON) fall back to stdlib ``json.loads``
   — per-row Python, but only over the residue, and JSON parsing is
   semantics-bound the same way md5/regex fingerprints are.

On flat telemetry JSON (the overwhelmingly common case) ~100% of rows
take the Arrow path; correctness never depends on it.
"""
from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.arrays import single_chunk

# one flat JSON object: {"key": scalar, ...} with identifier keys and
# unescaped number/string/bool/null scalars; tolerant of whitespace
# around ':' and ','.  Anything outside this shape -> exact fallback.
_NUM = r'-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?'
_SCALAR = r'(' + _NUM + r'|"[^"\\]*"|true|false|null)'
_PAIR = r'"[A-Za-z_][A-Za-z0-9_]*":\s*' + _SCALAR
# pairs REQUIRE comma separators, no trailing comma, no leading-zero
# numbers: anything json.loads would reject must not pass this check
_FLAT_RE = (
    r'^\{\s*(' + _PAIR + r'(\s*,\s*' + _PAIR + r')*\s*)?\}$'
)

# all groups named (Arrow extract_regex / RE2 requirement).  bigint
# carries a tail guard group: v is greedy so <t> can only capture a
# '.'/'e' continuation, flagging a float value (bigint extraction of a
# non-integer JSON number yields null — see json_extract_batch doc).
_VALUE_PATTERNS = {
    "bigint": r"(?P<v>-?[0-9]+)(?P<t>[.eE]?)",
    "double": r"(?P<v>-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)",
    "string": r'"(?P<v>[^"\\]*)"',
}
_OUT_TYPES = {"bigint": pa.int64(), "double": pa.float64(), "string": pa.string()}


def _fallback_value(raw: str | None, field: str, value_type: str):
    """Exact JSON semantics for one row (the non-flat residue)."""
    if raw is None:
        return None
    try:
        obj = json.loads(raw)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict) or field not in obj:
        return None
    v = obj[field]
    if value_type == "string":
        return v if isinstance(v, str) else None
    if isinstance(v, bool):
        return None
    if value_type == "bigint":
        return v if isinstance(v, int) else None
    return float(v) if isinstance(v, (int, float)) else None


def json_extract_batch(
    batch: pa.Table,
    field: str,
    json_col: str = "props",
    out_col: str | None = None,
    value_type: str = "bigint",
) -> pa.Table:
    """Append ``out_col`` = JSON field ``field`` of ``json_col``.

    Missing field, type mismatch, or unparsable JSON -> null (matching
    DuckDB ``CAST(json_extract(col, '$.field') AS <type>)`` on clean
    inputs).  ``bigint`` extraction of a NON-integer JSON number yields
    null (not a truncation/rounding) — deterministic and identical on
    the fast and fallback paths; booleans are never numbers.
    """
    if value_type not in _VALUE_PATTERNS:
        raise ValueError(f"value_type must be one of {sorted(_VALUE_PATTERNS)}")
    out_col = out_col or field
    col = single_chunk(batch.column(json_col))
    n = len(col)
    flat_ok = pc.fill_null(pc.match_substring_regex(col, _FLAT_RE), False)
    # duplicated keys: json.loads (and DuckDB) keep the LAST occurrence,
    # extract_regex would return the FIRST — route those rows to the
    # exact fallback. In a provably-flat row string values cannot
    # contain '"', so counting '"field":' counts true key occurrences.
    dup = pc.greater(pc.count_substring_regex(
        col, '"' + re.escape(field) + '":'), 1)
    flat_ok = pc.and_(flat_ok, pc.fill_null(pc.invert(dup), False))
    ex = pc.extract_regex(
        col, '"' + re.escape(field) + r'":\s*' + _VALUE_PATTERNS[value_type]
    )
    # mask by the PARENT struct validity: a null struct slot's child
    # buffer may hold garbage (e.g. empty string), not a null
    parent_ok = pc.is_valid(ex)
    raw = pc.if_else(parent_ok, ex.field("v"), pa.scalar(None, pa.string()))
    # fast-path value only where the row is provably flat AND the field
    # regex matched; everything else goes through exact json.loads
    fast_valid = pc.and_(flat_ok, pc.is_valid(raw))
    if value_type == "bigint":
        # tail guard: the matched number continues as a float -> null
        int_ok = pc.fill_null(
            pc.and_(parent_ok, pc.equal(ex.field("t"), "")), False
        )
        fast_valid = pc.and_(fast_valid, int_ok)
    null_scalar = pa.scalar(None, _OUT_TYPES[value_type])
    if value_type == "string":
        vals = pc.if_else(fast_valid, raw, null_scalar)
    else:
        vals = pc.if_else(
            fast_valid, pc.cast(raw, _OUT_TYPES[value_type]), null_scalar
        )
    # residue: row not provably-flat, or flat but field absent (absent is
    # already correct=null on the fast path; only non-flat rows need work)
    residue = np.flatnonzero(
        pc.invert(flat_ok).to_numpy(zero_copy_only=False)
    )
    if residue.size:
        py_vals = vals.to_pylist()
        raw_rows = col.take(pa.array(residue)).to_pylist()
        for i, raw_row in zip(residue, raw_rows):
            py_vals[i] = _fallback_value(raw_row, field, value_type)
        vals = pa.array(py_vals, type=_OUT_TYPES[value_type])
    return batch.append_column(out_col, vals)


def json_extract_field(
    ds,
    field: str,
    json_col: str = "props",
    out_col: str | None = None,
    value_type: str = "bigint",
):
    """Dataset-level JSON scalar-field extraction (stateless map_batches)."""
    return ds.map_batches(
        lambda b: json_extract_batch(b, field, json_col, out_col, value_type),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
