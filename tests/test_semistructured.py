"""JSON scalar-field extraction: the Arrow-regex fast path must agree
exactly with pure ``json.loads`` ground truth on every edge shape, and
the Dataset-level operator must match DuckDB's json_extract."""
import json

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hyparquet_writer_ray.functions.semistructured import (
    _fallback_value,
    json_extract_batch,
    json_extract_field,
)

EDGE_ROWS = [
    '{"k": 69}', '{"k": -3, "m": "x"}', '{"m": 1}', None,
    '{"s": "\\"k\\": 5"}', '{"nested": {"k": 9}}', '{ "k" : 7 }',
    '{"k": "str"}', '{"k": 1.5}', 'not json', '{"k": true}',
    '{"xk": 5}', '{"k": 12345678901234}', '{}', '{"k":3}',
    '{"k": 1e3}', '{"k": -0.5, "j": 2}', '{"k": null}',
    '{"a": "x", "k": 8, "z": "y"}', '[1, 2]', '{"k": [1]}', '',
    '{"k": "a b", "k2": ""}', '{"kk": 1, "k": 2}',
]


def _truth(rows, field, vt):
    return [_fallback_value(r, field, vt) for r in rows]


@pytest.mark.parametrize("vt,pytype", [
    ("bigint", pa.int64()), ("double", pa.float64()), ("string", pa.string()),
])
def test_edge_matrix_matches_json_loads(vt, pytype):
    t = pa.table({"props": pa.array(EDGE_ROWS, pa.string())})
    out = json_extract_batch(t, "k", value_type=vt, out_col="k").column("k")
    assert out.type == pytype
    assert out.to_pylist() == _truth(EDGE_ROWS, "k", vt)


def test_field_name_is_regex_escaped():
    rows = ['{"a.b": 5, "axb": 9}']
    t = pa.table({"props": pa.array(rows, pa.string())})
    # "a.b" is not an identifier key -> row fails the flat check and
    # goes through json.loads; the dot must not act as a wildcard
    out = json_extract_batch(t, "a.b", value_type="bigint", out_col="v")
    assert out.column("v").to_pylist() == [5]


_scalar = st.one_of(
    st.integers(-(2**40), 2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(st.characters(codec="utf-8", exclude_characters='"\\'), max_size=8),
    st.booleans(),
    st.none(),
)
_obj = st.dictionaries(
    st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,5}", fullmatch=True), _scalar, max_size=4
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), _obj), max_size=20), st.sampled_from(
    ["bigint", "double", "string"]))
def test_fuzz_flat_objects(objs, vt):
    rows = [None if o is None else json.dumps(o) for o in objs]
    t = pa.table({"props": pa.array(rows, pa.string())})
    out = json_extract_batch(t, "k", value_type=vt, out_col="k").column("k")
    assert out.to_pylist() == _truth(rows, "k", vt)


def test_dataset_matches_duckdb_oracle(ray_session, tmp_path):
    import ray.data

    rows = [f'{{"k": {i * 7 % 113}, "tag": "t{i % 5}"}}' for i in range(2000)]
    rows[17] = '{"nested": {"k": 1}, "k": 42}'   # residue row
    rows[99] = None
    src = tmp_path / "ev.parquet"
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"event_id": pa.array(range(2000), pa.int64()),
                  "props": pa.array(rows, pa.string())}), src)
    ds = ray.data.read_parquet(str(src))
    got = pa.concat_tables(
        json_extract_field(ds, "k").select_columns(["event_id", "k"])
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("event_id")
    want = duckdb.sql(
        f"SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k "
        f"FROM '{src}' ORDER BY event_id"
    ).arrow()
    assert got.column("k").to_pylist() == want.column("k").to_pylist()
