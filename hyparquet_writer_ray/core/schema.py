"""Arrow schema -> parquet SchemaElement IR (flat preorder list).

Mirrors the reference's type mapping (src/schema.js:146-241 and
README.md:37-53) but takes a ``pyarrow.Schema`` as the source of truth;
the IR is what the Thrift footer writer serializes verbatim.
"""
from __future__ import annotations

import pyarrow as pa

from .types import (
    ConvertedType,
    LogicalType,
    ParquetType,
    Repetition,
    SchemaElement,
)


def _ts_unit(unit: str) -> str:
    return {"ms": "MILLIS", "us": "MICROS", "ns": "NANOS"}[unit]


def _leaf_elements(name: str, t: pa.DataType, nullable: bool) -> list[SchemaElement]:
    rep = Repetition.OPTIONAL if nullable else Repetition.REQUIRED
    el = SchemaElement(name=name, repetition=rep)

    if pa.types.is_boolean(t):
        el.type = ParquetType.BOOLEAN
    elif pa.types.is_int32(t):
        el.type = ParquetType.INT32
    elif t in (pa.int8(), pa.int16()):
        el.type = ParquetType.INT32
        bits = 8 if t == pa.int8() else 16
        el.converted_type = ConvertedType.INT_8 if bits == 8 else ConvertedType.INT_16
        el.logical_type = LogicalType("INTEGER", {"bitWidth": bits, "isSigned": True})
    elif t in (pa.uint8(), pa.uint16(), pa.uint32()):
        el.type = ParquetType.INT32
        bits = {pa.uint8(): 8, pa.uint16(): 16, pa.uint32(): 32}[t]
        el.converted_type = {
            8: ConvertedType.UINT_8, 16: ConvertedType.UINT_16, 32: ConvertedType.UINT_32
        }[bits]
        el.logical_type = LogicalType("INTEGER", {"bitWidth": bits, "isSigned": False})
        if bits == 32:
            el.type = ParquetType.INT32
    elif pa.types.is_int64(t):
        el.type = ParquetType.INT64
    elif pa.types.is_uint64(t):
        el.type = ParquetType.INT64
        el.converted_type = ConvertedType.UINT_64
        el.logical_type = LogicalType("INTEGER", {"bitWidth": 64, "isSigned": False})
    elif pa.types.is_float32(t):
        el.type = ParquetType.FLOAT
    elif pa.types.is_float64(t):
        el.type = ParquetType.DOUBLE
    elif pa.types.is_float16(t):
        el.type = ParquetType.FIXED_LEN_BYTE_ARRAY
        el.type_length = 2
        el.logical_type = LogicalType("FLOAT16")
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        el.type = ParquetType.BYTE_ARRAY
        el.converted_type = ConvertedType.UTF8
        el.logical_type = LogicalType("STRING")
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        el.type = ParquetType.BYTE_ARRAY
    elif pa.types.is_fixed_size_binary(t):
        el.type = ParquetType.FIXED_LEN_BYTE_ARRAY
        el.type_length = t.byte_width
    elif pa.types.is_timestamp(t):
        el.type = ParquetType.INT64
        unit = _ts_unit(t.unit)
        if unit == "MILLIS":
            el.converted_type = ConvertedType.TIMESTAMP_MILLIS
        elif unit == "MICROS":
            el.converted_type = ConvertedType.TIMESTAMP_MICROS
        el.logical_type = LogicalType(
            "TIMESTAMP", {"unit": unit, "isAdjustedToUTC": t.tz is not None}
        )
    elif pa.types.is_date32(t):
        el.type = ParquetType.INT32
        el.converted_type = ConvertedType.DATE
        el.logical_type = LogicalType("DATE")
    elif pa.types.is_time32(t):
        el.type = ParquetType.INT32
        el.converted_type = ConvertedType.TIME_MILLIS
        el.logical_type = LogicalType("TIME", {"unit": "MILLIS", "isAdjustedToUTC": False})
    elif pa.types.is_time64(t):
        el.type = ParquetType.INT64
        unit = _ts_unit(t.unit)
        if unit == "MICROS":
            el.converted_type = ConvertedType.TIME_MICROS
        el.logical_type = LogicalType("TIME", {"unit": unit, "isAdjustedToUTC": False})
    elif pa.types.is_decimal(t):
        if t.byte_width != 16:
            # decimal256 nested inside list/struct/map is not rewritten by
            # normalize_table; refuse rather than write a corrupt 16-byte FLBA
            raise TypeError(
                f"unsupported decimal storage width {t.byte_width} for {t}; "
                "only 16-byte decimal128 leaves can be written"
            )
        el.type = ParquetType.FIXED_LEN_BYTE_ARRAY
        el.type_length = 16
        el.converted_type = ConvertedType.DECIMAL
        el.scale = t.scale
        el.precision = t.precision
        el.logical_type = LogicalType("DECIMAL", {"scale": t.scale, "precision": t.precision})
    else:
        raise TypeError(f"unsupported arrow type for parquet leaf: {t}")
    return [el]


def _field_elements(name: str, t: pa.DataType, nullable: bool) -> list[SchemaElement]:
    rep = Repetition.OPTIONAL if nullable else Repetition.REQUIRED
    if pa.types.is_struct(t):
        group = SchemaElement(name=name, repetition=rep, num_children=t.num_fields)
        out = [group]
        for f in t:
            out.extend(_field_elements(f.name, f.type, f.nullable))
        return out
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        group = SchemaElement(
            name=name, repetition=rep, num_children=1,
            converted_type=ConvertedType.LIST, logical_type=LogicalType("LIST"),
        )
        mid = SchemaElement(name="list", repetition=Repetition.REPEATED, num_children=1)
        elem_field = t.value_field
        return [group, mid] + _field_elements("element", elem_field.type, elem_field.nullable)
    if pa.types.is_map(t):
        group = SchemaElement(
            name=name, repetition=rep, num_children=1,
            converted_type=ConvertedType.MAP, logical_type=LogicalType("MAP"),
        )
        mid = SchemaElement(name="key_value", repetition=Repetition.REPEATED, num_children=2)
        return (
            [group, mid]
            + _field_elements("key", t.key_type, False)
            + _field_elements("value", t.item_type, True)
        )
    return _leaf_elements(name, t, nullable)


def schema_from_arrow(
    schema: pa.Schema, overrides: dict | None = None
) -> list[SchemaElement]:
    """Flat preorder SchemaElement list with synthetic root.

    ``overrides`` replaces a top-level leaf's element with a caller-built
    SchemaElement (logical-type annotations; reference schemaOverrides,
    src/schema.js:25-41). The physical type/type_length must match what
    the arrow column derives to — the byte layout is fixed by the data.
    """
    out = [SchemaElement(name="root", num_children=len(schema))]
    for field in schema:
        els = _field_elements(field.name, field.type, field.nullable)
        if overrides and field.name in overrides:
            ov = overrides[field.name]
            if ov.num_children == -1:
                # group-level annotation (e.g. VARIANT): merge logical type
                # into the derived group element, keep the subtree
                if els[0].is_leaf:
                    raise ValueError(f"group override on leaf column {field.name}")
                els[0].logical_type = ov.logical_type
                els[0].converted_type = ov.converted_type or els[0].converted_type
                out.extend(els)
                continue
            if len(els) != 1:
                raise ValueError(f"schema override on nested column {field.name}")
            base = els[0]
            if ov.type != base.type or (ov.type_length or None) != (base.type_length or None):
                raise ValueError(
                    f"schema override for {field.name} changes physical type "
                    f"({ov.type}/{ov.type_length} vs {base.type}/{base.type_length})"
                )
            ov.name = field.name
            if ov.repetition is None:
                ov.repetition = base.repetition
            els = [ov]
        out.extend(els)
    return out


# Arrow types we cannot write directly get normalized up front.
def normalize_table(table: pa.Table) -> pa.Table:
    """Cast arrow types without a direct parquet mapping to supported ones."""
    new_cols = []
    changed = False
    for field, col in zip(table.schema, table.columns):
        t = field.type
        nt = _normalize_type(t)
        if nt is not None:
            col = col.cast(nt)
            changed = True
        new_cols.append(col)
    if not changed:
        return table
    # preserve field nullability and schema/field metadata across the cast
    fields = [f.with_type(c.type) for f, c in zip(table.schema, new_cols)]
    return pa.table(
        new_cols, schema=pa.schema(fields, metadata=table.schema.metadata)
    )


def _normalize_type(t: pa.DataType):
    if pa.types.is_timestamp(t) and t.unit == "s":
        return pa.timestamp("ms", t.tz)
    if pa.types.is_time32(t) and t.unit == "s":
        # parquet TIME has no seconds unit: store milliseconds
        return pa.time32("ms")
    if pa.types.is_date64(t):
        return pa.date32()
    if pa.types.is_dictionary(t):
        return t.value_type
    if pa.types.is_null(t):
        return pa.binary()
    if pa.types.is_decimal256(t):
        if t.precision <= 38:
            return pa.decimal128(t.precision, t.scale)
        raise TypeError(
            f"decimal256 precision {t.precision} > 38 is unsupported: "
            "FLBA decimal storage and statistics are 16-byte"
        )
    return None
