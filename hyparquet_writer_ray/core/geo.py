"""Geospatial support: GeoJSON <-> ISO WKB and per-chunk geospatial
statistics (bbox + type codes) for GEOMETRY/GEOGRAPHY columns
(reference: src/wkb.js:13-144, src/geospatial.js:8-147).

Engine integration: geometry columns are binary WKB in Arrow; mark
them with ``ColumnSpec(geospatial=True)`` (or the spec GEOMETRY
LogicalType via schema override for variant-aware readers — pyarrow
rejects unknown logical types, same caveat as VARIANT).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional

TYPE_CODES = {
    "Point": 1, "LineString": 2, "Polygon": 3, "MultiPoint": 4,
    "MultiLineString": 5, "MultiPolygon": 6, "GeometryCollection": 7,
}
TYPE_NAMES = {v: k for k, v in TYPE_CODES.items()}


def _coord_dims(coords) -> int:
    if not coords:
        return 2
    if isinstance(coords[0], (int, float)):
        return len(coords)
    return max((_coord_dims(c) for c in coords), default=2) or 2


def _geometry_dims(geom: dict) -> int:
    if geom["type"] == "GeometryCollection":
        return max((_geometry_dims(g) for g in geom.get("geometries", [])), default=2) or 2
    return _coord_dims(geom.get("coordinates", []))


def _wkb_type(geom: dict, dims: int) -> int:
    base = TYPE_CODES[geom["type"]]
    if dims == 2:
        return base
    if dims == 3:
        # XYM (m_only tag) takes the +2000 code block, XYZ +1000
        return base + (2000 if geom.get("m_only") else 1000)
    if dims == 4:
        return base + 3000  # ZM
    raise ValueError(f"unsupported geometry dimensions: {dims}")


def geojson_to_wkb(geom: dict) -> bytes:
    """GeoJSON geometry -> ISO WKB, little-endian."""
    dims = _geometry_dims(geom)
    return _write_geometry(geom, dims)


def _write_geometry(geom: dict, dims: int) -> bytes:
    out = bytearray(b"\x01")  # little endian
    out += struct.pack("<I", _wkb_type(geom, dims))
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        out += _write_point(c, dims)
    elif t in ("LineString", "MultiPoint"):
        out += struct.pack("<I", len(c))
        for p in c:
            if t == "MultiPoint":
                sub = {"type": "Point", "coordinates": p}
                if geom.get("m_only"):
                    sub["m_only"] = True
                out += _write_geometry(sub, dims)
            else:
                out += _write_point(p, dims)
    elif t in ("Polygon", "MultiLineString"):
        out += struct.pack("<I", len(c))
        for ring in c:
            if t == "MultiLineString":
                sub = {"type": "LineString", "coordinates": ring}
                if geom.get("m_only"):
                    sub["m_only"] = True
                out += _write_geometry(sub, dims)
            else:
                out += struct.pack("<I", len(ring))
                for p in ring:
                    out += _write_point(p, dims)
    elif t == "MultiPolygon":
        out += struct.pack("<I", len(c))
        for poly in c:
            sub = {"type": "Polygon", "coordinates": poly}
            if geom.get("m_only"):
                sub["m_only"] = True
            out += _write_geometry(sub, dims)
    elif t == "GeometryCollection":
        gs = geom.get("geometries", [])
        out += struct.pack("<I", len(gs))
        for g in gs:
            out += _write_geometry(g, _geometry_dims(g))
    else:
        raise ValueError(f"unknown geometry type: {t}")
    return bytes(out)


def _write_point(p, dims: int) -> bytes:
    vals = list(p) + [float("nan")] * (dims - len(p))
    return struct.pack(f"<{dims}d", *vals[:dims])


def wkb_to_geojson(data: bytes, pos: int = 0):
    """ISO WKB -> GeoJSON (both endiannesses; used as the roundtrip
    oracle and by the stats walker)."""
    little = data[pos] == 1
    e = "<" if little else ">"
    code = struct.unpack_from(f"{e}I", data, pos + 1)[0]
    pos += 5
    base = code % 1000
    dims = 2 + (1 if 1000 <= code < 2000 else 0) + (2 if code >= 3000 else 0)
    m_only = 2000 <= code < 3000
    if m_only:
        dims = 3  # XYM: third ordinate is M, not Z (tagged below)
    if base not in TYPE_NAMES or code >= 4000:
        raise ValueError(f"invalid WKB geometry type code {code} at offset {pos - 5}")
    t = TYPE_NAMES[base]

    def _tag(d):
        if m_only:
            d["m_only"] = True
        return d

    def point(p):
        vals = struct.unpack_from(f"{e}{dims}d", data, p)
        return list(vals), p + 8 * dims

    if t == "Point":
        c, pos = point(pos)
        return _tag({"type": "Point", "coordinates": c}), pos
    n = struct.unpack_from(f"{e}I", data, pos)[0]
    pos += 4
    if t == "LineString":
        coords = []
        for _ in range(n):
            c, pos = point(pos)
            coords.append(c)
        return _tag({"type": "LineString", "coordinates": coords}), pos
    if t == "Polygon":
        rings = []
        for _ in range(n):
            m = struct.unpack_from(f"{e}I", data, pos)[0]
            pos += 4
            ring = []
            for _ in range(m):
                c, pos = point(pos)
                ring.append(c)
            rings.append(ring)
        return _tag({"type": "Polygon", "coordinates": rings}), pos
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        parts = []
        for _ in range(n):
            g, pos = wkb_to_geojson(data, pos)
            parts.append(g["coordinates"])
        return _tag({"type": t, "coordinates": parts}), pos
    # GeometryCollection
    gs = []
    for _ in range(n):
        g, pos = wkb_to_geojson(data, pos)
        gs.append(g)
    return _tag({"type": "GeometryCollection", "geometries": gs}), pos


@dataclass
class GeoStats:
    xmin: Optional[float] = None
    xmax: Optional[float] = None
    ymin: Optional[float] = None
    ymax: Optional[float] = None
    zmin: Optional[float] = None
    zmax: Optional[float] = None
    mmin: Optional[float] = None
    mmax: Optional[float] = None
    geospatial_types: list = field(default_factory=list)

    @property
    def has_bbox(self) -> bool:
        return self.xmin is not None and self.ymin is not None


def _upd(st: GeoStats, lo: str, hi: str, v: float) -> None:
    import math

    if v is None or not math.isfinite(v):
        return
    cur = getattr(st, lo)
    if cur is None or v < cur:
        setattr(st, lo, v)
    cur = getattr(st, hi)
    if cur is None or v > cur:
        setattr(st, hi, v)


def _walk_coords(st: GeoStats, coords, m_only: bool = False) -> None:
    if not coords:
        return
    if isinstance(coords[0], (int, float)):
        _upd(st, "xmin", "xmax", coords[0])
        if len(coords) > 1:
            _upd(st, "ymin", "ymax", coords[1])
        if len(coords) > 2:
            # XYM geometry's third ordinate is M, not Z
            if m_only and len(coords) == 3:
                _upd(st, "mmin", "mmax", coords[2])
            else:
                _upd(st, "zmin", "zmax", coords[2])
        if len(coords) > 3:
            _upd(st, "mmin", "mmax", coords[3])
        return
    for c in coords:
        _walk_coords(st, c, m_only)


def _walk_geom(st: GeoStats, geom: dict) -> None:
    """Recurse through (arbitrarily nested) GeometryCollections."""
    if geom["type"] == "GeometryCollection":
        for g in geom.get("geometries", []):
            _walk_geom(st, g)
    else:
        _walk_coords(st, geom.get("coordinates", []),
                     bool(geom.get("m_only")))


def geospatial_statistics(wkb_values) -> Optional[GeoStats]:
    """Per-chunk geospatial stats over WKB byte values: per-dimension
    NaN-skipping bbox (dropped if x or y empty) + sorted type-code set
    with dimension offsets."""
    st = GeoStats()
    codes: set[int] = set()
    any_val = False
    for v in wkb_values:
        if v is None:
            continue
        any_val = True
        geom, _ = wkb_to_geojson(bytes(v))
        _walk_geom(st, geom)
        codes.add(_wkb_type(geom, _geometry_dims(geom)))
    if not any_val:
        return None
    if not st.has_bbox:
        st.xmin = st.xmax = st.ymin = st.ymax = None
    st.geospatial_types = sorted(codes)
    return st


def geo_stats_thrift(st: GeoStats):
    """ColumnMetaData field 17 GeospatialStatistics struct."""
    bbox = None
    if st.has_bbox:
        bbox = {
            1: st.xmin, 2: st.xmax, 3: st.ymin, 4: st.ymax,
            5: st.zmin, 6: st.zmax, 7: st.mmin, 8: st.mmax,
        }
    return {1: bbox, 2: list(st.geospatial_types)}


def geometry_schema_override(crs: Optional[str] = None):
    """GEOMETRY LogicalType for schema_overrides (same pyarrow caveat as
    VARIANT: unknown logical types make the file unreadable there)."""
    from .types import LogicalType, ParquetType, SchemaElement

    return SchemaElement(
        name="", type=ParquetType.BYTE_ARRAY,
        logical_type=LogicalType("GEOMETRY", {"crs": crs}),
    )
