"""Little-endian WKB codec for the 3 concrete geometry types.

Exact-semantics port of lib/spatial/wkb.go:24-170 + lib/spatial/geom.go:197-283:
- only little-endian accepted (wkb.go:34);
- types: 1=Point, 2=LineString, 3=Polygon (lib/spatial/geom.go:21-27);
- polygon rings are CLOSED on the wire and UNCLOSED in memory: the writer
  appends ring[0] (wkb.go:105), the reader unconditionally drops the last
  point of each ring (wkb.go:167).

In-memory coords: point → (x, y); line → np.ndarray (k,2); polygon →
list[np.ndarray]. Multi* geometries do not exist in the engine — they are
split at ingest (lib/geojson/codec.go:108-121).
"""

from __future__ import annotations

import struct

import numpy as np

GEOM_EMPTY = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def _write_coords(parts: list[bytes], arr: np.ndarray) -> None:
    parts.append(_U32.pack(len(arr)))
    parts.append(np.ascontiguousarray(arr, dtype="<f8").tobytes())


def to_wkb(geom_type: int, coords) -> bytes:
    parts = [_HDR.pack(1, geom_type)]
    if geom_type == GEOM_POINT:
        parts.append(struct.pack("<dd", float(coords[0]), float(coords[1])))
    elif geom_type == GEOM_LINESTRING:
        _write_coords(parts, np.asarray(coords, np.float64))
    elif geom_type == GEOM_POLYGON:
        parts.append(_U32.pack(len(coords)))
        for ring in coords:
            r = np.asarray(ring, np.float64)
            _write_coords(parts, np.concatenate([r, r[:1]]))  # close ring
    else:
        raise ValueError(f"unsupported GeomType: {geom_type}")
    return b"".join(parts)


def from_wkb(buf: bytes):
    """Returns (geom_type, coords)."""
    endian, typ = _HDR.unpack_from(buf, 0)
    if endian != 1:
        raise ValueError("only little endian is supported")
    off = _HDR.size
    if typ == GEOM_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return typ, (x, y)
    if typ == GEOM_LINESTRING:
        (n,) = _U32.unpack_from(buf, off)
        if n < 1:
            raise ValueError("a linestring needs to have at least one point")
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off + 4)
        return typ, arr.reshape(n, 2).astype(np.float64)
    if typ == GEOM_POLYGON:
        (nr,) = _U32.unpack_from(buf, off)
        if nr < 1:
            raise ValueError("a polygon needs to have at least one ring")
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = _U32.unpack_from(buf, off)
            arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off + 4)
            # wire rings are closed; memory rings are not (wkb.go:167)
            rings.append(arr.reshape(n, 2)[:-1].astype(np.float64))
            off += 4 + 16 * n
        return typ, rings
    raise ValueError(f"unsupported GeomType: {typ}")


def geom_bbox(geom_type: int, coords) -> tuple[float, float, float, float]:
    """Geometry → bbox (lib/spatial/geom.go:339-355)."""
    if geom_type == GEOM_POINT:
        x, y = float(coords[0]), float(coords[1])
        return (x, y, x, y)
    if geom_type == GEOM_LINESTRING:
        a = np.asarray(coords, np.float64)
        return (
            float(a[:, 0].min()),
            float(a[:, 1].min()),
            float(a[:, 0].max()),
            float(a[:, 1].max()),
        )
    if geom_type == GEOM_POLYGON:
        a = np.concatenate([np.asarray(r, np.float64) for r in coords])
        return (
            float(a[:, 0].min()),
            float(a[:, 1].min()),
            float(a[:, 0].max()),
            float(a[:, 1].max()),
        )
    raise ValueError(f"unsupported GeomType: {geom_type}")
