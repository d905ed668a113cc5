"""Geometry clipping to a bbox (the per-tile clip mask).

- point clip: lib/spatial/point.go:23-29
- segment clip: exact port of the split casework, lib/spatial/line.go:270-310
- linestring clip: fast paths + per-segment clip + re-chaining,
  lib/spatial/line.go:101-136
- polygon clip: fast-path short circuits (lib/spatial/polygon.go:26-40) +
  Sutherland–Hodgman intersection against the rectangle as the general path.
  DIVERGENCE NOTE: the reference's default build calls GEOS
  (lib/spatial/clip_geos.go:11-41), which can split a concave polygon into
  multiple result polygons; Sutherland–Hodgman returns a single (possibly
  degenerate-bridged) ring. GEOS (C library) is not available in this
  environment; for tile rendering the rasterized output is equivalent.
"""

from __future__ import annotations

import numpy as np

from .geometry import line_intersections, ring_bbox, segment_intersection
from .rounding import round8

# bbox is (minx, miny, maxx, maxy) everywhere in this module.


def clip_point(px: float, py: float, bbox) -> bool:
    minx, miny, maxx, maxy = bbox
    return minx <= px <= maxx and miny <= py <= maxy


def _bbox_borders(bbox):
    """BBoxBorders, counter-clockwise from SW (lib/spatial/line.go:395-415)."""
    minx, miny, maxx, maxy = bbox
    return [
        ((minx, miny), (minx, maxy)),
        ((minx, maxy), (maxx, maxy)),
        ((maxx, maxy), (maxx, miny)),
        ((maxx, miny), (minx, miny)),
    ]


def _seg_fully_in(seg, bbox) -> bool:
    """Segment.FullyInBBox — compares against ROUNDED bbox corners
    (lib/spatial/line.go:312-321)."""
    minx, miny = round8(bbox[0]), round8(bbox[1])
    maxx, maxy = round8(bbox[2]), round8(bbox[3])
    (x1, y1), (x2, y2) = seg
    return (
        x1 >= minx
        and y1 >= miny
        and x2 >= minx
        and y2 >= miny
        and x1 <= maxx
        and y1 <= maxy
        and x2 <= maxx
        and y2 <= maxy
    )


def _seg_len_nonzero(seg) -> bool:
    return seg[0] != seg[1]


def clip_segment(seg, bbox):
    """Segment.ClipToBBox (lib/spatial/line.go:270-310): returns [] or [seg'].

    Intersect with the 4 borders in ccw order; try both halves of each split;
    if the segment crosses the bbox (both endpoints outside) try double splits
    with every other intersection point.
    """
    intersections = []
    for border in _bbox_borders(bbox):
        ipt, ok = segment_intersection(seg, border)
        if ok:
            intersections.append(ipt)

    for i, ipt in enumerate(intersections):
        halves = ((seg[0], ipt), (ipt, seg[1]))
        for h in halves:
            if _seg_len_nonzero(h) and _seg_fully_in(h, bbox):
                return [h]
        for ii, iipt in enumerate(intersections):
            if i == ii:
                continue
            for h in halves:
                for hh in ((h[0], iipt), (iipt, h[1])):
                    if _seg_len_nonzero(hh) and _seg_fully_in(hh, bbox):
                        return [hh]
    return []


def clip_line(line: np.ndarray, bbox) -> list[np.ndarray]:
    """Line.ClipToBBox (lib/spatial/line.go:101-136): bbox fast paths, then
    per-segment clip and re-chaining of contiguous runs into sublines."""
    minx, miny, maxx, maxy = bbox
    lminx, lminy, lmaxx, lmaxy = ring_bbox(line)

    if minx <= lminx and maxx >= lmaxx and miny <= lminy and maxy >= lmaxy:
        return [np.asarray(line, np.float64)]
    if lmaxx < minx or lmaxy < miny or lminx > maxx or lminy > maxy:
        return []

    pts = [(float(x), float(y)) for x, y in np.asarray(line, np.float64)]
    cutsegs = []
    for i in range(len(pts) - 1):
        seg = (pts[i], pts[i + 1])
        if _seg_fully_in(seg, bbox):
            cutsegs.append(seg)
            continue
        cutsegs.extend(clip_segment(seg, bbox))
    if not cutsegs:
        return []

    # NewLinesFromSegments re-chaining (lib/spatial/line.go:10-23)
    lines: list[list] = [[]]
    for i, seg in enumerate(cutsegs):
        if i != 0 and seg[0] != cutsegs[i - 1][1]:
            lines[-1].append(cutsegs[i - 1][1])
            lines.append([seg[0]])
            continue
        lines[-1].append(seg[0])
    lines[-1].append(cutsegs[-1][1])
    return [np.asarray(ln, np.float64) for ln in lines]


def _sutherland_hodgman(ring: np.ndarray, bbox) -> np.ndarray | None:
    """Clip one ring against the rectangle; returns open ring or None."""
    minx, miny, maxx, maxy = bbox
    # each clip edge: (inside_test, intersect)
    edges = [
        (lambda p: p[0] >= minx, "x", minx),
        (lambda p: p[0] <= maxx, "x", maxx),
        (lambda p: p[1] >= miny, "y", miny),
        (lambda p: p[1] <= maxy, "y", maxy),
    ]
    pts = [(float(x), float(y)) for x, y in np.asarray(ring, np.float64)]
    for inside, axis, v in edges:
        if not pts:
            return None
        out = []
        for i, cur in enumerate(pts):
            prev = pts[i - 1]
            cin, pin = inside(cur), inside(prev)
            if cin != pin:
                # intersection of prev→cur with axis=v
                if axis == "x":
                    t = (v - prev[0]) / (cur[0] - prev[0])
                    out.append((v, prev[1] + t * (cur[1] - prev[1])))
                else:
                    t = (v - prev[1]) / (cur[1] - prev[1])
                    out.append((prev[0] + t * (cur[0] - prev[0]), v))
            if cin:
                out.append(cur)
        pts = out
    # dedup consecutive duplicates
    dedup = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    if len(dedup) > 1 and dedup[0] == dedup[-1]:
        dedup = dedup[:-1]
    if len(dedup) < 3:
        return None
    return np.asarray(dedup, np.float64)


def clip_polygon(polygon: list[np.ndarray], bbox) -> list[list[np.ndarray]]:
    """Polygon.ClipToBBox with the reference's short circuits
    (lib/spatial/polygon.go:26-40), then Sutherland–Hodgman per ring.

    Returns a list of polygons (each a ring list) to keep the 0..N contract
    of the reference's GEOS path (lib/spatial/clip_geos.go:11-41)."""
    minx, miny, maxx, maxy = bbox
    if len(polygon) == 1:
        borders = _bbox_borders(bbox)
        if not line_intersections(polygon[0], borders):
            rminx, rminy, rmaxx, rmaxy = ring_bbox(polygon[0])
            # bbox fully inside ring's bbox → emit the bbox rectangle
            if rminx <= minx <= rmaxx and rminx <= maxx <= rmaxx and (
                rminy <= miny <= rmaxy and rminy <= maxy <= rmaxy
            ):
                rect = np.array(
                    [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]],
                    np.float64,
                )
                return [[rect]]
            # polygon's bbox fully inside bbox → unchanged
            if minx <= rminx <= maxx and minx <= rmaxx <= maxx and (
                miny <= rminy <= maxy and miny <= rmaxy <= maxy
            ):
                return [[np.asarray(r, np.float64) for r in polygon]]

    rings = []
    for ring in polygon:
        clipped = _sutherland_hodgman(ring, bbox)
        if clipped is not None:
            rings.append(clipped)
    if not rings:
        return []
    return [rings]


def clip_geom(geom_type: int, coords, bbox):
    """Polymorphic clip (lib/spatial/geom.go:373-384): returns list of
    (geom_type, coords)."""
    if geom_type == 1:
        x, y = coords
        return [(1, coords)] if clip_point(x, y, bbox) else []
    if geom_type == 2:
        return [(2, ln) for ln in clip_line(coords, bbox)]
    if geom_type == 3:
        return [(3, poly) for poly in clip_polygon(coords, bbox)]
    raise ValueError(f"unknown geom_type {geom_type}")
