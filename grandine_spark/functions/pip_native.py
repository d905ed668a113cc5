"""Ray-casting point-in-polygon as a NATIVE Catalyst expression — the
whole-stage-codegen twin of ``kernels.geometry.points_in_polygon_np``
(itself an exact port of Point.InPolygon, lib/spatial/point.go:72-101).

The flagship join previously refined candidates in an Arrow pandas UDF (the
one Python stage in its plan). Expressed as ``aggregate``/``transform`` over
a per-feature edge array, the same semantics run entirely JVM-side:

- per edge: cartesian line×line intersection with the query ray (point →
  bbox.SW − (1,1)), both coordinates rounded at 8 dp half-away-from-zero
  (Spark ROUND == the Go port's rounding on IEEE doubles);
- validity: det ≠ 0, intersection within the ROUNDED ray box and the
  ROUNDED edge box (edge boxes precomputed driver-side with the exact
  python kernel rounding);
- UNIQUE intersections (array_distinct over the rounded points — the
  reference dedups via a map);
- odd count → inside; even → inside only if an intersection equals the
  raw tested point (boundary rule).

Edge coefficients (a2, b2, c2 of the segment's line, plus its rounded box)
are precomputed once per feature on the driver and broadcast, so the per-row
work is one det + two rounded divisions per edge, all codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.rounding import round8

EDGE_FIELDS = (
    "a2 double, b2 double, c2 double, "
    "xlo double, xhi double, ylo double, yhi double"
)
GEO_DIM_SCHEMA = (
    "feature_id long, ox double, oy double, rox double, roy double, "
    f"edges array<struct<{EDGE_FIELDS}>>"
)


def feature_edge_row(fid: int, rings) -> tuple:
    """One geo-dim row for a polygon: ray origin (ring-0 bbox SW − (1,1),
    point.go:86) and the precomputed edge coefficients of ALL rings incl.
    closing segments (point.go:78-83)."""
    import numpy as np

    r0 = np.asarray(rings[0], float)
    minx, miny = float(r0[:, 0].min()), float(r0[:, 1].min())
    ox, oy = minx - 1.0, miny - 1.0
    edges = []
    for ring in rings:
        r = np.asarray(ring, float)
        nxt = np.roll(r, -1, axis=0)
        for (x1, y1), (x2, y2) in zip(r.tolist(), nxt.tolist()):
            edges.append(
                (
                    y1 - y2,  # a2
                    x2 - x1,  # b2
                    x2 * y1 - x1 * y2,  # c2
                    min(round8(x1), round8(x2)),
                    max(round8(x1), round8(x2)),
                    min(round8(y1), round8(y2)),
                    max(round8(y1), round8(y2)),
                )
            )
    return (fid, ox, oy, round8(ox), round8(oy), edges)


def _round8_col(v: Column) -> Column:
    """EXACT Column twin of kernels.rounding.round8 (half-away-from-zero at
    8 dp as pure float64 arithmetic, point.go:129-139) — identical IEEE ops
    to the python/numpy kernels, and ~10x cheaper than Spark ROUND (which
    allocates a BigDecimal per call)."""
    x = v * F.lit(1e8)
    # floor(x+0.5) for x≥0 / ceil(x−0.5) for x<0, via double-preserving
    # truncation y − (y % 1.0): Spark's FLOOR/CEIL return LONG and would
    # overflow on the huge quotients near-parallel edges produce; plain
    # double arithmetic matches the kernel bit-for-bit and never overflows
    y = x + F.when(x < 0, F.lit(-0.5)).otherwise(F.lit(0.5))
    return (y - y % F.lit(1.0)) / F.lit(1e8)


def pip_native(
    lon: Column, lat: Column, ox: Column, oy: Column,
    rox: Column, roy: Column, edges: Column,
) -> Column:
    """Boolean containment Column — no Python anywhere in its evaluation."""
    rpx, rpy = _round8_col(lon), _round8_col(lat)
    a1 = lat - oy
    b1 = ox - lon
    c1 = ox * lat - lon * oy
    ray_xlo, ray_xhi = F.least(rpx, rox), F.greatest(rpx, rox)
    ray_ylo, ray_yhi = F.least(rpy, roy), F.greatest(rpy, roy)

    def inter(e):
        det = a1 * e["b2"] - e["a2"] * b1
        ix = _round8_col((e["b2"] * c1 - b1 * e["c2"]) / det)
        iy = _round8_col((a1 * e["c2"] - e["a2"] * c1) / det)
        inside_boxes = (
            (ix >= ray_xlo) & (ix <= ray_xhi)
            & (iy >= ray_ylo) & (iy <= ray_yhi)
            & (ix >= e["xlo"]) & (ix <= e["xhi"])
            & (iy >= e["ylo"]) & (iy <= e["yhi"])
        )
        # parallel edges: det==0 makes ix/iy ±Inf or NaN (IEEE double
        # division never throws, ANSI included); the explicit det≠0 test
        # plus NaN/Inf failing the box comparisons excludes them, exactly
        # like the kernel's det!=0 mask
        return F.when(
            (det != F.lit(0.0)) & inside_boxes,
            F.struct(ix.alias("ix"), iy.alias("iy")),
        )

    pts = F.array_distinct(
        F.filter(F.transform(edges, inter), lambda s: s.isNotNull())
    )
    on_boundary = F.exists(
        pts, lambda s: (s["ix"] == lon) & (s["iy"] == lat)
    )
    return (F.size(pts) % 2 == 1) | on_boundary
