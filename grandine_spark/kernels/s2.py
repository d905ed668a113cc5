"""S2 cell-id codec — the quad-sphere Hilbert-curve index, pure numpy.

The engine's primary cell index is the reference's slippy z/x/y scheme
(``kernels/tilemath.py``, lib/tile/tile.go:37-49); this module adds the
S2 scheme named by BASELINE.json's north rule ("indexed with H3/S2 cell
IDs via vectorized pandas/Arrow UDFs"). Everything here derives from the
published S2 geometry model (s2geometry.io / the open-source s2geometry
library's documented cell-id layout): lat/lng → unit-sphere XYZ → cube
face (+x,+y,+z,−x,−y,−z = faces 0..5) → per-face (u,v) → quadratic
(s,t) → 2^level × 2^level (i,j) grid → position along the face's Hilbert
curve via the 4-state orientation machine.

Two id forms:

- **packed** (our join/index key): ``face << 2·level | hilbert_pos`` —
  a plain non-negative BIGINT at any level ≤ 29, hierarchical by bit
  prefix (parent = ``packed >> 2``), range-queryable
  (descendants of ``c`` at +Δ levels = ``[c << 2Δ, (c+1) << 2Δ)``), so
  the same broadcast cell-join / cell-prefix machinery used for slippy
  cells (operators/spatial_join.py) applies unchanged.
- **canonical** (interop): the standard 64-bit S2CellId
  ``face(3 bits) ‖ pos(2·level bits) ‖ 1 ‖ 0…`` as uint64, and its hex
  token (trailing zeros stripped). Level-0 faces are tokens
  ``1,3,5,7,9,b`` and the (0°,0°) leaf is ``1000000000000001`` —
  asserted in tests as external anchors of the layout.

Vectorization: the Hilbert state machine is 4 states × 4 quadrant
positions; per level one fancy-index gather over the whole batch, so a
level-``L`` encode is ``L`` numpy passes — the Arrow-batched shape the
north rule prescribes (no per-row Python anywhere).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29  # packed form: 3 face bits + 2·29 pos bits = 61 ≤ 63

# Hilbert curve tables (public S2 cell model). Orientation bits:
# swap=1, invert=2. POS_TO_IJ[orientation][position] = sub-cell quadrant
# (i<<1|j) traversed at that position; IJ_TO_POS is the per-row inverse;
# POS_TO_ORIENT[position] = orientation delta (xor) for the sub-cell.
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.int64
)
POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)


def face_uv(lat, lng):
    """(face, u, v) arrays for lat/lng degrees — the cube-face projection.

    Face selection ties (|x| == |y| etc.) break toward the later axis,
    matching the published largest-abs-component rule."""
    lat = np.asarray(lat, np.float64)
    lng = np.asarray(lng, np.float64)
    phi = np.radians(lat)
    theta = np.radians(lng)
    cp = np.cos(phi)
    x = cp * np.cos(theta)
    y = cp * np.sin(theta)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.select([axis == 0, axis == 1], [x, y], z)
    face = np.where(comp >= 0, axis, axis + 3)
    # every per-face formula divides by the (signed) major component, so
    # select the numerators and divide once — comp is never 0 on the unit
    # sphere, which also keeps np.select's eager branches free of 0/0
    u_num = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y, -x, -x, z, z],
        -y,
    )
    v_num = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z, z, -y, y, -x],
        -x,
    )
    return face.astype(np.int64), u_num / comp, v_num / comp


def _uv_to_st(u):
    """Quadratic projection: equalizes cell areas across a face.

    Both signs share sqrt(1 + 3|u|) (1+3u for u≥0, 1−3u for u<0), so one
    sqrt serves both np.where branches without a negative argument."""
    r = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, r, 1.0 - r)


def _st_to_uv(s):
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


def _st_to_ij(s, level: int):
    n = 1 << level
    ij = np.floor(s * n).astype(np.int64)
    return np.clip(ij, 0, n - 1)


def hilbert_pos(face, i, j, level: int):
    """Position of grid cell (i, j) along face's Hilbert curve (arrays)."""
    orient = face & 1  # odd faces start with the swapped traversal
    pos = np.zeros(np.shape(i), np.int64)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = IJ_TO_POS[orient, ij]
        pos = (pos << 2) | p
        orient = orient ^ POS_TO_ORIENT[p]
    return pos


def hilbert_ij(face, pos, level: int):
    """Inverse of :func:`hilbert_pos`: (i, j) arrays from curve positions."""
    orient = face & 1
    i = np.zeros(np.shape(pos), np.int64)
    j = np.zeros(np.shape(pos), np.int64)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ POS_TO_ORIENT[p]
    return i, j


def cell_ids(lat, lng, level: int):
    """Packed S2 cell ids (face << 2·level | hilbert_pos), int64 array."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    face, u, v = face_uv(lat, lng)
    i = _st_to_ij(_uv_to_st(u), level)
    j = _st_to_ij(_uv_to_st(v), level)
    return (face << (2 * level)) | hilbert_pos(face, i, j, level)


def cell_center(packed, level: int):
    """(lat, lng) degree arrays of each packed cell's center point."""
    packed = np.asarray(packed, np.int64)
    face = packed >> (2 * level)
    pos = packed & ((np.int64(1) << (2 * level)) - 1)
    i, j = hilbert_ij(face, pos, level)
    n = float(1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    one = np.ones_like(u)
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [one, -u, -u, -one, v],
        v,
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [u, one, -v, -v, -one],
        u,
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [v, v, one, -u, -u],
        -one,
    )
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def cell_parent(packed, delta_levels: int):
    """Ancestor ``delta_levels`` up — a pure bit shift (prefix property)."""
    return np.asarray(packed, np.int64) >> (2 * delta_levels)


def cell_range(packed: int, delta_levels: int) -> tuple[int, int]:
    """[lo, hi) packed-id range of a cell's descendants ``delta_levels``
    down — the prefix range used for cell-range joins."""
    return packed << (2 * delta_levels), (packed + 1) << (2 * delta_levels)


def canonical_id(lat, lng, level: int):
    """Standard 64-bit S2CellId (uint64 array): face ‖ pos ‖ 1 ‖ 0…"""
    packed = cell_ids(lat, lng, level).astype(np.uint64)
    face = packed >> np.uint64(2 * level)
    pos = packed & ((np.uint64(1) << np.uint64(2 * level)) - np.uint64(1))
    lsb_shift = 2 * (30 - level)
    return (
        (face << np.uint64(61))
        | (pos << np.uint64(lsb_shift + 1))
        | (np.uint64(1) << np.uint64(lsb_shift))
    )


def tokens(lat, lng, level: int) -> list[str]:
    """Canonical hex tokens (16 digits, trailing zeros stripped)."""
    out = []
    for cid in canonical_id(lat, lng, level):
        h = format(int(cid), "016x").rstrip("0")
        out.append(h or "X")
    return out
