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

# per-face (u, v) numerators over the cube projection: u = sign·xyz[axis]
# (faces 0..5 = +x,+y,+z,−x,−y,−z; same formulas the np.select chain
# previously spelled out branch by branch)
_U_AXIS = np.array([1, 0, 0, 2, 2, 1], dtype=np.int64)
_U_SIGN = np.array([1.0, -1.0, -1.0, 1.0, 1.0, -1.0])
_V_AXIS = np.array([2, 2, 1, 1, 0, 0], dtype=np.int64)
_V_SIGN = np.array([1.0, 1.0, -1.0, 1.0, -1.0, -1.0])


def face_uv(lat, lng):
    """(face, u, v) arrays for lat/lng degrees — the cube-face projection.

    Face selection ties (|x| == |y| etc.) break toward the later axis,
    matching the published largest-abs-component rule."""
    lat = np.asarray(lat, np.float64)
    lng = np.asarray(lng, np.float64)
    # 0-d inputs break the row-gather below (xyz is (3,) and the fancy
    # index needs two axes) — lift to 1-d and unwrap on return
    scalar = lat.ndim == 0 and lng.ndim == 0
    if scalar:
        lat, lng = lat.reshape(1), lng.reshape(1)
    phi = np.radians(lat)
    theta = np.radians(lng)
    cp = np.cos(phi)
    x = cp * np.cos(theta)
    y = cp * np.sin(theta)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    xyz = np.stack((x, y, z))
    rows = np.arange(x.shape[0])
    comp = xyz[axis, rows]
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    # every per-face formula divides by the (signed) major component, so
    # gather the numerators from the published per-face axis/sign tables
    # and divide once — comp is never 0 on the unit sphere. Table gathers
    # (one fancy-index pass each) replace 6-branch np.select chains, whose
    # eager branch evaluation was most of this function's cost.
    u_num = _U_SIGN[face] * xyz[_U_AXIS[face], rows]
    v_num = _V_SIGN[face] * xyz[_V_AXIS[face], rows]
    if scalar:
        return face[0], (u_num / comp)[0], (v_num / comp)[0]
    return face, u_num / comp, v_num / comp


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


def _build_chunk_table(k: int) -> np.ndarray:
    """(4, 4^k) table advancing the Hilbert machine ``k`` levels at once:
    entry[orient, idx] = new_orient << 2k | pos_bits, where ``idx`` is the
    k quadrant pairs (i_bit·2 + j_bit) MSB-level-first. Derived from the
    same one-level tables the scalar machine uses, so the chunked walk is
    exactly the per-level walk with fewer array passes."""
    size = 1 << (2 * k)
    tab = np.zeros((4, size), np.int64)
    for o in range(4):
        for idx in range(size):
            orient, pos = o, 0
            for t in range(k - 1, -1, -1):
                ij = (idx >> (2 * t)) & 3
                p = int(IJ_TO_POS[orient, ij])
                pos = (pos << 2) | p
                orient ^= int(POS_TO_ORIENT[p])
            tab[o, idx] = (orient << (2 * k)) | pos
    return tab


_CHUNK_K = 3
# flattened so one gather indexes (orient << 2k) | idx directly
_CHUNK_TABLES = {k: _build_chunk_table(k).ravel() for k in (1, 2, _CHUNK_K)}


def _interleave_bits(i, j):
    """Morton interleave: bit pair (i_bit, j_bit) of level-shift ``k``
    lands at bits (2k+1, 2k). One-time spread instead of per-level
    extraction inside the Hilbert walk."""

    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    return ((spread(i) << np.uint64(1)) | spread(j)).astype(np.int64)


def hilbert_pos(face, i, j, level: int):
    """Position of grid cell (i, j) along face's Hilbert curve (arrays).

    Walks the 4-state machine ``_CHUNK_K`` levels per step: the quadrant
    pairs come from one up-front Morton interleave and each step is a
    single fancy-index gather over a (4·4^k) packed table — ~3× fewer
    array passes than the level-at-a-time loop at deep levels (measured
    0.55 → ~1.6M pts/s single-core at level 12)."""
    orient = np.asarray(face & 1, np.int64)  # odd faces: swapped traversal
    pos = np.zeros(np.shape(i), np.int64)
    if level == 0:
        return pos
    m = _interleave_bits(np.asarray(i, np.int64), np.asarray(j, np.int64))
    rem = level
    while rem > 0:
        k = _CHUNK_K if rem >= _CHUNK_K else rem
        tab = _CHUNK_TABLES[k]
        rem -= k
        idx = (m >> (2 * rem)) & ((1 << (2 * k)) - 1)
        g = tab[(orient << (2 * k)) | idx]
        pos = (pos << (2 * k)) | (g & ((1 << (2 * k)) - 1))
        orient = g >> (2 * k)
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
    # same 0-d lift as face_uv: the scatter needs a row axis
    scalar = packed.ndim == 0
    if scalar:
        packed = packed.reshape(1)
    face = packed >> (2 * level)
    pos = packed & ((np.int64(1) << (2 * level)) - 1)
    i, j = hilbert_ij(face, pos, level)
    n = float(1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    # exact inverse of face_uv's gathers: scatter the major component
    # (±1) and the two signed numerators back into (x, y, z)
    rows = np.arange(u.shape[0])
    xyz = np.empty((3,) + np.shape(u), np.float64)
    comp = np.where(face < 3, 1.0, -1.0)
    xyz[face % 3, rows] = comp
    xyz[_U_AXIS[face], rows] = _U_SIGN[face] * u * comp
    xyz[_V_AXIS[face], rows] = _V_SIGN[face] * v * comp
    x, y, z = xyz[0], xyz[1], xyz[2]
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    if scalar:
        return lat[0], lng[0]
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
