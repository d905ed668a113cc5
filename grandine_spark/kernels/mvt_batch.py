"""Batched MVT tile encoding — an Arrow-batch-wide twin of mvt.encode_tile.

Byte-identical to the scalar kernel by construction: every floating-point
expression is the SAME IEEE-double operation sequence as kernels/mvt.py
(the affine is shared code, the zigzag/varint integer identities are exact),
and tests/test_mvt_batch.py asserts tile-for-tile byte equality on seeded
corpora plus the reference goldens.

Reference semantics: lib/mvt/codec.go:57-261 (EncodeTile/assembleLayer/
encodeGeometry), lib/mvt/project.go:13-54 (tilePoint/flipFloat). The
restructuring relative to kernels/mvt.py is purely about WHERE Python-level
loops run:

- mercator projection happens once per distinct geometry object (it does
  not depend on the tile; the caller memoizes per wkb), leaving a 4-op
  numpy affine per (feature, tile) pair;
- MoveTo/LineTo/ClosePath command ints for the WHOLE batch are woven by a
  single vectorized scatter (one np.cumsum for slot layout, one fancy-index
  write for the zigzag deltas);
- protobuf varints for all tag and command ints of the batch are emitted in
  five masked numpy passes (values are < 2^35: command ints are
  count<<3 | cmd with count < 2^29, zigzags are < 2^32);
- per-layer key/value dictionary encoding stays scalar (first-seen order is
  inherently sequential) but value serialization is memoized — props repeat
  across every tile a feature covers.

Clipping is untouched: the scalar kernels/clip.py path runs per
(feature, tile) exactly as before.
"""

from __future__ import annotations

import gzip as _gzip

import numpy as np

from . import clip as _clip
from . import geometry as _geometry
from .mvt import (
    EXTENT,
    TileParams,
    _encode_value,
    _full_rect,
    _ld,
    _tag,
    _varint,
    tile_affine_np,
)

_CMD_MOVETO1 = (1 & 0x7) | (1 << 3)  # MoveTo, count 1
_CMD_CLOSE1 = (7 & 0x7) | (1 << 3)  # ClosePath, count 1

# value-blob memo: props repeat across every tile a feature covers, and the
# blob depends only on (python type, value). Bounded; worker-process scoped.
_VALUE_BLOB_CACHE: dict = {}


def varints_np(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized protobuf varint encoding of a non-negative int64 array.

    Returns (byte buffer, per-value byte counts). Identical bytes to
    b"".join(_varint(v) for v in values) — asserted for values < 2**35,
    which covers every command int and zigzag32 the encoder emits.
    """
    if len(values) == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    v = values.astype(np.uint64, copy=False)
    if int(v.max()) >= (1 << 35):
        raise ValueError("varints_np: value out of the 5-byte range")
    n = np.ones(len(v), np.int64)
    for k in (7, 14, 21, 28):
        n += v >= (1 << k)
    ends = np.cumsum(n)
    offs = ends - n
    out = np.zeros(int(ends[-1]), np.uint8)
    for k in range(5):
        mask = n > k
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (n[mask] > k + 1).astype(np.uint8) * np.uint8(0x80)
        out[offs[mask] + k] = byte | cont
    return out, n


def _weave_commands(
    parts_pts: list[np.ndarray],
    part_kind: np.ndarray,
    part_feat: np.ndarray,
    n_features: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized encodeGeometry across all features of the batch.

    parts_pts: per part (ring / line / point) an (m, 2) float64 pixel array.
    part_kind: 0 = point (3 ints, no LineTo), 1 = line (no ClosePath),
    2 = polygon ring (ClosePath appended even when m == 0, matching the
    scalar loop). The delta cursor carries across parts of one feature and
    resets at feature boundaries — exactly encode_geometry's `cur`.

    Returns (command int64 array for the whole batch, per-feature lengths).
    """
    if not parts_pts:
        return np.zeros(0, np.int64), np.zeros(n_features, np.int64)
    m = np.array([len(p) for p in parts_pts], np.int64)
    kind = part_kind
    # output slots per part (scalar twin: _encode_line emits 2m+2 for m>=1
    # and nothing for m==0; geom 3 appends ClosePath unconditionally;
    # geom 1 emits exactly 3 ints)
    out_len = np.where(kind == 0, 3, np.where(m >= 1, 2 * m + 2, 0))
    out_len = out_len + (kind == 2).astype(np.int64)
    base = np.concatenate([[0], np.cumsum(out_len)[:-1]])
    total = int(out_len.sum())
    cmds = np.zeros(total, np.int64)

    # points of the whole batch, truncated toward zero like int(float)
    pts = (
        np.concatenate(parts_pts, axis=0)
        if len(parts_pts) > 1
        else np.asarray(parts_pts[0], np.float64)
    )
    t = np.trunc(pts).astype(np.int64)
    # delta chain: consecutive points, reset (cursor = origin) at the first
    # point of each feature
    d = t.copy()
    d[1:] -= t[:-1]
    pstart = np.concatenate([[0], np.cumsum(m)[:-1]])  # first point per part
    first_of_feat = np.concatenate([[True], part_feat[1:] != part_feat[:-1]])
    feat_first_pts = pstart[first_of_feat & (m > 0)]
    # a feature whose leading part(s) are empty: its first real point is the
    # first point of its first NON-empty part — walk flags through empties
    if (m == 0).any():
        nonempty = m > 0
        # recompute: the reset happens at the first point of the first
        # nonempty part per feature
        seen: set = set()
        resets = []
        for i in range(len(m)):
            f = int(part_feat[i])
            if f in seen or m[i] == 0:
                continue
            seen.add(f)
            resets.append(pstart[i])
        feat_first_pts = np.array(resets, np.int64)
    if len(feat_first_pts):
        d[feat_first_pts] = t[feat_first_pts]
    zz = ((d << 1) ^ (d >> 31)) & 0xFFFFFFFF

    # command slots
    kp = kind == 0
    kl = (kind != 0) & (m >= 1)
    cmds[base[kp | kl]] = _CMD_MOVETO1
    cmds[base[kl] + 3] = 2 | ((m[kl] - 1) << 3)  # LineTo, count m-1
    kc = kind == 2
    # ClosePath: after the line ints for m>=1, at base for the empty ring
    cmds[base[kc] + np.where(m[kc] >= 1, 2 * m[kc] + 2, 0)] = _CMD_CLOSE1

    # zigzag slots: point j of its part → base + (1 if j==0 else 2j+2)
    j = np.arange(len(t), dtype=np.int64) - np.repeat(pstart, m)
    pb = np.repeat(base, m)
    xi = pb + np.where(j == 0, 1, 2 * j + 2)
    cmds[xi] = zz[:, 0]
    cmds[xi + 1] = zz[:, 1]

    feat_len = np.zeros(n_features, np.int64)
    np.add.at(feat_len, part_feat, out_len)
    return cmds, feat_len


def _encode_value_memo(v) -> bytes:
    key = (type(v).__name__, v)
    blob = _VALUE_BLOB_CACHE.get(key)
    if blob is None:
        if len(_VALUE_BLOB_CACHE) > 200_000:
            _VALUE_BLOB_CACHE.clear()
        blob = _VALUE_BLOB_CACHE[key] = _encode_value(v)
    return blob


# optional phase accounting for scripts/profile_encode.py (set
# GS_MVTB_TIMING=1): a handful of monotonic() calls per Arrow batch
import os as _os

_PHASE_T = bool(_os.environ.get("GS_MVTB_TIMING"))
PHASE_ACC: dict = {}


def _tick(t, name: str) -> None:
    if not t:
        return
    import time as _time

    now = _time.monotonic()
    PHASE_ACC[name] = PHASE_ACC.get(name, 0.0) + (now - t[0])
    t[0] = now


def mercator_of(gt: int, coords):
    """Mercator (3857) projection of a geometry's raw coords — the
    tile-INDEPENDENT half of tilePoint, memoized per geometry by callers.
    Returns (mx, my) arrays per part: a single pair for points/lines, a
    list of pairs for polygon rings."""
    from .mvt import proj_4326_to_3857_np

    if gt == 1:
        return proj_4326_to_3857_np(
            np.array([coords[0]]), np.array([coords[1]])
        )
    if gt == 2:
        a = np.asarray(coords, np.float64)
        return proj_4326_to_3857_np(a[:, 0], a[:, 1])
    out = []
    for ring in coords:
        a = np.asarray(ring, np.float64)
        out.append(proj_4326_to_3857_np(a[:, 0], a[:, 1]))
    return out


def encode_tiles_mvt(work: list[tuple[int, int, int, dict]]) -> list:
    """Encode a batch of tiles: [(z, x, y, {layer: [feat, ...]})] → bytes|None
    per tile, byte-identical to mvt.encode_tile per tile.

    feat dicts: {"geom_type", "coords", "props"} plus optional "cc" == 1
    (pre-classified full cover) and optional "merc" — the mercator-projected
    twin of coords (per-geometry memo computed by the caller, mercator_of;
    computed here when absent).
    """
    _t = _PHASE_T and [__import__("time").monotonic()]
    # ---- pass 1a (scalar walk): collect every to-be-projected part of the
    # batch; the pixel-space affine then runs ONCE over the concatenation.
    # Slots keep the per-layer feature order (cc-literals interleave with
    # projected features) so merge_features sees the scalar path's order.
    clip_mask = (0.0, 0.0, float(EXTENT), float(EXTENT))
    pend_gt: list[int] = []
    pend_props: list = []
    pend_nparts: list[int] = []
    part_mx: list[np.ndarray] = []
    part_my: list[np.ndarray] = []
    part_params: list = []  # (x_off, x_scale, y_off, y_scale) per part
    tile_slots: list = []  # per tile: list of (layer_name, [slot...])

    tp_cache: dict = {}
    for z, x, y, by_layer in work:
        tpk = (z, x, y)
        tp = tp_cache.get(tpk)
        if tp is None:
            tp = tp_cache[tpk] = TileParams(x, y, z)
        params = (tp.x_offset, tp.x_scale, tp.y_offset, tp.y_scale)
        layers_here: list = []
        for layer_name in sorted(by_layer.keys()):
            slots: list = []
            for ft in by_layer[layer_name]:
                if ft.get("cc") == 1:
                    slots.append(
                        (
                            None,
                            {
                                "geom_type": 3,
                                "coords": [_full_rect()],
                                "props": ft["props"],
                            },
                        )
                    )
                    continue
                gt = ft["geom_type"]
                merc = ft.get("merc")
                if merc is None:
                    merc = mercator_of(gt, ft["coords"])
                parts = merc if gt == 3 else [merc]
                slots.append((len(pend_gt), None))
                pend_gt.append(gt)
                pend_props.append(ft["props"])
                pend_nparts.append(len(parts))
                for mx, my in parts:
                    part_mx.append(mx)
                    part_my.append(my)
                    part_params.append(params)
            layers_here.append((layer_name, slots))
        tile_slots.append(layers_here)

    _tick(_t, "walk")
    # ---- pass 1b (numpy): batch affine into pixel space
    pix_parts: list[np.ndarray] = []
    if part_mx:
        plen = np.array([len(a) for a in part_mx], np.int64)
        mx_all = np.concatenate(part_mx) if len(part_mx) > 1 else part_mx[0]
        my_all = np.concatenate(part_my) if len(part_my) > 1 else part_my[0]
        pp = np.asarray(part_params, np.float64)
        xo = np.repeat(pp[:, 0], plen)
        xs_ = np.repeat(pp[:, 1], plen)
        yo = np.repeat(pp[:, 2], plen)
        ys_ = np.repeat(pp[:, 3], plen)
        ext = float(EXTENT)
        # the same IEEE-double expression as mvt.tile_affine_np, with the
        # per-tile scalars broadcast per point
        px = (mx_all - xo) / (xs_ / ext) * ext
        py = ext - np.trunc((my_all - yo) / (ys_ / ext) * ext)
        P = np.empty((len(px), 2), np.float64)
        P[:, 0] = px
        P[:, 1] = py
        ends = np.cumsum(plen)
        starts = ends - plen
        pix_parts = [P[s:e] for s, e in zip(starts, ends)]

    _tick(_t, "affine")
    # ---- pass 1c: clip per pending feature. The polygon fast-path decider
    # (does the ring cross the tile border?) runs batched first — one numpy
    # pass over every single-ring (polygon, tile) pair instead of a Python
    # segment scan per pair; verdicts are exact (ring_border_hits_batch).
    hints = np.full(len(pend_gt), -1, np.int8)
    sr_rings: list = []
    sr_idx: list[int] = []
    pi = 0
    for fi, (gt, nparts) in enumerate(zip(pend_gt, pend_nparts)):
        if gt == 3 and nparts == 1:
            sr_idx.append(fi)
            sr_rings.append(pix_parts[pi])
        pi += nparts
    if sr_idx:
        hints[sr_idx] = _clip.ring_border_hits_batch(sr_rings, clip_mask)

    pend_clipped: list = []
    pi = 0
    for fi, (gt, nparts) in enumerate(zip(pend_gt, pend_nparts)):
        if gt == 1:
            arr = pix_parts[pi]
            projected = (float(arr[0, 0]), float(arr[0, 1]))
        elif gt == 2:
            projected = pix_parts[pi]
        else:
            projected = pix_parts[pi : pi + nparts]
        pi += nparts
        h = hints[fi]
        pend_clipped.append(
            _clip.clip_geom(gt, projected, clip_mask, None if h < 0 else bool(h))
        )

    _tick(_t, "clip")
    # ---- pass 1d (scalar): merge + per-layer dict-encode, batch collection
    feats_gt: list[int] = []  # per emitted feature
    feats_tags: list[list[int]] = []
    parts_pts: list[np.ndarray] = []
    part_kind: list[int] = []
    part_feat: list[int] = []
    # per tile: list of (layer_name, keys, val_order, feat_idx_range)
    tile_layers: list[list] = []

    for layers_here in tile_slots:
        out_layers: list = []
        for layer_name, slots in layers_here:
            clipped: list[dict] = []
            for pidx, lit in slots:
                if lit is not None:
                    clipped.append(lit)
                    continue
                props = pend_props[pidx]
                for g, cc in pend_clipped[pidx]:
                    clipped.append(
                        {"geom_type": g, "coords": cc, "props": props}
                    )

            keys: dict[str, int] = {}
            vals: dict[tuple, int] = {}
            val_order: list = []
            start = len(feats_gt)
            for ft in _geometry.merge_features(clipped):
                tags: list[int] = []
                for k in sorted(ft["props"].keys()):
                    if k.startswith("@"):
                        continue
                    v = ft["props"][k]
                    kpos = keys.setdefault(k, len(keys))
                    vkey = (type(v).__name__, v)
                    if vkey not in vals:
                        vals[vkey] = len(vals)
                        val_order.append(v)
                    tags += [kpos, vals[vkey]]
                fi = len(feats_gt)
                gt = ft["geom_type"]
                if gt == 1:
                    cx, cy = ft["coords"]
                    parts_pts.append(np.array([[cx, cy]], np.float64))
                    part_kind.append(0)
                    part_feat.append(fi)
                elif gt == 2:
                    parts_pts.append(np.asarray(ft["coords"], np.float64))
                    part_kind.append(1)
                    part_feat.append(fi)
                else:
                    for ring in ft["coords"]:
                        parts_pts.append(np.asarray(ring, np.float64))
                        part_kind.append(2)
                        part_feat.append(fi)
                feats_gt.append(gt)
                feats_tags.append(tags)
            out_layers.append(
                (layer_name, list(keys.keys()), val_order, start, len(feats_gt))
            )
        tile_layers.append(out_layers)

    _tick(_t, "merge+tags")
    n_feats = len(feats_gt)

    # ---- pass 2 (numpy): weave command ints + varint both int streams
    cmds, feat_cmd_len = _weave_commands(
        parts_pts,
        np.asarray(part_kind, np.int64),
        np.asarray(part_feat, np.int64),
        n_feats,
    )
    cbuf, cn = varints_np(cmds)
    # per-feature command byte spans
    cmd_int_end = np.cumsum(feat_cmd_len)
    cbyte_end = np.concatenate([[0], np.cumsum(cn)])[cmd_int_end]
    cbyte_start = np.concatenate([[0], cbyte_end[:-1]])

    tag_counts = np.array([len(t) for t in feats_tags], np.int64)
    all_tags = np.array(
        [v for t in feats_tags for v in t] or [], np.int64
    )
    tbuf, tn = varints_np(all_tags)
    tag_int_end = np.cumsum(tag_counts)
    tbyte_end = np.concatenate([[0], np.cumsum(tn)])[tag_int_end]
    tbyte_start = np.concatenate([[0], tbyte_end[:-1]])

    cview = cbuf.tobytes()
    tview = tbuf.tobytes()

    _tick(_t, "weave+varint")
    # ---- pass 3 (scalar): protobuf assembly from the varint slices
    out: list = []
    for layers_here in tile_layers:
        tile_out = bytearray()
        for layer_name, keys, val_order, fstart, fend in layers_here:
            feature_blobs: list[bytes] = []
            for fi in range(fstart, fend):
                clen = int(cbyte_end[fi] - cbyte_start[fi])
                if feat_cmd_len[fi] == 0:
                    continue  # scalar: `if not commands: continue`
                fb = bytearray()
                if tag_counts[fi]:
                    tb_slice = tview[int(tbyte_start[fi]) : int(tbyte_end[fi])]
                    fb += b"\x12" + _varint(len(tb_slice)) + tb_slice
                fb += b"\x18" + _varint(feats_gt[fi])
                fb += b"\x22" + _varint(clen)
                fb += cview[int(cbyte_start[fi]) : int(cbyte_end[fi])]
                feature_blobs.append(bytes(fb))
            if not feature_blobs:
                continue
            lb = bytearray()
            lb += _ld(1, layer_name.encode("utf-8"))
            for fb in feature_blobs:
                lb += _ld(2, fb)
            for k in keys:
                lb += _ld(3, k.encode("utf-8"))
            for v in val_order:
                lb += _ld(4, _encode_value_memo(v))
            lb += _tag(5, 0) + _varint(EXTENT)
            lb += _tag(15, 0) + _varint(2)
            tile_out += _ld(3, bytes(lb))
        out.append(bytes(tile_out) if tile_out else None)
    _tick(_t, "assemble")
    return out


def gzip_tile(buf: bytes) -> bytes:
    return _gzip.compress(buf, mtime=0)
