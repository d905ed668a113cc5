"""GeoJSON tile codec (S10), global bbox (A2), ring center kernel (A6)."""

import json

import numpy as np
import pytest

from grandine_spark.kernels.geometry import ring_center
from grandine_spark.operators.tiling import build_tiles, global_bbox
from grandine_spark.sources import synth


def test_ring_center_square():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    cx, cy = ring_center(sq)
    assert abs(cx - 1.0) < 1e-12 and abs(cy - 1.0) < 1e-12


def test_global_bbox(spark):
    feats = synth.features(spark, n_polygons=30, n_roads=0, n_pois=0)
    minx, miny, maxx, maxy = global_bbox(feats)
    rows = feats.collect()
    assert minx == min(r.minx for r in rows)
    assert maxy == max(r.maxy for r in rows)


def test_geojson_tile_codec(spark):
    feats = synth.features(spark, n_polygons=10, n_roads=10, n_pois=10)
    tiles = build_tiles(feats, [2], codec="geojson").collect()
    assert len(tiles) > 0
    for t in tiles:
        fc = json.loads(bytes(t.tile))
        assert fc["type"] == "FeatureCollection"
        for ft in fc["features"]:
            assert "@layer" in ft["properties"]
            # tile-local integer coordinates within the extent
            g = ft["geometry"]
            cc = np.array(g["coordinates"], dtype=object)

    # deterministic across parallelism
    a = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.tile) for r in tiles}
    b = {
        (r.tile_z, r.tile_x, r.tile_y): bytes(r.tile)
        for r in build_tiles(feats.repartition(7), [2], codec="geojson").collect()
    }
    assert a == b


def test_build_tiles_sha_matches_pure_python(spark):
    """Deterministic cross-check for the distributed tiler (the `tiles`
    driver query has no SQL oracle): per-tile bytes from build_tiles must
    equal an independently grouped/ordered pure-python kernel encode of the
    same features — grouping, shuffle order, layer routing, and the batched
    Arrow encode path all cancel out to the same sha."""
    import hashlib

    from grandine_spark.kernels.mvt import encode_tile
    from grandine_spark.kernels.tilemath import coverage
    from grandine_spark.kernels.wkb import from_wkb
    from grandine_spark.operators.tiling import build_tiles
    from grandine_spark.sources import synth

    z = 6
    feats = synth.features(spark, n_polygons=25, n_roads=15, n_pois=25)
    got = {
        (r.tile_z, r.tile_x, r.tile_y): (
            r.n_features,
            hashlib.sha256(bytes(r.tile)).hexdigest(),
        )
        for r in build_tiles(feats, [z]).collect()
    }

    by_tile: dict[tuple, list] = {}
    for r in feats.collect():
        zmin = float(r.zoom_min) if r.zoom_min is not None else 0.0
        zmax = float(r.zoom_max) if r.zoom_max is not None else 99.0
        if not (zmin <= z <= zmax):
            continue
        for cx, cy, _ in coverage(r.minx, r.miny, r.maxx, r.maxy, z):
            by_tile.setdefault((z, cx, cy), []).append(r)
    want = {}
    for (tz, tx, ty), rs in by_tile.items():
        rs = sorted(rs, key=lambda r: r.feature_id)
        by_layer: dict[str, list] = {}
        for r in rs:
            gt, coords = from_wkb(bytes(r.wkb))
            props = dict(r.props) if r.props else {}
            layer = props.get("@layer", "default")
            by_layer.setdefault(layer, []).append(
                {"geom_type": gt, "coords": coords, "props": props}
            )
        buf = encode_tile(by_layer, tx, ty, tz)
        if buf is not None:
            want[(tz, tx, ty)] = (len(rs), hashlib.sha256(buf).hexdigest())
    assert len(got) > 0 and got == want


def test_build_tiles_hot_tile_cap(spark):
    """max_features_per_tile bounds every tile group (a z2 world tile cannot
    OOM one task); truncation is deterministic (lowest feature_ids kept) and
    uncrowded tiles are byte-identical to the uncapped build."""
    import contextlib
    import io
    import re

    from grandine_spark.operators.tiling import build_tiles
    from grandine_spark.sources import synth

    feats = synth.features(spark, n_polygons=40, n_roads=0, n_pois=0)
    full = {
        (r.tile_z, r.tile_x, r.tile_y): (r.n_features, bytes(r.tile))
        for r in build_tiles(feats, [2]).collect()
    }
    capped_df = build_tiles(feats, [2], max_features_per_tile=5)
    capped = {
        (r.tile_z, r.tile_x, r.tile_y): (r.n_features, bytes(r.tile))
        for r in capped_df.collect()
    }
    assert max(n for n, _ in capped.values()) <= 5
    assert any(n > 5 for n, _ in full.values())  # the cap actually bit
    for k, (n, buf) in full.items():
        if n <= 5:
            assert capped[k] == (n, buf)
    # plan: the cap is a spillable rank window (no extra Python stage), and
    # at most one exchange beyond the tiler's own group shuffle
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        capped_df.explain("formatted")
    plan = buf.getvalue().split("== Initial Plan ==")[0]  # final plan only
    assert "Window" in plan
    assert len(set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))) == 1
    assert len(set(re.findall(r"\bExchange \(\d+\)", plan))) <= 2
