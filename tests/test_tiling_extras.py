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
