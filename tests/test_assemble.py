"""Way/relation assembly (the spatialize semantics as joins)."""

import pytest
from pyspark.sql import functions as F

from grandine_spark.kernels.geometry import is_clockwise
from grandine_spark.kernels.wkb import from_wkb
from grandine_spark.operators.assemble import assemble_multipolygons, assemble_ways


@pytest.fixture(scope="module")
def nodes(spark):
    pts = [
        (0, 0.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 1.0), (3, 0.0, 1.0),
        (10, 5.0, 5.0), (11, 6.0, 5.5), (12, 7.0, 5.0),
        (20, 0.25, 0.25), (21, 0.75, 0.25), (22, 0.75, 0.75), (23, 0.25, 0.75),
    ]
    return spark.createDataFrame(pts, "node_id long, lon double, lat double")


def test_assemble_open_way_is_line(spark, nodes):
    ways = spark.createDataFrame(
        [(100, [10, 11, 12], {"highway": "primary"})],
        "way_id long, node_ids array<long>, props map<string,string>",
    )
    out = assemble_ways(ways, nodes).collect()
    assert len(out) == 1
    gt, coords = from_wkb(bytes(out[0].wkb))
    assert gt == 2
    assert coords.tolist() == [[5.0, 5.0], [6.0, 5.5], [7.0, 5.0]]  # order kept


def test_assemble_closed_area_way_is_polygon(spark, nodes):
    ways = spark.createDataFrame(
        [
            (101, [0, 1, 2, 3, 0], {"__type": "area", "landuse": "forest"}),
            (102, [0, 1, 2, 3, 0], {"highway": "service"}),  # closed, NOT area
        ],
        "way_id long, node_ids array<long>, props map<string,string>",
    )
    out = {r.feature_id: r for r in assemble_ways(ways, nodes).collect()}
    gt, rings = from_wkb(bytes(out[101].wkb))
    assert gt == 3 and len(rings) == 1 and len(rings[0]) == 4
    assert is_clockwise(rings[0])  # winding fixed
    gt2, coords2 = from_wkb(bytes(out[102].wkb))
    assert gt2 == 2 and len(coords2) == 5  # closed ring stays a line


def test_assemble_multipolygon_roles(spark, nodes):
    ways = spark.createDataFrame(
        [
            (201, [0, 1, 2, 3, 0], {}),
            (202, [20, 21, 22, 23, 20], {}),
        ],
        "way_id long, node_ids array<long>, props map<string,string>",
    )
    rels = spark.createDataFrame(
        [(300, [201, 202], ["outer", "inner"], {"type": "multipolygon"})],
        "rel_id long, way_ids array<long>, roles array<string>, props map<string,string>",
    )
    out = assemble_multipolygons(rels, ways, nodes).collect()
    assert len(out) == 1
    gt, rings = from_wkb(bytes(out[0].wkb))
    assert gt == 3 and len(rings) == 2
    assert is_clockwise(rings[0])  # shell cw
    assert not is_clockwise(rings[1])  # hole ccw


def test_assembly_partitioning_invariant(spark, nodes):
    ways = spark.createDataFrame(
        [(100 + i, [0, 1, 2, 3], {"i": str(i)}) for i in range(20)],
        "way_id long, node_ids array<long>, props map<string,string>",
    )
    a = {r.feature_id: bytes(r.wkb) for r in assemble_ways(ways.coalesce(1), nodes).collect()}
    b = {r.feature_id: bytes(r.wkb) for r in assemble_ways(ways.repartition(8), nodes.repartition(5)).collect()}
    assert a == b
