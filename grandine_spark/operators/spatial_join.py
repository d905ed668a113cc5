"""Point-in-polygon spatial join: broadcast cell-prefix hash join + vectorized
ray-casting refinement.

Semantics: the reference's feature×cell inverted index build/probe
(cmd/tiler/featurecache.go:73-94) + Point.InPolygon refinement
(lib/spatial/point.go:72-101), re-expressed as:

1. index pages' points with a z-cell id — NATIVE expressions (tile_exprs);
2. explode each polygon's bbox into its covering cells at the same zoom —
   native sequence+explode (the multi-cell replication of J2/J4);
3. equi-join on the cell id — **broadcast** the polygon side when small
   (the common case: admin polygons ≪ pages), else shuffle hash join with
   AQE skew splitting;
4. cheap native bbox predicate (point-in-bbox) BEFORE the Python boundary —
   Catalyst cannot know UDF costs (SURVEY.md §4), so the two-stage filter is
   explicit;
5. exact PIP refinement as an Arrow-batched pandas UDF that groups each batch
   by polygon so the ray-casting kernel runs once per (polygon, point-batch).

At 100 TB the only shuffle is the pages-side cell repartition — and with a
broadcast dim side there is NO shuffle at all: scan → project → broadcast-join
→ filter, one stage end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..functions import tile_exprs as TX
from ..kernels.geometry import points_in_polygon_np
from ..kernels.wkb import from_wkb

DEFAULT_JOIN_ZOOM = 7

# Arrow batch size a PIP-heavy job should set (spark.sql.execution.arrow.
# maxRecordsPerBatch, via get_spark extra_conf): candidate rows are ~24 bytes
# (lon, lat, feature_id), so 512k-row batches are ~12 MB and cut per-batch
# handoff overhead ~1.5x at 16 cores. Deliberately NOT the session default —
# jobs carrying KB-scale text/binary rows would make such batches 100s of MB.
PIP_ARROW_BATCH = 524288


@pandas_udf(BooleanType())
def pip_udf(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
    """Vectorized point-in-polygon: one ray-casting batch per distinct polygon
    in the Arrow batch (candidates arrive cell-clustered, so batches contain
    few distinct polygons). General path: geometry travels per-row as WKB."""
    import numpy as np

    out = np.zeros(len(px), dtype=bool)
    if len(px) == 0:
        return pd.Series(out)
    pxv = px.to_numpy(dtype=float)
    pyv = py.to_numpy(dtype=float)
    groups: dict[bytes, list[int]] = {}
    for i, b in enumerate(wkb):
        groups.setdefault(bytes(b), []).append(i)
    for blob, idx in groups.items():
        gt, coords = from_wkb(blob)
        if gt != 3:
            continue
        ix = np.asarray(idx)
        out[ix] = points_in_polygon_np(pxv[ix], pyv[ix], coords)
    return pd.Series(out)


def make_pip_udf_closure(poly_map: dict[int, list]):
    """PIP UDF with the polygon dictionary captured in the closure — the
    broadcast-dim fast path. Candidate rows then carry only
    (lon, lat, feature_id): ~24 bytes of Arrow traffic per row instead of the
    full WKB blob, and zero per-batch WKB parsing."""

    @pandas_udf(BooleanType())
    def pip_by_id(px: pd.Series, py: pd.Series, fid: pd.Series) -> pd.Series:
        import numpy as np

        n = len(px)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        pxv = px.to_numpy(dtype=float)
        pyv = py.to_numpy(dtype=float)
        fidv = fid.to_numpy()
        order = np.argsort(fidv, kind="stable")
        sorted_fid = fidv[order]
        bounds = np.flatnonzero(
            np.r_[True, sorted_fid[1:] != sorted_fid[:-1], True]
        )
        for s, e in zip(bounds[:-1], bounds[1:]):
            rings = poly_map.get(int(sorted_fid[s]))
            if rings is None:
                continue
            ix = order[s:e]
            out[ix] = points_in_polygon_np(pxv[ix], pyv[ix], rings)
        return pd.Series(out)

    return pip_by_id


def make_within_wkb_udf(radius_deg: float):
    """Distance-to-polyline predicate with geometry per-row as WKB — the
    shuffle-path twin of radius_join's closure UDF: one kernel batch per
    distinct polyline in the Arrow batch (candidates arrive cell-clustered)."""
    from ..kernels.geometry import dist_points_to_line_np

    @pandas_udf(BooleanType())
    def within_wkb(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
        import numpy as np

        out = np.zeros(len(px), dtype=bool)
        if len(px) == 0:
            return pd.Series(out)
        pxv = px.to_numpy(dtype=float)
        pyv = py.to_numpy(dtype=float)
        groups: dict[bytes, list[int]] = {}
        for i, b in enumerate(wkb):
            groups.setdefault(bytes(b), []).append(i)
        for blob, idx in groups.items():
            gt, coords = from_wkb(blob)
            if gt != 2:
                continue
            ix = np.asarray(idx)
            out[ix] = dist_points_to_line_np(pxv[ix], pyv[ix], coords) <= radius_deg
        return pd.Series(out)

    return within_wkb


def geocode_pages(pages: DataFrame) -> DataFrame:
    """pages → (url, text, lang, lon, lat); rows without a geotag are dropped
    by the geocoder (FIXTURES.md §1). Pure JVM expressions."""
    lon, lat = TX.geocode_text(F.col("text"))
    return (
        pages.withColumn("lon", lon)
        .withColumn("lat", lat)
        .filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    )


def index_points(points: DataFrame, zoom: int, lon="lon", lat="lat") -> DataFrame:
    """Attach the z-cell id (native, codegen'd)."""
    return points.withColumn("cell_x", TX.tile_x(F.col(lon), zoom)).withColumn(
        "cell_y", TX.tile_y(F.col(lat), zoom)
    )


def polygons_by_cell(features: DataFrame, zoom: int) -> DataFrame:
    """Polygon features → one row per covering cell (J2/J4 replication)."""
    polys = features.filter(F.col("geom_type") == 3)
    return TX.explode_coverage(polys, zoom).withColumnRenamed(
        "tile_x", "cell_x"
    ).withColumnRenamed("tile_y", "cell_y")


def spatial_join(
    points: DataFrame,
    features: DataFrame,
    zoom: int = DEFAULT_JOIN_ZOOM,
    broadcast: bool = True,
    point_cols: tuple = ("url",),
    feature_cols: tuple = ("feature_id",),
    salt_threshold: int | None = None,
    max_dim_features: int = 1_000_000,
    refine: str = "arrow",
) -> DataFrame:
    """points(lon,lat,…) ⨝ polygon features → refined containment rows.

    Returns one row per (point, containing polygon) with ``point_cols`` +
    ``feature_cols``. ``salt_threshold`` (shuffle path only): cells holding
    more points than this get explicit hot-cell salting
    (skew.salted_cell_join) so a dense urban cell spreads over many
    reducers instead of one straggler; output is identical.

    ``max_dim_features``: the broadcast path collect()s the polygon side on
    the driver; if the feature count exceeds this guard the join falls back
    to the shuffle path automatically (same output) instead of OOMing the
    driver — "small by definition" is now enforced, not assumed.

    ``refine`` (broadcast path): ``"arrow"`` (default) refines with the
    vectorized pandas-UDF ray-cast kernel; ``"native"`` evaluates the SAME
    exact semantics as a pure Catalyst expression over a broadcast
    per-feature edge array (functions/pip_native.py) — zero Python stages
    in the whole plan, identical output (asserted in tests). Arrow stays
    the default because Spark's higher-order functions (transform/filter/
    exists) are CodegenFallback — interpreted per row — measuring ~4x
    slower than the Arrow kernel at the benchmark shape; the native path
    earns its keep as a python-worker-free deployment option and as an
    independent differential check of the PIP kernel.
    """
    pts = index_points(points, zoom)

    if broadcast and (
        features.filter(F.col("geom_type") == 3).limit(max_dim_features + 1).count()
        > max_dim_features
    ):
        broadcast = False

    if broadcast:
        # broadcast path: geometry rides in the UDF closure, not in the rows —
        # the join carries only bbox columns + feature_id. The dim is built
        # driver-side (it is small by definition), which also precomputes the
        # INTERIOR-CELL shortcut: a cell whose closed rect provably lies
        # inside the polygon (all corners pass PIP, no ring segment touches
        # the rect) needs no ray-casting at all — with admin-scale polygons
        # most covered cells are interior, so the Python stage only ray-casts
        # the boundary fringe. Conservative test ⇒ output identical.
        from ..kernels.geometry import cell_fully_inside
        from ..kernels.tilemath import coverage as cell_coverage
        from ..kernels.tilemath import tile_bbox
        from ..kernels.wkb import geom_bbox

        spark = points.sparkSession
        poly_map: dict[int, list] = {}
        dim_rows = []
        for r in (
            features.filter(F.col("geom_type") == 3)
            .select("feature_id", "wkb")
            .collect()
        ):
            fid = int(r.feature_id)
            rings = from_wkb(bytes(r.wkb))[1]
            poly_map[fid] = rings
            bb = geom_bbox(3, rings)
            for cx, cy, _ in cell_coverage(*bb, zoom):
                full = cell_fully_inside(tile_bbox(cx, cy, zoom), rings)
                dim_rows.append((cx, cy, fid, *bb, full))
        dim_df = spark.createDataFrame(
            dim_rows,
            "cell_x long, cell_y long, feature_id long, minx double, "
            "miny double, maxx double, maxy double, full_inside boolean",
        )
        sentinel = min(poly_map, default=0) - 1  # fid the UDF never resolves
        pip = make_pip_udf_closure(poly_map)
        joined = pts.join(F.broadcast(dim_df), ["cell_x", "cell_y"], "inner")
        coarse = joined.filter(
            TX.point_in_bbox(
                F.col("lon"), F.col("lat"),
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
            )
        )
        if refine == "native":
            # geometry as a SECOND broadcast dim keyed by feature_id (edges
            # stored once per feature, not per covering cell) + the pure-
            # Catalyst ray-cast — no Python worker anywhere in the plan
            from ..functions.pip_native import (
                GEO_DIM_SCHEMA,
                feature_edge_row,
                pip_native,
            )

            geo_df = spark.createDataFrame(
                [feature_edge_row(fid, rings) for fid, rings in poly_map.items()],
                GEO_DIM_SCHEMA,
            )
            joined_geo = coarse.join(F.broadcast(geo_df), "feature_id", "inner")
            refined = joined_geo.filter(
                F.col("full_inside")
                | pip_native(
                    F.col("lon"), F.col("lat"),
                    F.col("ox"), F.col("oy"), F.col("rox"), F.col("roy"),
                    F.col("edges"),
                )
            )
            return refined.select(*[F.col(c) for c in point_cols + feature_cols])

        pip_fid = F.when(F.col("full_inside"), F.lit(sentinel)).otherwise(
            F.col("feature_id")
        )
        refined = coarse.filter(
            F.col("full_inside") | pip(F.col("lon"), F.col("lat"), pip_fid)
        )
        return refined.select(*[F.col(c) for c in point_cols + feature_cols])

    cells = polygons_by_cell(features, zoom)
    if salt_threshold is not None:
        from .skew import salted_cell_join

        joined = salted_cell_join(
            pts, cells, ["cell_x", "cell_y"], threshold=salt_threshold
        )
    else:
        joined = pts.join(cells, ["cell_x", "cell_y"], "inner")

    # stage 1: native bbox filter (cheap, codegen) before the Python boundary
    coarse = joined.filter(
        TX.point_in_bbox(
            F.col("lon"), F.col("lat"),
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
        )
    )

    # stage 2: exact ray-casting PIP (Arrow-batched)
    refined = coarse.filter(pip_udf(F.col("lon"), F.col("lat"), F.col("wkb")))

    return refined.select(*[F.col(c) for c in point_cols + feature_cols])


def multires_spatial_join(
    points: DataFrame,
    features: DataFrame,
    z_coarse: int = 2,
    z_fine: int = 12,
    max_cells: int = 4,
    point_cols: tuple = ("url",),
    feature_cols: tuple = ("feature_id",),
    max_dim_features: int = 1_000_000,
) -> DataFrame:
    """Multi-resolution cell join: each polygon indexes at ITS OWN zoom — the
    finest z in [z_coarse, z_fine] where its bbox covers ≤ ``max_cells``
    cells — and points probe their cell at every zoom the feature set
    actually uses. The reference's FeatureCache is exactly this shape (a
    per-zoom cell index, cmd/tiler/featurecache.go:73-94); a single-zoom
    join must either replicate continent-sized polygons across thousands of
    fine cells or flood city cells with coarse candidates. Here feature
    replication is ≤ max_cells rows per feature, and point replication is
    |active zooms| (bounded, typically ≤ 6) native exprs — no Python until
    the PIP refinement. Output equals ``spatial_join`` exactly.
    """
    from ..kernels.geometry import cell_fully_inside
    from ..kernels.tilemath import coverage as cell_coverage
    from ..kernels.tilemath import coverage_count, tile_bbox
    from ..kernels.wkb import geom_bbox

    # driver-collect guard, same rationale as spatial_join's: too many
    # features → fall back to the (skew-salted, AQE-covered) shuffle join
    if (
        features.filter(F.col("geom_type") == 3).limit(max_dim_features + 1).count()
        > max_dim_features
    ):
        return spatial_join(
            points, features, zoom=DEFAULT_JOIN_ZOOM, broadcast=False,
            point_cols=point_cols, feature_cols=feature_cols,
        )

    spark = points.sparkSession
    poly_map: dict[int, list] = {}
    dim_rows = []
    zooms_used: set[int] = set()
    for r in (
        features.filter(F.col("geom_type") == 3)
        .select("feature_id", "wkb")
        .collect()
    ):
        fid = int(r.feature_id)
        rings = from_wkb(bytes(r.wkb))[1]
        poly_map[fid] = rings
        bb = geom_bbox(3, rings)
        # walk the zoom down ARITHMETICALLY (corner-tile count) and only
        # materialize coverage at the chosen zoom — a world-bbox polygon at
        # z_fine=12 would otherwise enumerate ~16.7M tuples per feature
        z = z_fine
        while z > z_coarse and coverage_count(*bb, z) > max_cells:
            z -= 1
        cov = cell_coverage(*bb, z)
        zooms_used.add(z)
        for cx, cy, _ in cov:
            full = cell_fully_inside(tile_bbox(cx, cy, z), rings)
            dim_rows.append((z, cx, cy, fid, *bb, full))
    dim_df = spark.createDataFrame(
        dim_rows,
        "z int, cell_x long, cell_y long, feature_id long, minx double, "
        "miny double, maxx double, maxy double, full_inside boolean",
    )
    sentinel = min(poly_map, default=0) - 1
    pip = make_pip_udf_closure(poly_map)

    # Compute the cell ONCE at the finest active zoom, then derive every
    # coarser active zoom by shiftright — slippy tiles nest exactly
    # (parent = child >> Δz; the max-clamp commutes with the shift and
    # values are non-negative), so this replaces |zs| log/tan evaluations
    # per point with one, same prefix trick as raster.py's downsample.
    zs = sorted(zooms_used)
    zmax = zs[-1]
    pts = points.withColumn(
        "_cxf", TX.tile_x(F.col("lon"), zmax)
    ).withColumn("_cyf", TX.tile_y(F.col("lat"), zmax))
    pts = (
        pts.withColumn(
            "_zc",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(z).cast("int").alias("z"),
                            F.shiftright(F.col("_cxf"), zmax - z).alias("cell_x"),
                            F.shiftright(F.col("_cyf"), zmax - z).alias("cell_y"),
                        )
                        for z in zs
                    ]
                )
            ),
        )
        .select(*points.columns, "_zc.z", "_zc.cell_x", "_zc.cell_y")
    )
    joined = pts.join(F.broadcast(dim_df), ["z", "cell_x", "cell_y"], "inner")
    coarse = joined.filter(
        TX.point_in_bbox(
            F.col("lon"), F.col("lat"),
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
        )
    )
    pip_fid = F.when(F.col("full_inside"), F.lit(sentinel)).otherwise(
        F.col("feature_id")
    )
    refined = coarse.filter(
        F.col("full_inside") | pip(F.col("lon"), F.col("lat"), pip_fid)
    )
    return refined.select(*[F.col(c) for c in point_cols + feature_cols])


def radius_join(
    points: DataFrame,
    features: DataFrame,
    radius_deg: float,
    zoom: int = DEFAULT_JOIN_ZOOM,
    point_cols: tuple = ("url",),
    feature_cols: tuple = ("feature_id",),
    max_dim_features: int = 1_000_000,
) -> DataFrame:
    """Distance join: points within ``radius_deg`` of a LINE feature, in the
    reference's own metric — Segment.DistanceToPt's planar degree distance
    with clamped projection (lib/spatial/line.go:350-379).

    Same shape as the broadcast cell join: line bboxes EXPANDED by the
    radius explode into cells (driver-side dim, broadcast), candidates pass
    a native expanded-bbox filter, then a vectorized min-distance-to-
    polyline pandas UDF refines. No shuffle on the points side.

    ``max_dim_features``: above this count the driver-side dim build is
    unsafe; fall back to a fully distributed shuffle cell join where the
    geometry rides per-row as WKB (same output).
    """
    from ..kernels.geometry import dist_points_to_line_np
    from ..kernels.tilemath import coverage as cell_coverage
    from ..kernels.wkb import geom_bbox

    lines = features.filter(F.col("geom_type") == 2)
    if lines.limit(max_dim_features + 1).count() > max_dim_features:
        expanded = (
            lines.withColumn("minx", F.col("minx") - radius_deg)
            .withColumn("miny", F.col("miny") - radius_deg)
            .withColumn("maxx", F.col("maxx") + radius_deg)
            .withColumn("maxy", F.col("maxy") + radius_deg)
        )
        cells = (
            TX.explode_coverage(expanded, zoom)
            .withColumnRenamed("tile_x", "cell_x")
            .withColumnRenamed("tile_y", "cell_y")
        )
        pts = index_points(points, zoom)
        joined = pts.join(cells, ["cell_x", "cell_y"], "inner")
        coarse = joined.filter(
            TX.point_in_bbox(
                F.col("lon"), F.col("lat"),
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
            )
        )
        within_wkb = make_within_wkb_udf(radius_deg)
        refined = coarse.filter(
            within_wkb(F.col("lon"), F.col("lat"), F.col("wkb"))
        )
        return refined.select(*[F.col(c) for c in point_cols + feature_cols])

    spark = points.sparkSession
    line_map: dict[int, object] = {}
    dim_rows = []
    for r in (
        features.filter(F.col("geom_type") == 2)
        .select("feature_id", "wkb")
        .collect()
    ):
        fid = int(r.feature_id)
        coords = from_wkb(bytes(r.wkb))[1]
        line_map[fid] = coords
        minx, miny, maxx, maxy = geom_bbox(2, coords)
        minx, miny = minx - radius_deg, miny - radius_deg
        maxx, maxy = maxx + radius_deg, maxy + radius_deg
        for cx, cy, _ in cell_coverage(minx, miny, maxx, maxy, zoom):
            dim_rows.append((cx, cy, fid, minx, miny, maxx, maxy))
    dim_df = spark.createDataFrame(
        dim_rows,
        "cell_x long, cell_y long, feature_id long, minx double, "
        "miny double, maxx double, maxy double",
    )

    @pandas_udf(BooleanType())
    def within_udf(px: pd.Series, py: pd.Series, fid: pd.Series) -> pd.Series:
        import numpy as np

        n = len(px)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        pxv = px.to_numpy(dtype=float)
        pyv = py.to_numpy(dtype=float)
        fidv = fid.to_numpy()
        order = np.argsort(fidv, kind="stable")
        sorted_fid = fidv[order]
        bounds = np.flatnonzero(np.r_[True, sorted_fid[1:] != sorted_fid[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            coords = line_map.get(int(sorted_fid[s]))
            if coords is None:
                continue
            ix = order[s:e]
            out[ix] = dist_points_to_line_np(pxv[ix], pyv[ix], coords) <= radius_deg
        return pd.Series(out)

    pts = index_points(points, zoom)
    joined = pts.join(F.broadcast(dim_df), ["cell_x", "cell_y"], "inner")
    coarse = joined.filter(
        TX.point_in_bbox(
            F.col("lon"), F.col("lat"),
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
        )
    )
    refined = coarse.filter(within_udf(F.col("lon"), F.col("lat"), F.col("feature_id")))
    return refined.select(*[F.col(c) for c in point_cols + feature_cols])


def zonal_stats(
    points: DataFrame,
    features: DataFrame,
    value_col: str,
    zoom: int = DEFAULT_JOIN_ZOOM,
    point_id: str = "url",
    **join_kwargs,
) -> DataFrame:
    """Zonal statistics: per-polygon aggregates of a point-carried value —
    count, sum, mean, min, max per feature. The composition a GIS user
    writes as ``zonal_statistics(raster, zones)``: here the zone assignment
    IS the broadcast cell spatial join (zero-shuffle probe side), and the
    aggregation is map-side partial on the joined stream, so the whole op
    adds no exchange beyond the join's own plan at 100 TB."""
    joined = spatial_join(
        points,
        features,
        zoom=zoom,
        point_cols=(point_id, value_col),
        **join_kwargs,
    )
    return joined.groupBy("feature_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum(value_col), 6).alias("sum_value"),
        F.round(F.avg(value_col), 6).alias("avg_value"),
        F.round(F.min(value_col), 6).alias("min_value"),
        F.round(F.max(value_col), 6).alias("max_value"),
    )
