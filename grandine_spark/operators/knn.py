"""kNN via cell-histogram distance-bound pruning (BASELINE.json extension;
grounded on the reference's grid arithmetic J1 + haversine J7 — SURVEY.md
§2.4 note).

Shape: points are BIG (distributed, cell-indexed once and cached); queries
are SMALL (a query set, broadcastable). Exact result (equals brute force).

Algorithm — two distributed jobs total, no iteration:

1. **cell histogram** (one tiny agg): per-cell point counts at the join
   zoom, collected to the driver (≤ 4^zoom rows; zoom ≤ 10 enforced).
2. **driver-side candidate planning** (vectorized numpy over the nonempty
   cells): for each query q and every nonempty cell c, compute
     - ub(c): upper bound on the haversine distance from q to anything in c
       (decomposed bound: the lat term and lon term of the haversine are
       maximized independently — valid since hav(d) is monotone in each);
     - lb(c): lower bound on the distance from q to anything in c (same
       decomposition, both terms minimized; the lon term uses the minimal
       cos(lat) of the cell so it never over-estimates).
   Sort cells by ub, accumulate counts until ≥ k → D = that cell's ub is a
   provable upper bound on q's k-th neighbor distance. Candidate cells are
   exactly those with lb(c) ≤ D: every point outside them is farther than D
   ≥ kth-dist, so they provably contain the true k nearest.
3. **one probe join**: the union of every query's candidate cells (probe
   rows ≪ points, broadcast) equi-joined on (cell_x, cell_y) against the
   indexed points; per-query top-k by (haversine, id) window. One shuffle,
   and its input is within a small factor of the k·|queries| optimum.

Why not ring-by-ring expansion (the classic formulation): each round is a
full scan + shuffle + driver collect, sparse-region (ocean-cell) queries
iterate to max radius and then fall back to a brute-force cross join, and a
rectangular disk wide enough to be *provably* safe can cover a large part
of the grid — measured 4x slower than this plan on the benchmark workload.
The histogram turns the expansion into driver arithmetic, so the cluster
runs only the one join that is needed, over only the cells that matter.
At 100 TB the histogram is a few-KB aggregate and the probe side stays
broadcastable.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import tile_exprs as TX

EARTH_R_M = 6371000.0
MAX_HISTOGRAM_ZOOM = 10


def knn(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    zoom: int = 6,
    max_radius: int | None = None,  # kept for API compat; unused
    point_id: str = "url",
    query_id: str = "q_id",
) -> DataFrame:
    """For each query (q_id, lon, lat): the k nearest points by haversine.
    Returns (q_id, point_id, rank). Exact (equals brute force)."""
    if zoom > MAX_HISTOGRAM_ZOOM:
        raise ValueError(
            f"knn join zoom {zoom} > {MAX_HISTOGRAM_ZOOM}: the cell histogram "
            "must stay driver-collectable; use a coarser join zoom"
        )
    spark = points.sparkSession
    n = 1 << zoom

    pts = (
        points.withColumn("p_cx", TX.tile_x(F.col("lon"), zoom))
        .withColumn("p_cy", TX.tile_y(F.col("lat"), zoom))
        .select(
            F.col(point_id).alias("_pid"),
            F.col("lon").alias("p_lon"),
            F.col("lat").alias("p_lat"),
            "p_cx",
            "p_cy",
        )
        .cache()
    )

    # job 1: per-cell histogram — only nonempty cells come back
    cells = pts.groupBy("p_cx", "p_cy").count().collect()
    cx_arr = np.array([int(r.p_cx) for r in cells], dtype=np.int64)
    cy_arr = np.array([int(r.p_cy) for r in cells], dtype=np.int64)
    cnt_arr = np.array([int(r["count"]) for r in cells], dtype=np.int64)
    total = int(cnt_arr.sum())

    # cell edge geography (slippy-map inverse formulas, lib/tile/tile.go:19-31)
    west = cx_arr / n * 360.0 - 180.0
    east = (cx_arr + 1) / n * 360.0 - 180.0
    lat_n = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * cy_arr / n))))
    lat_s = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (cy_arr + 1) / n))))
    # |cos(lat)| extremes over each cell's lat range (monotone per hemisphere;
    # a cell never spans the equator unless its lat range contains 0)
    cos_n, cos_s = np.cos(np.radians(lat_n)), np.cos(np.radians(lat_s))
    spans_eq = (lat_s <= 0.0) & (lat_n >= 0.0)
    cos_max = np.where(spans_eq, 1.0, np.maximum(cos_n, cos_s))
    cos_min = np.minimum(cos_n, cos_s)

    qrows = queries.select(
        F.col(query_id).alias("_qid"), F.col("lon"), F.col("lat")
    ).collect()

    probe_rows: list[tuple] = []
    for r in qrows:
        lon, lat = float(r.lon), float(r.lat)
        kk = min(k, total)
        if kk == 0:
            continue
        cand_ix, dist_ub = _candidate_cells(
            lon, lat, kk, cx_arr, cy_arr, cnt_arr,
            west, east, lat_n, lat_s, cos_min, cos_max,
        )
        probe_rows += [
            (r._qid, lon, lat, int(cx_arr[i]), int(cy_arr[i]), dist_ub)
            for i in cand_ix
        ]

    # the probe carries the query id in its NATIVE type — hardcoding 'long'
    # here crashed any string/decimal query-id column at createDataFrame
    qid_sql_type = dict(queries.dtypes)[query_id]
    probe = spark.createDataFrame(
        probe_rows,
        f"_qid {qid_sql_type}, q_lon double, q_lat double,"
        " p_cx long, p_cy long, q_d double",
    )

    # job 2: the one probe join + per-query top-k. The planner's D is a
    # PROVEN upper bound on the k-th neighbor distance (≥ k points lie
    # within it), so candidates beyond D can be dropped before the top-k
    # window — candidate cells cover the D-ball loosely, and this trims the
    # window's sort input to the ball itself.
    cand = (
        F.broadcast(probe)
        .join(pts, ["p_cx", "p_cy"])
        .select(
            "_qid",
            "_pid",
            "q_d",
            TX.haversine_m(
                F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat")
            ).alias("dist_m"),
        )
        # relative slack: q_d comes from numpy (arcsin form), dist_m from
        # Catalyst (atan2 form) — mathematically equal but up to a few ulps
        # apart, and a true k-th neighbor can sit exactly ON the bound (it
        # defines it); without slack it could be dropped by cross-engine
        # rounding. 1e-9 relative ≈ 6 mm at Earth scale: keeps the prune.
        .filter(F.col("dist_m") <= F.col("q_d") * (1.0 + 1e-9))
        .drop("q_d")
    )
    w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col("_pid").asc())
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("_qid", "_pid", "rank")
    )

    pid_type = dict(points.dtypes)[point_id]
    out = topk.select(
        F.col("_qid").cast(qid_sql_type).alias(query_id),
        F.col("_pid").cast(pid_type).alias(point_id),
        "rank",
    )
    # top-k is tiny (|queries|·k rows): materialize it so the big cached
    # point index can be released before returning
    out = out.localCheckpoint(eager=True)
    pts.unpersist()
    return out


def _candidate_cells(
    lon: float,
    lat: float,
    k: int,
    cx: np.ndarray,
    cy: np.ndarray,
    cnt: np.ndarray,
    west: np.ndarray,
    east: np.ndarray,
    lat_n: np.ndarray,
    lat_s: np.ndarray,
    cos_min: np.ndarray,
    cos_max: np.ndarray,
) -> tuple[np.ndarray, float]:
    """Indices of cells provably containing the k nearest points of
    (lon, lat) plus the proven k-th-distance upper bound D (metres),
    via decomposed-haversine lower/upper bounds per cell.

    hav(d) = sin²(Δφ/2) + cosφ_q · cosφ_p · sin²(Δλ/2). Each bound fixes
    the two terms at their extreme over the cell independently — an over-
    (resp. under-) estimate of the true max (resp. min), hence safe."""
    # Δλ to the cell's lon interval: 0 inside, else wrapped distance to the
    # nearer edge; max is the wrapped distance to the farther edge (≤ 180°)
    d_w = np.abs(lon - west) % 360.0
    d_w = np.minimum(d_w, 360.0 - d_w)
    d_e = np.abs(lon - east) % 360.0
    d_e = np.minimum(d_e, 360.0 - d_e)
    inside_lon = _lon_inside(lon, west, east)
    dlam_min = np.where(inside_lon, 0.0, np.minimum(d_w, d_e))
    # farther edge, capped at 180; when inside, the max is to the farther edge
    dlam_max = np.minimum(np.maximum(d_w, d_e) + 0.0, 180.0)
    # antipodal correction: when the query's antipodal meridian lies inside a
    # cell's lon range, the true max Δλ is 180° but both edge distances are
    # smaller — without this, ub under-estimates and a near-antipodal point
    # cluster can make D too small, excluding cells that hold true neighbors
    anti = (lon + 360.0) % 360.0 - 180.0
    dlam_max = np.where(_lon_inside(anti, west, east), 180.0, dlam_max)

    dphi_min = np.where(
        (lat >= lat_s) & (lat <= lat_n),
        0.0,
        np.minimum(np.abs(lat - lat_s), np.abs(lat - lat_n)),
    )
    dphi_max = np.maximum(np.abs(lat - lat_s), np.abs(lat - lat_n))

    cosq = math.cos(math.radians(lat))
    t1_min = np.sin(np.radians(dphi_min) / 2.0) ** 2
    t1_max = np.sin(np.radians(dphi_max) / 2.0) ** 2
    t2_min = cosq * cos_min * np.sin(np.radians(dlam_min) / 2.0) ** 2
    t2_max = cosq * cos_max * np.sin(np.radians(dlam_max) / 2.0) ** 2
    lb = 2.0 * EARTH_R_M * np.arcsin(np.sqrt(np.clip(t1_min + t2_min, 0.0, 1.0)))
    ub = 2.0 * EARTH_R_M * np.arcsin(np.sqrt(np.clip(t1_max + t2_max, 0.0, 1.0)))

    order = np.argsort(ub, kind="stable")
    csum = cnt[order].cumsum()
    kth_pos = int(np.searchsorted(csum, k))
    D = float(ub[order[kth_pos]])
    return np.flatnonzero(lb <= D), D


def _lon_inside(lon: float, west: np.ndarray, east: np.ndarray) -> np.ndarray:
    """lon ∈ [west, east] — cell lon intervals never wrap (west < east by
    construction of the slippy grid)."""
    return (lon >= west) & (lon <= east)
