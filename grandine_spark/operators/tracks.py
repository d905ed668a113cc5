"""Trajectory (track) assembly from timestamped points.

The geo×webtext crossover shape: an event stream carries (user, ts) and a
geocoded position; a track is the per-user polyline in time order, and the
useful outputs are relational — point count, time span, haversine length —
computed entirely with native window/aggregate expressions (no Python in
the plan, one shuffle on the key).

This mirrors the reference's way-assembly idea (ordered node refs → line,
``lib/spatial/osm`` via operators/assemble.py) applied to a stream keyed by
user instead of way id; geometry output (WKB) for tracks that need it goes
through the same assembly finalize kernel and is covered by
``way_assembly`` — here the contract is the statistics table, which is what
feeds ranking/filtering at corpus scale.

Scale (100 TB): ONE shuffle on the key; the window is a running lag (no
frame buffering) and the aggregation is map-side partial. Per-key state is
O(1). Hot keys (one user = 10^8 points) sort within their partition —
the same cost profile as any sessionization; salt-and-stitch is possible
but not pre-paid here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tile_exprs import haversine_m


def track_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    seq_col: str | None = None,
) -> DataFrame:
    """Per-key track statistics: (key, n_points, start_ts, end_ts,
    length_m) with length = sum of great-circle segment distances in time
    order (ties broken by ``seq_col`` for a deterministic polyline)."""
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    seg = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(lon_col).alias("_lon"),
        F.col(lat_col).alias("_lat"),
        F.lag(lon_col).over(w).alias("_plon"),
        F.lag(lat_col).over(w).alias("_plat"),
    )
    d = F.when(
        F.col("_plon").isNull(), F.lit(0.0)
    ).otherwise(haversine_m(F.col("_plon"), F.col("_plat"), F.col("_lon"), F.col("_lat")))
    return seg.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.round(F.sum(d), 2).alias("length_m"),
    )
