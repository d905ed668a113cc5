"""Streaming pipelines over a pages stream (url, warc_ts, html, text, lang)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tile_exprs as TX
from ..operators.spatial_join import geocode_pages


def stream_geocode(pages_stream: DataFrame) -> DataFrame:
    """Streaming geocoder — identical expressions to the batch geocoder."""
    return geocode_pages(pages_stream)


def stream_cell_counts(
    pages_stream: DataFrame,
    zoom: int = 7,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-cell page counts: the continuous
    analog of ``raster.rasterize_points``. Late pages beyond the watermark
    are dropped by Spark's state eviction."""
    pts = stream_geocode(pages_stream)
    return (
        pts.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            TX.tile_x(F.col("lon"), zoom).alias("tile_x"),
            TX.tile_y(F.col("lat"), zoom).alias("tile_y"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tile_x",
            "tile_y",
            "n",
        )
    )


def stream_tile_assignments(pages_stream: DataFrame, zoom: int = 14) -> DataFrame:
    """Streaming per-page tile assignment (stateless map — no shuffle)."""
    pts = stream_geocode(pages_stream)
    return pts.select(
        "url",
        "warc_ts",
        F.lit(zoom).alias("tile_z"),
        TX.tile_x(F.col("lon"), zoom).alias("tile_x"),
        TX.tile_y(F.col("lat"), zoom).alias("tile_y"),
    )
