"""Raster <-> vector join: point lookup against a cell-keyed raster table.

Reference analog: the (commented) elevation lookup — chunked multipoint
queries against a DEM raster service
(/root/reference/water_column_sonar_processing/geometry/elevation_manager.py:52-82).
Spark restatement: a raster is just a table keyed by cell id (one row per
pixel/cell, value columns per band); point lookup is an equi-join on the
point's cell id. Small rasters broadcast; continental rasters sort-merge
on the cell key (both sides pre-partitioned by cell prefix).

`rasterize` is the inverse: aggregate a point table into a raster band
(the tile-pyramid base level is exactly a doc-count raster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells


def rasterize(
    points: DataFrame,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
    agg: dict | None = None,
) -> DataFrame:
    """Point table -> raster band(s): (cell_id, count [, user bands])."""
    aggs = [F.count(F.lit(1)).alias("count")]
    for name, expr in (agg or {}).items():
        aggs.append(expr.alias(name))
    return (
        points.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull())
        .withColumn("cell_id", cells.grid_cell(F.col(lat), F.col(lon), res))
        .groupBy("cell_id")
        .agg(*aggs)
    )


def raster_lookup(
    points: DataFrame,
    raster: DataFrame,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
    how: str = "left",
    broadcast_raster: bool = True,
) -> DataFrame:
    """J7: annotate each point with the raster value of its cell.

    broadcast_raster=True for dimension-table-sized rasters; False lets
    Catalyst/AQE pick (sort-merge for continental-scale rasters)."""
    pts = points.withColumn("cell_id", cells.grid_cell(F.col(lat), F.col(lon), res))
    r = F.broadcast(raster) if broadcast_raster else raster
    return pts.join(r, "cell_id", how)
