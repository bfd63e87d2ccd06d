"""Tile-pyramid rollup — the L2 consolidation analog.

Reference analog: the cruise-level Zarr cube + PMTiles pyramid
(/root/reference/water_column_sonar_processing/cruise/create_empty_zarr_store.py:23-126,
geometry/pmtile_generation.py:124-235). Points are assigned a base-
resolution cell; every coarser zoom level is derived by EXACT integer
halving of the base cell (one scan, explode over zoom levels, single
partial-aggregated groupBy — the parent derivation never re-reads the
input).

Empty tiles are naturally absent (groupBy only materializes observed keys),
matching write_empty_chunks=False (processing/raw_to_zarr.py:291-296).

Skew note: counts/sums are partially aggregated map-side by Catalyst, so
hot cells do NOT skew the shuffle the way a hot JOIN key would — each
mapper emits one partial row per (zoom, cell). Salting is only needed for
joins (see operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells

def tile_pyramid(
    points: DataFrame,
    base_res: int = 12,
    min_res: int = 4,
    lat: str = "lat",
    lon: str = "lon",
    agg_cols: dict | None = None,
) -> DataFrame:
    """Aggregate points into a multi-resolution tile table.

    Returns (zoom, cell_id, gx, gy, doc_count [, user aggs]).

    Strategy (base-then-fanout, base level emitted shuffle-free): the
    POINT table is aggregated exactly once, at base_res (the expensive
    shuffle — proportional to base-cell cardinality, not input rows).
    The base_res level of the pyramid IS that table re-keyed, so it is
    emitted directly with NO second aggregation — at a sparse base
    (~1 point/cell) the base level is ~75% of the pyramid's keys, and
    routing it through the fanout groupBy was measured as the 8->32-core
    scaling bottleneck (32 concurrent multi-million-entry partial-agg
    hash maps, pure memory-bandwidth pressure for zero reduction).
    Only zooms [min_res, base_res) fan out: one explode + one partially-
    aggregated groupBy, where partial aggregation genuinely reduces
    (coarser levels saturate). Both consumers of the base aggregation
    share one shuffle via Spark's ReusedExchange — nothing needs persist.
    Counts are associative, so the rollup is exact. With user agg_cols
    (not generally re-aggregable) it falls back to the explode-points
    plan.
    """
    # NaN coords (raw, pre-QC inputs) would sail through isNotNull and
    # land in the max-corner cell via least/greatest NaN ordering — drop
    # them with the NULLs (review r4)
    pts = points.filter(
        F.col(lat).isNotNull()
        & F.col(lon).isNotNull()
        & ~F.isnan(F.col(lat))
        & ~F.isnan(F.col(lon))
    )
    if agg_cols:
        return _tile_pyramid_explode(pts, base_res, min_res, lat, lon, agg_cols)
    base_gx, base_gy = cells.grid_cell_xy(F.col(lat), F.col(lon), base_res)
    base = (
        pts.select(base_gx.alias("bgx"), base_gy.alias("bgy"))
        .groupBy("bgx", "bgy")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    base_level = base.select(
        F.lit(base_res).alias("zoom"),
        F.col("bgx").alias("gx"),
        F.col("bgy").alias("gy"),
        "doc_count",
    )
    if min_res >= base_res:
        pyramid = base_level
    else:
        fan = base.withColumn("zoom", F.explode(F.sequence(F.lit(min_res), F.lit(base_res - 1))))
        cgx, cgy = cells.coarsen_xy(F.col("zoom"), F.col("bgx"), F.col("bgy"), base_res)
        coarse = (
            fan.select("zoom", cgx.alias("gx"), cgy.alias("gy"), "doc_count")
            .groupBy("zoom", "gx", "gy")
            .agg(F.sum("doc_count").alias("doc_count"))
        )
        pyramid = coarse.unionByName(base_level)
    cell = cells.pack_cell_cols(F.col("zoom"), F.col("gx"), F.col("gy"))
    return pyramid.select("zoom", cell.alias("cell_id"), "gx", "gy", "doc_count")


def _tile_pyramid_explode(pts: DataFrame, base_res: int, min_res: int, lat: str, lon: str, agg_cols: dict) -> DataFrame:
    """Explode-per-zoom fallback for non-re-aggregable user aggregates."""
    base_gx, base_gy = cells.grid_cell_xy(F.col(lat), F.col(lon), base_res)
    pts = (
        pts.withColumn("_bgx", base_gx)
        .withColumn("_bgy", base_gy)
        .withColumn("zoom", F.explode(F.sequence(F.lit(min_res), F.lit(base_res))))
    )
    gx, gy = cells.coarsen_xy(F.col("zoom"), F.col("_bgx"), F.col("_bgy"), base_res)
    cell = cells.pack_cell_cols(F.col("zoom"), gx, gy)
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for name, expr in agg_cols.items():
        aggs.append(expr.alias(name))
    return (
        pts.withColumn("gx", gx)
        .withColumn("gy", gy)
        .withColumn("cell_id", cell)
        .groupBy("zoom", "cell_id", "gx", "gy")
        .agg(*aggs)
    )


def write_tiles(tiles: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize the pyramid partitioned by zoom (partition pruning for
    single-zoom reads — the Iceberg PARTITIONED BY analog; parquet+zstd
    mirrors the reference's Blosc-zstd chunk compression,
    model/zarr_manager.py:14-18). Rows sort within tasks by cell_id so
    row-group stats serve cell-range tile reads (no extra shuffle)."""
    (
        tiles.sortWithinPartitions("cell_id")
        .write.partitionBy("zoom")
        .mode(mode)
        .option("compression", "zstd")
        .parquet(path)
    )
