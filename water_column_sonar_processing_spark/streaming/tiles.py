"""Streaming L2 tile updater — incremental pyramid maintenance.

Reference analog: the cruise-level store is updated slab-by-slab as files
land (resample_regrid.py per-file writes into the shared Zarr cube); here
newly landed page files update the multi-zoom tile COUNTS incrementally
through a Structured Streaming stateful aggregation.

Design for scale: the aggregation state is keyed by (zoom, gx, gy), whose
cardinality is bounded by the tile grid itself (sum over zooms of 4^z —
independent of input row count), so no watermark is needed: counts are
monotone and the state can never grow past the pyramid's own size. That
makes this one of the rare unbounded-input aggregations that is safe in
`complete`/`update` mode at any input scale, provided base_res is chosen
so 4^base_res fits the state store (res<=12 ≈ 16.7M keys — fine; for
finer bases, partial pyramids per time window + batch compaction is the
pattern, same as the reference's per-cruise consolidation).

The transform chain (extract -> QC -> cell encode -> zoom explode ->
count) is IDENTICAL to the batch tile_pyramid semantics; the parity test
drains the stream with availableNow and compares against the batch
operator on the same landed files, exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells
from .ingest import PAGES_STREAM_SCHEMA, transform_stream


def tile_counts_stream(src: DataFrame, base_res: int = 8, min_res: int = 4) -> DataFrame:
    """(zoom, gx, gy, doc_count) streaming aggregation over an L1-shaped
    stream (must carry lat/lon already QC'd or raw text to extract)."""
    base_gx, base_gy = cells.grid_cell_xy(F.col("lat"), F.col("lon"), base_res)
    pts = src.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull()).select(
        base_gx.alias("bgx"), base_gy.alias("bgy")
    )
    fan = pts.withColumn("zoom", F.explode(F.sequence(F.lit(min_res), F.lit(base_res))))
    shift = F.pow(F.lit(2.0), (F.lit(base_res) - F.col("zoom")).cast("double"))
    return (
        fan.select(
            "zoom",
            F.floor(F.col("bgx") / shift).cast("long").alias("gx"),
            F.floor(F.col("bgy") / shift).cast("long").alias("gy"),
        )
        .groupBy("zoom", "gx", "gy")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def stream_tile_pyramid(
    spark: SparkSession,
    in_dir: str,
    checkpoint_dir: str,
    table_name: str = "tile_stream",
    base_res: int = 8,
    min_res: int = 4,
    grid_res: int = 7,
):
    """Start an availableNow drain that maintains the full tile pyramid in
    a `complete`-mode in-memory table (swap the sink for a key-value store
    or Iceberg MERGE sink in production; state lives in the checkpoint, so
    successive drains resume incrementally). Returns the StreamingQuery."""
    src = spark.readStream.schema(PAGES_STREAM_SCHEMA).parquet(in_dir)
    l1 = transform_stream(src, grid_res)
    tiles = tile_counts_stream(l1, base_res=base_res, min_res=min_res)
    return (
        tiles.writeStream.format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
