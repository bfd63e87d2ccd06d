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
so 4^base_res fits the state store (res<=12 ≈ 16.7M keys — fine). For
finer bases use `stream_tile_partials` + `compact_tile_partials`:
zero-state per-batch partial pyramids appended per batch_id partition,
batch-compacted into the consolidated table — the reference's
per-cruise consolidation pattern, exact at any base_res.

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
    cgx, cgy = cells.coarsen_xy(F.col("zoom"), F.col("bgx"), F.col("bgy"), base_res)
    return (
        fan.select("zoom", cgx.alias("gx"), cgy.alias("gy"))
        .groupBy("zoom", "gx", "gy")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def stream_tile_partials(
    spark: SparkSession,
    in_dir: str,
    partials_dir: str,
    checkpoint_dir: str,
    base_res: int = 14,
    min_res: int = 4,
    grid_res: int = 7,
):
    """Finer-base streaming pattern (base_res > ~12, where the stateful
    complete-mode pyramid's 4^base_res key space outgrows the state
    store): ZERO-state partial pyramids + batch compaction — the same
    shape as the reference's per-file slab writes consolidated per-cruise
    (resample_regrid.py).

    Each micro-batch computes its OWN partial pyramid (a plain batch
    aggregation over just that batch's rows — state never crosses
    batches) and lands it under partials_dir/batch_id=<n>/. The write is
    an overwrite of that batch's partition directory, so a replayed batch
    (foreachBatch's at-least-once contract after a crash) is idempotent.
    `compact_tile_partials` then folds partials into the consolidated
    pyramid; counts are associative, so compaction order never matters
    and the result is EXACTLY the batch tile_pyramid of the landed files.

    Scale: partial size per batch is bounded by min(batch_rows x zooms,
    pyramid size); the compaction shuffle is one partial-agg'd groupBy on
    (zoom, gx, gy) — the same plan as the batch pyramid's fan-out stage.
    Returns the StreamingQuery."""
    import os

    src = spark.readStream.schema(PAGES_STREAM_SCHEMA).parquet(in_dir)
    l1 = transform_stream(src, grid_res)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        part = tile_counts_stream(batch_df, base_res=base_res, min_res=min_res)
        part.write.mode("overwrite").parquet(os.path.join(partials_dir, f"batch_id={batch_id}"))

    return (
        l1.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_tile_partials(spark: SparkSession, partials_dir: str) -> DataFrame:
    """Consolidate streamed partial pyramids into the full tile table:
    SUM of partial doc_counts per (zoom, gx, gy). One partial-aggregated
    shuffle; run it periodically (or per drain) like the reference's
    cruise-level consolidation, then tile readers see a single table."""
    parts = spark.read.option("basePath", partials_dir).parquet(partials_dir)
    return parts.groupBy("zoom", "gx", "gy").agg(F.sum("doc_count").alias("doc_count"))


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
