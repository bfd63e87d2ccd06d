"""Batch metadata aggregation + prefix-sum global offsets.

Reference analogs:
- A1-A8 metadata aggregation (cruise/create_empty_zarr_store.py:52-74,
  processing/raw_to_zarr.py:247-285): per-batch row counts, time range,
  extent, set-union of categories, completeness ratio.
- A9 prefix-sum offsets (cruise/resample_regrid.py:206-216): each batch's
  global [start, end) slot in the consolidated L2 axis, computed as a
  running sum over batches ordered by start time — the backbone of
  deterministic global ordering (never monotonically_increasing_id).
- O2 determinism anchor: order by start_ts (aws/dynamodb_manager.py:200).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batch_metadata(
    df: DataFrame,
    batch_col: str = "track_id",
    ts_col: str = "warc_ts",
    lat: str = "lat",
    lon: str = "lon",
    lang: str = "lang",
) -> DataFrame:
    """Per-batch metadata row — the DynamoDB-item analog (raw_to_zarr.py:66-108).

    num_rows_valid = least(count lat, count lon)   (A6)
    start/end ISO-ms strings                        (A7, raw_to_zarr.py:280-285)
    extent min/max (rounded like MIN/MAX_ECHO_RANGE, raw_to_zarr.py:86-87)
    categories = sorted set-union of langs          (A3)
    completeness = valid/total                      (A8)
    """
    return (
        df.filter(F.col(batch_col).isNotNull())
        .groupBy(batch_col)
        .agg(
            F.least(F.count(lat), F.count(lon)).alias("num_rows_valid"),
            F.count(F.lit(1)).alias("num_rows_total"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("start_ts"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("end_ts"),
            F.round(F.min(lat), 4).alias("min_extent"),
            F.round(F.max(lat), 4).alias("max_extent"),
            F.array_sort(F.collect_set(lang)).alias("categories"),
            (F.least(F.count(lat), F.count(lon)) / F.count(F.lit(1))).alias("completeness"),
        )
    )


def assign_offsets(meta: DataFrame, batch_col: str = "track_id", count_col: str = "num_rows_valid", order_col: str = "start_ts") -> DataFrame:
    """A9: [start_idx, end_idx) global offsets via window prefix-sum.

    Single global window (no partition) — the batch table is one row per
    batch (thousands, not billions), so a 1-partition window is fine even
    at 100 TB of underlying data."""
    w = Window.orderBy(order_col, batch_col).rowsBetween(Window.unboundedPreceding, -1)
    return meta.withColumn("start_idx", F.coalesce(F.sum(count_col).over(w), F.lit(0))).withColumn(
        "end_idx", F.col("start_idx") + F.col(count_col)
    )


def global_row_index(
    df: DataFrame,
    offsets: DataFrame,
    batch_col: str = "track_id",
    ts_col: str = "warc_ts",
    tiebreak: str = "url",
) -> DataFrame:
    """Per-row global ordinal = batch start_idx + row_number within batch.

    The L2 time-axis coordinate (resample_regrid.py:254-311 slab writes).
    Offsets table is tiny -> broadcast join; within-batch ordinal is a
    window over (ts, tiebreak) — fully deterministic under parallelism."""
    w = Window.partitionBy(batch_col).orderBy(ts_col, tiebreak)
    valid = df.filter(F.col(batch_col).isNotNull() & F.col("lat").isNotNull() & F.col("lon").isNotNull())
    return (
        valid.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(offsets.select(batch_col, "start_idx")), batch_col)
        .withColumn("global_idx", F.col("start_idx") + F.col("_rn"))
        .drop("_rn")
    )
