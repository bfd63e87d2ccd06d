"""Structured Streaming ingest — the event-driven trigger analog.

The reference's levels are chained by SNS/SQS notifications
(aws/sns_manager.py:26-33, aws/sqs_manager.py:26-40): a new L0 object
triggers per-file L1 processing. The Spark restatement is a file-source
readStream on the pages directory: each newly landed file flows through
the STATELESS half of the L1 chain (extraction, bounds/null-island QC,
cell encoding — all native exprs, fully streaming-safe) into a
partitioned sink with exactly-once file-source checkpointing.

Track-sequential operators (distance-jump windows, monotonic repair,
Kalman) are deliberately NOT in the streaming path: they need total order
within a track, which the reference also only gets at the batch
consolidation level (resample_regrid runs per-cruise AFTER all files
land). The batch `plans/pipeline.py` remains the L2 consolidator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells
from ..operators import qc as qc_op
from ..operators.extract import extract_latlon

PAGES_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_ingest_l1(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    grid_res: int = 7,
    trigger_available_now: bool = True,
):
    """Start (or one-shot drain with availableNow) the streaming L1 ingest.

    Returns the StreamingQuery; callers .awaitTermination() it."""
    src = spark.readStream.schema(PAGES_STREAM_SCHEMA).parquet(in_dir)
    l1 = transform_stream(src, grid_res)
    writer = (
        l1.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("lang")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def transform_stream(src: DataFrame, grid_res: int = 7) -> DataFrame:
    """The stateless L1 transform chain (shared by stream + batch)."""
    df = extract_latlon(src)
    df = qc_op.apply_bounds_and_island(df)
    return df.withColumn("cell_id", cells.grid_cell(F.col("lat"), F.col("lon"), grid_res)).withColumn(
        "hex_id", cells.hex_cell(F.col("lat"), F.col("lon"), 7)
    )
