"""Streaming test-set decontamination — the ingest-time twin of
operators/decontam.py.

Contamination is PER-DOC decomposable: a document's flag depends only on
its own text and the STATIC eval-gram set, never on other stream rows.
So unlike streaming dedup (which needs cross-batch GroupState), the
streaming form is STATELESS — two shapes, both exact:

- `contamination_hits_stream`: pure append stream of row-level evidence
  (doc_id, gram, eval id). Map-side gram explode -> stream-static
  BROADCAST inner join (stream-static joins are stateless in Structured
  Streaming; the static side is the same tiny eval-gram table the batch
  operator broadcasts). No watermark, no state store, unbounded-safe.
- `run_decontam_stream`: foreachBatch writer emitting the per-doc
  contamination REPORT (doc_id, n_shared, first_eval_id) by applying
  the batch operator to each micro-batch — exact because per-doc
  decomposability makes batch-of-union == union-of-batches (the parity
  test pins it), and idempotent under foreachBatch's at-least-once
  contract via per-batch_id partition overwrite (same recipe as
  streaming/tiles.py's partials sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import decontam as decontam_op


def contamination_hits_stream(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hashed: bool = False,
) -> DataFrame:
    """Streaming docs -> append-mode (doc_id, gram, first_eval_id) hit
    rows; empty for clean docs. `eval_df` must be a STATIC DataFrame."""
    ev = (
        decontam_op._gram_rows(eval_df, id_col, text_col, n, hashed)
        .groupBy("_g")
        .agg(F.min(F.col(id_col)).alias("_eid"))
    )
    tr = decontam_op._gram_rows(docs, id_col, text_col, n, hashed)
    return tr.join(F.broadcast(ev), "_g").select(
        F.col(id_col), F.col("_g").alias("gram"), F.col("_eid").alias("first_eval_id")
    )


def run_decontam_stream(
    docs: DataFrame,
    eval_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hashed: bool = False,
):
    """availableNow foreachBatch drain: per-micro-batch contamination
    reports appended as batch_id-partitioned parquet (idempotent:
    a replayed batch overwrites its own partition only). Returns the
    started StreamingQuery; callers awaitTermination()."""
    spark = docs.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        rep = decontam_op.ngram_decontaminate(
            batch_df, eval_df, id_col, text_col, n, hashed
        ).withColumn("batch_id", F.lit(batch_id))
        rep.write.mode("overwrite").partitionBy("batch_id").parquet(out_dir)

    return (
        docs.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
