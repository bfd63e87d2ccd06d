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
  contract by writing each batch to its own batch_id=<id> partition
  directory (same recipe as streaming/tiles.py's partials sink; no
  session-wide partitionOverwriteMode mutation).

Both shapes materialize the eval-gram table ONCE up front
(localCheckpoint — house style over persist(): no CacheManager
plan-matching across repeated invocations, blocks GC with the frame),
so micro-batches join against materialized blocks instead of
re-deriving the static side per trigger.
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
    rows; empty for clean docs. `eval_df` must be a STATIC DataFrame.
    With hashed=True the `gram` column carries the xxhash64 LONG of the
    gram (byte-lean evidence key), not the human-readable string."""
    ev = (
        decontam_op.eval_gram_table(eval_df, id_col, text_col, n, hashed)
        .localCheckpoint(eager=True)
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
    reports, each written to out_dir/batch_id=<id>/ (idempotent: a
    replayed batch overwrites only its own directory). Reports are flag
    rows (small by nature), coalesced to one file per batch so a fully
    CLEAN batch still writes a schema-bearing parquet file — an empty
    report directory would otherwise fail schema inference on read.
    Returns the started StreamingQuery; callers awaitTermination()."""
    ev = (
        decontam_op.eval_gram_table(eval_df, id_col, text_col, n, hashed)
        .localCheckpoint(eager=True)
    )

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        rep = decontam_op.ngram_decontaminate(
            batch_df, None, id_col, text_col, n, hashed, eval_grams=ev
        )
        rep.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        docs.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
