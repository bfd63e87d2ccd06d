"""Sequence packing: assign documents to fixed-token-budget training
sequences — the last step of an LLM data pipeline before tokenized
shards are written.

Two semantics, both deterministic:

- `chunk_pack`      concat-then-chunk: documents form one token stream
                    (ordered by key within each group) cut every
                    `budget` tokens; a document may straddle a cut. This
                    is the dominant pretraining recipe and is EXACTLY a
                    window cumsum — fully native, one shuffle, scales.
- `greedy_pack`     first-fit-next: a document that would overflow the
                    current sequence starts a new one (documents never
                    split). Inherently sequential per group — implemented
                    as applyInPandas over groups (groups parallelize;
                    the per-group scan is a tight numpy loop).

Both return one row per document with its sequence assignment, so the
caller can groupBy(seq_id) to materialize shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_pack(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    budget: int = 4096,
    by: str | None = None,
) -> DataFrame:
    """(input cols) + (stream_off, seq_id, seq_off): concat-then-chunk.

    stream_off = tokens before this doc in the group's stream (exclusive
    prefix sum over key order); seq_id = stream_off // budget (the
    sequence this doc STARTS in); seq_off = position inside it. Docs
    longer than (budget - seq_off) straddle into the next sequence(s) —
    by design, like pretraining concat-chunk."""
    part = [by] if by else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("stream_off", off)
        .withColumn("seq_id", (F.col("stream_off") / F.lit(budget)).cast("long"))
        .withColumn("seq_off", F.pmod(F.col("stream_off"), F.lit(budget)).cast("long"))
    )


def greedy_pack(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    budget: int = 4096,
    by: str | None = None,
) -> DataFrame:
    """(key, group, n_tokens, seq_id, seq_off): first-fit-next packing.

    Documents are visited in key order per group; one that would push the
    running fill past `budget` closes the sequence and opens the next.
    Oversized docs (n_tokens > budget) get a sequence of their own.
    Sequential state per group -> applyInPandas (Arrow-batched; the loop
    is O(group) numpy). key_col must be integral (the Arrow schema pins
    it to long); use chunk_pack for arbitrary key types. The `by` column
    keeps its input type — the output schema is derived from the input's
    dtype rather than pinned to string (it used to coerce silently)."""
    gcol = by or "_g"
    src = df if by else df.withColumn(gcol, F.lit(0))
    grp_type = src.schema[gcol].dataType.simpleString()
    sel = src.select(F.col(gcol).alias("_grp"), F.col(key_col).alias("_key"), F.col(token_col).alias("_tok"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_key", kind="mergesort").reset_index(drop=True)
        toks = pdf["_tok"].to_numpy(dtype=np.int64)
        seq = np.zeros(len(toks), dtype=np.int64)
        offs = np.zeros(len(toks), dtype=np.int64)
        cur, fill = 0, 0
        for i, t in enumerate(toks):
            if fill > 0 and fill + t > budget:
                cur += 1
                fill = 0
            seq[i] = cur
            offs[i] = fill
            fill += t
        pdf["seq_id"] = seq
        pdf["seq_off"] = offs
        return pdf

    schema = f"_grp {grp_type}, _key long, _tok long, seq_id long, seq_off long"
    out = sel.groupBy("_grp").applyInPandas(pack, schema)
    return out.select(
        F.col("_grp").alias(gcol if by else "group"),
        F.col("_key").alias(key_col),
        F.col("_tok").alias(token_col),
        "seq_id",
        "seq_off",
    )
