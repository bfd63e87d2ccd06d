"""Streaming exact deduplication: emit each document's FIRST occurrence
(by event time, deterministically tie-broken) and suppress every later
duplicate across micro-batches — the streaming half of the corpus-ingest
dedup story (dedup.exact_dedup is the batch compactor; this keeps an
incremental ingest clean between compactions).

Why not `dropDuplicates` on the stream: Spark's built-in keeps the first
row it HAPPENS to see, so the surviving row of an intra-batch duplicate
group depends on partition order — unreproducible. This operator keys
GroupState by content digest and always emits the min-(ts, id) row of
the first batch a digest appears in, so a drain of the same files yields
byte-identical output on any layout, and matches the batch twin exactly.

State is one (emitted,) flag per distinct digest. For unbounded streams
bound it with the processing-time TTL (`state_ttl_min`): after a digest
goes quiet that long it is forgotten (a later re-occurrence re-emits —
the standard state/recall trade, same as a watermarked dropDuplicates;
the batch compactor removes those stragglers).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "digest string, doc_id long, ts_us long"
_STATE_SCHEMA = "emitted boolean"


def dedup_stream(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts_us",
    state_ttl_min: int | None = None,
):
    """Streaming DataFrame -> first-occurrence rows (digest, doc_id, ts_us).

    Group by md5(text); per digest, the FIRST micro-batch containing it
    emits that batch's min-(ts, id) row; later batches emit nothing while
    state lives. When files land in event-time order (the normal ingest:
    a duplicate is crawled AFTER its original), the first batch also
    holds the digest's global minimum, so a full drain equals
    dedup_batch_twin exactly — the shape the parity test pins. Out-of-
    order arrival keeps exactly-one-per-digest but may keep a later-ts
    representative (inherent to single-pass streaming dedup)."""
    keyed = docs.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts_us"),
    )

    def first_seen(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (digest,) = key
        if state.hasTimedOut:
            state.remove()
            return
        best = None
        for pdf in pdfs:
            for doc_id, ts in zip(pdf["doc_id"], pdf["ts_us"]):
                if pd.isna(ts) or pd.isna(doc_id):
                    # a NULL ts/id row would crash the query permanently
                    # (int(NaN) re-raises on every restart); skipped here
                    # AND in dedup_batch_twin so parity stays exact
                    continue
                cand = (int(ts), int(doc_id))
                if best is None or cand < best:
                    best = cand
        if best is not None and not state.exists:
            state.update((True,))
            if state_ttl_min:
                state.setTimeoutDuration(state_ttl_min * 60_000)
            yield pd.DataFrame({"digest": [digest], "doc_id": [best[1]], "ts_us": [best[0]]})
        elif state.exists and state_ttl_min:
            state.setTimeoutDuration(state_ttl_min * 60_000)

    timeout = GroupStateTimeout.ProcessingTimeTimeout if state_ttl_min else GroupStateTimeout.NoTimeout
    return keyed.groupBy("digest").applyInPandasWithState(
        first_seen, OUT_SCHEMA, _STATE_SCHEMA, "append", timeout
    )


def dedup_batch_twin(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ts_col: str = "ts_us"
) -> DataFrame:
    """Deterministic batch twin: min-(ts, id) row per digest — what a full
    drain of dedup_stream over the same rows must produce exactly."""
    return (
        docs.select(
            F.md5(F.col(text_col)).alias("digest"),
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ts_us"),
        )
        .filter(F.col("ts_us").isNotNull() & F.col("doc_id").isNotNull())  # mirror stream skip
        .groupBy("digest")
        .agg(F.min(F.struct("ts_us", "doc_id")).alias("m"))
        .select("digest", F.col("m.doc_id").alias("doc_id"), F.col("m.ts_us").alias("ts_us"))
    )
