"""Streaming first-occurrence dedup == batch twin, including duplicate
suppression across micro-batches and across a checkpointed second drain."""

from __future__ import annotations

import os

import pandas as pd

from water_column_sonar_processing_spark.streaming.dedup import dedup_batch_twin, dedup_stream

SCHEMA = "doc_id long, text string, ts_us long"


def _mk_files(tmp_path):
    """Three files (one micro-batch each under maxFilesPerTrigger=1), with
    duplicate texts both WITHIN a file and ACROSS files; event time is
    ingest-ordered (dups arrive after originals)."""
    texts = [f"document body number {i} with some shared phrasing" for i in range(8)]
    b1 = [(0, texts[0], 100), (1, texts[1], 110), (2, texts[0], 120), (3, texts[2], 130)]
    b2 = [(4, texts[1], 200), (5, texts[3], 210), (6, texts[3], 215), (7, texts[4], 220)]
    b3 = [(8, texts[0], 300), (9, texts[5], 310), (10, texts[2], 320), (11, texts[6], 330)]
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2, b3), 1):
        pd.DataFrame(rows, columns=["doc_id", "text", "ts_us"]).to_parquet(
            f"{in_dir}/b{i}.parquet", index=False
        )
    return in_dir, b1 + b2 + b3


def _drain(spark, in_dir, ckpt, name):
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        dedup_stream(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name).toPandas()


def test_streaming_dedup_matches_batch_twin(spark, tmp_path):
    in_dir, all_rows = _mk_files(tmp_path)
    got = _drain(spark, in_dir, str(tmp_path / "ck"), "dedup_out_1")

    batch = dedup_batch_twin(spark.createDataFrame(all_rows, SCHEMA)).toPandas()
    key = ["digest", "doc_id", "ts_us"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(map(tuple, batch[key].values.tolist()))
    # 7 distinct texts -> 7 survivors out of 12 rows
    assert len(got) == 7
    # the cross-batch dup (doc 8/10 repeating batch-1 texts) was suppressed
    assert set(got["doc_id"]) == {0, 1, 3, 5, 7, 9, 11}


def _drain_to_parquet(spark, in_dir, out_dir, ckpt):
    src = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        dedup_stream(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir).toPandas()


def test_streaming_dedup_checkpoint_resume_suppresses(spark, tmp_path):
    """A second drain after MORE duplicate files land emits only the truly
    new digests (per-digest state survives the restart via the checkpoint;
    the memory sink cannot recover, so this path uses the parquet sink)."""
    in_dir, _ = _mk_files(tmp_path)
    ckpt, out_dir = str(tmp_path / "ck2"), str(tmp_path / "out2")
    first = _drain_to_parquet(spark, in_dir, out_dir, ckpt)
    assert len(first) == 7

    # land a 4th file: two dups of already-seen texts + one new text
    pd.DataFrame(
        [(12, "document body number 0 with some shared phrasing", 400),
         (13, "document body number 7 with some shared phrasing", 410),
         (14, "document body number 5 with some shared phrasing", 420)],
        columns=["doc_id", "text", "ts_us"],
    ).to_parquet(f"{in_dir}/b4.parquet", index=False)

    second = _drain_to_parquet(spark, in_dir, out_dir, ckpt)
    # cumulative sink: the 7 originals plus ONLY the new digest's row
    assert len(second) == 8
    new_rows = second[~second["doc_id"].isin(first["doc_id"])]
    assert sorted(map(tuple, new_rows[["doc_id", "ts_us"]].values.tolist())) == [(13, 410)]


def test_dedup_batch_twin_ignores_null_rows(spark):
    """Review r4: NULL ts/id rows are skipped in BOTH the stream (they
    would poison the query: int(NaN) re-raises every restart) and the
    batch twin, keeping parity well-defined."""
    from water_column_sonar_processing_spark.streaming.dedup import dedup_batch_twin

    rows = [(1, "dup", 100), (2, "dup", None), (None, "dup", 50), (3, "uniq", 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_us long")
    got = {r["doc_id"] for r in dedup_batch_twin(df).collect()}
    assert got == {1, 3}  # NULL-ts and NULL-id rows never win or crash
