"""Streaming decontamination == batch operator (per-doc decomposability),
for both the stateless hits stream and the foreachBatch report writer."""

from __future__ import annotations

import os

import pandas as pd

from water_column_sonar_processing_spark.operators.decontam import ngram_decontaminate
from water_column_sonar_processing_spark.streaming.decontam import (
    contamination_hits_stream,
    run_decontam_stream,
)

SCHEMA = "doc_id long, text string"
N = 3


def _corpus():
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    for i in range(60):
        toks = [vocab[(i * 5 + j * 2) % len(vocab)] for j in range(4 + (i % 7))]
        docs.append((i, " ".join(toks)))
    evals = [d for d in docs if d[0] % 10 == 0]
    train = [d for d in docs if d[0] % 10 != 0]
    return train, evals


def _mk_files(tmp_path, train):
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    per = (len(train) + 2) // 3
    for i in range(3):
        rows = train[i * per : (i + 1) * per]
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            f"{in_dir}/b{i}.parquet", index=False
        )
    return in_dir


def test_streaming_decontam_matches_batch(spark, tmp_path):
    train, evals = _corpus()
    in_dir = _mk_files(tmp_path, train)
    edf = spark.createDataFrame(evals, SCHEMA)
    tdf = spark.createDataFrame(train, SCHEMA)
    batch = {
        r["doc_id"]: (r["n_shared"], r["first_eval_id"])
        for r in ngram_decontaminate(tdf, edf, n=N).collect()
    }
    assert batch  # fixture must exercise real contamination

    # --- stateless hits stream: roll up drained rows per doc
    src = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir)
    q = (
        contamination_hits_stream(src, edf, n=N)
        .writeStream.format("memory")
        .queryName("decontam_hits")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_hits"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    hits = spark.table("decontam_hits").toPandas()
    rolled = {
        int(doc): (int(g["gram"].nunique()), int(g["first_eval_id"].min()))
        for doc, g in hits.groupby("doc_id")
    }
    assert rolled == batch

    # --- foreachBatch report writer: union of per-batch reports == batch
    out_dir = str(tmp_path / "rep_out")
    q2 = run_decontam_stream(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir),
        edf,
        out_dir,
        str(tmp_path / "ck_rep"),
        n=N,
    )
    q2.awaitTermination(180)
    rep = spark.read.parquet(out_dir).toPandas()
    assert len(rep) == len(rep["doc_id"].unique())  # one report row per doc
    got = {int(r.doc_id): (int(r.n_shared), int(r.first_eval_id)) for r in rep.itertuples()}
    assert got == batch


def test_clean_stream_report_is_readable(spark, tmp_path):
    """A fully clean stream must still leave a schema-bearing report
    (empty), not an unreadable directory."""
    clean = [(i, f"totally unique doc number{i} nothing shared") for i in range(6)]
    evals = [(100, "completely disjoint evaluation material here")]
    in_dir = str(tmp_path / "clean_in")
    os.makedirs(in_dir)
    pd.DataFrame(clean, columns=["doc_id", "text"]).to_parquet(
        f"{in_dir}/b0.parquet", index=False
    )
    out_dir = str(tmp_path / "clean_out")
    q = run_decontam_stream(
        spark.readStream.schema(SCHEMA).parquet(in_dir),
        spark.createDataFrame(evals, SCHEMA),
        out_dir,
        str(tmp_path / "ck_clean"),
        n=N,
    )
    q.awaitTermination(180)
    rep = spark.read.parquet(out_dir)
    assert rep.count() == 0
    assert {"doc_id", "n_shared", "first_eval_id"} <= set(rep.columns)
