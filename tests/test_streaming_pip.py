"""Streaming PIP assignment == batch pip_join over the same landed files,
for both refine methods (JVM fold and Arrow ray cast)."""

from __future__ import annotations

import os

import pytest

from water_column_sonar_processing_spark.operators.pip import pip_join
from water_column_sonar_processing_spark.streaming.ingest import transform_stream
from water_column_sonar_processing_spark.streaming.pip import pip_assign_stream

STREAM_COLS = ["url", "warc_ts", "text", "lang"]
SCHEMA = "url string, warc_ts timestamp, text string, lang string"


def _land_files(tmp_path, pages_pdf):
    in_dir = str(tmp_path / "pages_in")
    os.makedirs(in_dir)
    pdf = pages_pdf[STREAM_COLS]
    per = (len(pdf) + 2) // 3
    for i in range(3):
        pdf.iloc[i * per : (i + 1) * per].to_parquet(f"{in_dir}/b{i}.parquet", index=False)
    return in_dir


@pytest.mark.parametrize("method", ["jvm", "arrow"])
def test_streaming_pip_matches_batch(spark, tmp_path, pages_pdf, polygons_pdf, method):
    in_dir = _land_files(tmp_path, pages_pdf)
    src = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir)
    name = f"pip_stream_{method}"
    q = (
        pip_assign_stream(src, polygons_pdf, method=method)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{method}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(
        map(tuple, spark.table(name).select("url", "polygon_id").collect())
    )

    batch_l1 = transform_stream(spark.read.schema(SCHEMA).parquet(in_dir))
    expect = sorted(
        map(
            tuple,
            pip_join(batch_l1, polygons_pdf, res=5, keep_cols=("url",), method=method)
            .select("url", "polygon_id")
            .collect(),
        )
    )
    assert got == expect
    assert len(got) > 0  # hot-cell pages land inside the hot polygons
