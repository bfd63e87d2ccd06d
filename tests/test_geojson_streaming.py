"""GeoJSON round-trip + streaming ingest tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from water_column_sonar_processing_spark.operators import tracks as tracks_op
from water_column_sonar_processing_spark.sources import geojson as gj
from water_column_sonar_processing_spark.streaming.ingest import stream_ingest_l1


def test_geojson_roundtrip(spark, track_points_df):
    """tracks_to_geojson -> parse -> points: the S12/S13 inverse pair."""
    sink = tracks_op.tracks_to_geojson(track_points_df)
    fc = sink.select(
        F.to_json(
            F.struct(
                F.lit("FeatureCollection").alias("type"),
                F.array(F.from_json("geojson", gj.FEATURE_SCHEMA)).alias("features"),
            )
        ).alias("geojson"),
        "track_id",
        "n_points",
    )
    feats = gj.parse_feature_collections(fc)
    pts = gj.linestring_to_points(feats.select("coordinates", "geom_type"))
    n_in = track_points_df.filter(F.col("lat").isNotNull()).count()
    assert pts.count() == n_in
    got = pts.filter(F.col("seq") == 0).count()
    assert got == 4  # one first-point per track
    # coordinates survive the round trip (float32 -> json -> double)
    one = json.loads(sink.limit(1).collect()[0]["geojson"])
    assert one["geometry"]["type"] == "LineString"


def test_streaming_ingest_availablenow(spark, pages_pdf, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    pages_pdf[["url", "warc_ts", "text", "lang"]].to_parquet(in_dir + "/batch1.parquet", index=False)

    qy = stream_ingest_l1(spark, in_dir, out_dir, ckpt)
    qy.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == len(pages_pdf)
    assert "cell_id" in out.columns and "lang" in out.columns
    # exactly-once: re-running with the same checkpoint adds nothing
    qy2 = stream_ingest_l1(spark, in_dir, out_dir, ckpt)
    qy2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(pages_pdf)
    # new file -> incremental processing
    pages_pdf[["url", "warc_ts", "text", "lang"]].head(100).assign(
        url=lambda d: d["url"] + "?v2"
    ).to_parquet(in_dir + "/batch2.parquet", index=False)
    qy3 = stream_ingest_l1(spark, in_dir, out_dir, ckpt)
    qy3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(pages_pdf) + 100
