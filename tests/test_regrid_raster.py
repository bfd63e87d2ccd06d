"""Regrid (U2) + raster join (J7) tests with numpy oracles."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.operators import raster as raster_op
from water_column_sonar_processing_spark.operators import regrid as regrid_op


def test_regrid_nearest_matches_searchsorted(spark):
    rng = np.random.default_rng(21)
    ts = np.sort(rng.integers(0, 10_000, 200)).astype(np.int64)
    ts = np.unique(ts)
    lat = rng.uniform(-10, 10, len(ts))
    rows = [("t", int(t), float(la), 0.0) for t, la in zip(ts, lat)]
    df = spark.createDataFrame(rows, "track_id string, ts long, lat double, lon double")
    step = 100
    out = regrid_op.regrid_tracks(df, step=step).orderBy("grid_ts").toPandas()
    # oracle
    lo = int(np.ceil(ts[0] / step))
    hi = int(np.floor(ts[-1] / step))
    grid = np.arange(lo, hi + 1) * step
    right = np.searchsorted(ts, grid, side="left")
    left = np.clip(right - 1, 0, len(ts) - 1)
    right = np.clip(right, 0, len(ts) - 1)
    idx = np.where(np.abs(ts[right] - grid) < np.abs(grid - ts[left]), right, left)
    assert list(out["grid_ts"]) == list(grid)
    assert np.allclose(out["lat"].to_numpy(), lat[idx])
    assert list(out["src_ts"]) == list(ts[idx])


def test_regrid_max_gap_drops_sparse(spark):
    rows = [("t", 0, 1.0, 1.0), ("t", 10_000, 2.0, 2.0)]
    df = spark.createDataFrame(rows, "track_id string, ts long, lat double, lon double")
    out = regrid_op.regrid_tracks(df, step=1000, max_gap=500).collect()
    # only grid points near the two observations survive
    kept = sorted(r["grid_ts"] for r in out)
    assert kept == [0, 10_000]


def test_regrid_parallel_groups(spark):
    rows = []
    for t in range(6):
        for i in range(50):
            rows.append((f"t{t}", i * 77 + t, float(t), float(i)))
    df = spark.createDataFrame(rows, "track_id string, ts long, lat double, lon double").repartition(4)
    out = regrid_op.regrid_tracks(df, step=100)
    per = {r["track_id"]: r["n"] for r in out.groupBy("track_id").agg(F.count("*").alias("n")).collect()}
    assert len(per) == 6 and all(v > 30 for v in per.values())
    # values come only from the own track (lat encodes track id)
    bad = out.filter(F.col("lat") != F.regexp_extract("track_id", r"t(\d+)", 1).cast("double")).count()
    assert bad == 0


def test_rasterize_then_lookup_roundtrip(spark, pages_df):
    pts = pages_df.filter(F.col("lat").isNotNull())
    band = raster_op.rasterize(pts, res=5)
    looked = raster_op.raster_lookup(pts, band, res=5)
    # every point finds its own cell's count, and count >= 1
    assert looked.filter(F.col("count").isNull()).count() == 0
    assert looked.filter(F.col("count") < 1).count() == 0
    # total of counts joined back == sum over cells of count^2
    lhs = looked.agg(F.sum("count")).collect()[0][0]
    rhs = band.agg(F.sum(F.col("count") * F.col("count"))).collect()[0][0]
    assert lhs == rhs


def test_raster_lookup_left_join_nulls(spark):
    pts = spark.createDataFrame([("far", 80.0, 170.0)], "url string, lat double, lon double")
    band = spark.createDataFrame([(0, 5)], "cell_id long, count long")
    out = raster_op.raster_lookup(pts, band, res=5).collect()
    assert out[0]["count"] is None
