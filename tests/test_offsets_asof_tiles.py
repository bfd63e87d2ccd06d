"""Offsets (A9), as-of join (J1), tile pyramid, lineage resume tests.

Reference parity anchors: prefix-sum offset semantics
(resample_regrid.py:206-216, hand-pinned rows as in
tests/cruise/test_resample_regrid.py:107-120), searchsorted-backward as-of
(geometry_manager.py:52-77), chunk-aligned rollup (zarr_manager chunk
grid)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.functions import cells
from water_column_sonar_processing_spark.operators import asof as asof_op
from water_column_sonar_processing_spark.operators import offsets as offsets_op
from water_column_sonar_processing_spark.operators import tiles as tiles_op


def test_assign_offsets_pinned_values(spark):
    """Hand-pinned counts -> exact [start, end) offsets (the reference pins
    12 values; we pin 5)."""
    rows = [
        ("b3", 10, "2007-01-03T00:00:00.000Z"),
        ("b1", 7, "2007-01-01T00:00:00.000Z"),
        ("b2", 5, "2007-01-02T00:00:00.000Z"),
        ("b5", 3, "2007-01-05T00:00:00.000Z"),
        ("b4", 11, "2007-01-04T00:00:00.000Z"),
    ]
    meta = spark.createDataFrame(rows, "track_id string, num_rows_valid long, start_ts string")
    out = {r["track_id"]: (r["start_idx"], r["end_idx"]) for r in offsets_op.assign_offsets(meta).collect()}
    assert out == {"b1": (0, 7), "b2": (7, 12), "b3": (12, 22), "b4": (22, 33), "b5": (33, 36)}


def test_global_row_index_dense_and_deterministic(spark):
    rows = []
    for b, n in (("a", 5), ("b", 3)):
        for i in range(n):
            rows.append((b, f"u-{b}-{i}", 1000 + i, 1.0, 2.0))
    df = spark.createDataFrame(rows, "track_id string, url string, warc_ts long, lat double, lon double")
    meta = offsets_op.assign_offsets(
        df.groupBy("track_id").agg(
            F.count("*").alias("num_rows_valid"), F.min("warc_ts").cast("string").alias("start_ts")
        )
    )
    out = offsets_op.global_row_index(df, meta)
    idx = sorted(r["global_idx"] for r in out.collect())
    assert idx == list(range(8))  # dense, no gaps, no dupes


def test_asof_window_equals_merge_asof(spark):
    """The scale-path window as-of must equal pandas merge_asof exactly."""
    rng = np.random.default_rng(5)
    left_rows = [("g1", int(t)) for t in np.sort(rng.integers(0, 1000, 60))] + [
        ("g2", int(t)) for t in np.sort(rng.integers(0, 1000, 40))
    ]
    right_rows = [("g1", int(t), float(v)) for t, v in zip(np.sort(rng.integers(0, 1000, 20)), rng.uniform(0, 1, 20))] + [
        ("g2", int(t), float(v)) for t, v in zip(np.sort(rng.integers(0, 1000, 15)), rng.uniform(0, 1, 15))
    ]
    # dedupe right on (group, ts) for deterministic semantics
    rpdf = pd.DataFrame(right_rows, columns=["g", "ts", "v"]).groupby(["g", "ts"], as_index=False)["v"].max()
    lpdf = pd.DataFrame(left_rows, columns=["g", "ts"]).drop_duplicates()
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = asof_op.asof_join(left, right, ts_col="ts", by="g", value_cols=("v",)).toPandas()
    exp_parts = []
    for g, lg in lpdf.groupby("g"):
        rg = rpdf[rpdf["g"] == g][["ts", "v"]].sort_values("ts")
        exp_parts.append(pd.merge_asof(lg.sort_values("ts"), rg, on="ts", direction="backward").assign(g=g))
    exp = pd.concat(exp_parts)
    gm = got.sort_values(["g", "ts"]).reset_index(drop=True)
    em = exp[["g", "ts", "v"]].sort_values(["g", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gm[["g", "ts", "v"]], em, check_dtype=False)


def test_asof_exact_variant_matches_window(spark):
    left = spark.createDataFrame([("g", 5), ("g", 15), ("g", 2)], "g string, ts long")
    right = spark.createDataFrame([("g", 3, 1.0), ("g", 10, 2.0), ("g", 15, 3.0)], "g string, ts long, v double")
    w = {(r["g"], r["ts"]): r["v"] for r in asof_op.asof_join(left, right, "ts", "g", ("v",)).collect()}
    e = {(r["g"], r["ts"]): r["v"] for r in asof_op.asof_join_exact(left, right, "ts", "g", ("v",)).collect()}
    assert w == e == {("g", 2): None, ("g", 5): 1.0, ("g", 15): 3.0}  # tie at 15 -> inclusive


def test_asof_unkeyed_is_bucketed_and_exact(spark):
    """asof_join(by=None) must (a) equal pandas merge_asof exactly and
    (b) stay DISTRIBUTED — the r2 implementation put every row in one
    global window partition; the r3 range-bucketed variant's shuffle key
    is the ts bucket, so the big windows run n_buckets-way parallel."""
    rng = np.random.default_rng(11)
    lts = np.sort(rng.integers(0, 100000, 5000))
    rts = np.unique(np.sort(rng.integers(0, 100000, 300)))
    rv = rng.uniform(0, 1, len(rts))
    lpdf = pd.DataFrame({"ts": lts.astype("int64"), "k": np.arange(len(lts), dtype="int64")}).drop_duplicates("ts")
    rpdf = pd.DataFrame({"ts": rts.astype("int64"), "v": rv})
    left = spark.createDataFrame(lpdf).repartition(8)
    right = spark.createDataFrame(rpdf).repartition(4)
    out = asof_op.asof_join(left, right, ts_col="ts", by=None, value_cols=("v",))
    got = out.toPandas().sort_values("ts").reset_index(drop=True)
    exp = pd.merge_asof(lpdf.sort_values("ts"), rpdf, on="ts", direction="backward").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["ts", "k", "v"]], exp[["ts", "k", "v"]], check_dtype=False)
    # plan check: the bulk window is partitioned by the bucket column, not
    # a single global partition (the tiny carry frame may still have one)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_bkt" in plan


def test_asof_unkeyed_left_before_any_right_gets_null(spark):
    left = spark.createDataFrame([(1,), (50,), (100,)], "ts long")
    right = spark.createDataFrame([(60, 7.0)], "ts long, v double")
    got = {r["ts"]: r["v"] for r in asof_op.asof_join(left, right, "ts", None, ("v",)).collect()}
    assert got == {1: None, 50: None, 100: 7.0}


def test_tile_pyramid_rollup_consistency(spark, pages_df):
    """Sum of child doc_counts at res z+1 == parent count at res z, and
    per-zoom totals are constant (no rows lost in the rollup)."""
    pyr = tiles_op.tile_pyramid(pages_df, base_res=10, min_res=6).cache()
    totals = {r["zoom"]: r["n"] for r in pyr.groupBy("zoom").agg(F.sum("doc_count").alias("n")).collect()}
    assert len(set(totals.values())) == 1  # same total at every zoom
    child = pyr.filter(F.col("zoom") == 8).select(
        (F.lit(7) * F.lit(1 << 58) + (F.floor(F.col("gy") / 2)) * F.lit(1 << 26) + F.floor(F.col("gx") / 2)).alias(
            "pcell"
        ),
        "doc_count",
    )
    rolled = child.groupBy("pcell").agg(F.sum("doc_count").alias("n"))
    parent = pyr.filter(F.col("zoom") == 7).select(F.col("cell_id").alias("pcell"), F.col("doc_count").alias("m"))
    bad = rolled.join(parent, "pcell", "full").filter(
        F.coalesce("n", F.lit(-1)) != F.coalesce("m", F.lit(-2))
    )
    assert bad.count() == 0


def test_tile_pyramid_no_empty_tiles(spark, pages_df):
    pyr = tiles_op.tile_pyramid(pages_df, base_res=8, min_res=4)
    assert pyr.filter(F.col("doc_count") <= 0).count() == 0


def test_grid_parent_matches_direct_encode(spark, pages_df):
    df = pages_df.filter(F.col("lat").isNotNull()).select(
        cells.grid_cell(F.col("lat"), F.col("lon"), 12).alias("c12"),
        cells.grid_cell(F.col("lat"), F.col("lon"), 6).alias("c6"),
    )
    bad = df.withColumn("p6", cells.grid_parent(F.col("c12"), 12, 6)).filter(F.col("p6") != F.col("c6"))
    assert bad.count() == 0


def test_asof_exact_duplicate_ts_matches_asof_join(spark):
    """Review r4: duplicate (by, ts) right rows must resolve by the same
    greatest-struct tie-break in BOTH the operator and its parity oracle
    (merge_asof keeps the last sorted row; sorting by (ts, values) pins it)."""
    from water_column_sonar_processing_spark.operators import asof as asof_op

    left = spark.createDataFrame([("g", 7, "u1")], "track_id string, ts long, url string")
    right = spark.createDataFrame(
        [("g", 5, 10.0, 1.0), ("g", 5, 20.0, 2.0)],
        "track_id string, ts long, lat double, lon double",
    )
    a = asof_op.asof_join(left, right, ts_col="ts").collect()[0]
    b = asof_op.asof_join_exact(left, right, ts_col="ts").collect()[0]
    assert (a["lat"], a["lon"]) == (b["lat"], b["lon"]) == (20.0, 2.0)


def test_tile_pyramid_drops_nan_coords(spark):
    from water_column_sonar_processing_spark.operators import tiles as tiles_op

    nan = float("nan")
    pts = spark.createDataFrame(
        [(10.0, 20.0), (nan, 20.0), (10.0, nan), (None, 20.0)],
        "lat double, lon double",
    )
    out = tiles_op.tile_pyramid(pts, base_res=4, min_res=4).collect()
    assert sum(r["doc_count"] for r in out) == 1  # only the clean point counted
