"""Extraction + QC operator tests on the deterministic pages fixture.

Mirrors the reference's operator-level golden tests
(tests/geometry/test_geometry_manager.py pins valid/invalid GPS counts;
tests/geometry/test_line_simplification.py pins outlier counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from water_column_sonar_processing_spark.operators import qc
from water_column_sonar_processing_spark.operators.extract import (
    classify_binary,
    extract_latlon,
    filename_timestamp,
)


def test_extraction_roundtrip_byte_identical(spark, pages_df, pages_pdf):
    """The per-row invariant: text passes through byte-identical, and the
    embedded coordinates parse back to the exact generator values."""
    out = extract_latlon(pages_df.select("url", "text"))
    joined = out.toPandas().set_index("url")
    src = pages_pdf.set_index("url")
    # text untouched
    assert (joined["text"] == src["text"]).all()
    has = src["lat"].notna()
    got = joined.loc[has.index[has], ["lat", "lon"]]
    exp = src.loc[has, ["lat", "lon"]]
    assert (got["lat"] == exp["lat"]).all()
    assert (got["lon"] == exp["lon"]).all()
    # rows without coords -> NULL
    assert joined.loc[has.index[~has], "lat"].isna().all()


def test_classify_binary(spark, pages_df):
    out = pages_df.select(classify_binary(F.col("html")).alias("fmt"))
    cnt = {r["fmt"]: r["n"] for r in out.groupBy("fmt").agg(F.count("*").alias("n")).collect()}
    assert set(cnt) == {"EK60", "EK80"}
    assert cnt["EK60"] > cnt["EK80"]  # 2/3 vs 1/3 of rows


def test_bounds_and_island_filter(spark, pages_df, pages_pdf):
    out = qc.apply_bounds_and_island(extract_latlon(pages_df.select("url", "text")))
    got = out.toPandas().set_index("url")
    src = pages_pdf.set_index("url")
    oob = src[(src["lat"].abs() > 90) | (src["lon"].abs() > 180)]
    assert len(oob) > 0
    assert got.loc[oob.index, "lat"].isna().all()
    island = src[(src["lat"].abs() < 1e-3) & (src["lon"].abs() < 1e-3) & src["lat"].notna()]
    assert len(island) > 0
    assert got.loc[island.index, "lon"].isna().all()
    ok = src[
        src["lat"].notna()
        & (src["lat"].abs() <= 90)
        & (src["lon"].abs() <= 180)
        & ~((src["lat"].abs() < 1e-3) & (src["lon"].abs() < 1e-3))
    ]
    assert got.loc[ok.index, "lat"].notna().all()


def test_distance_jump_nulls_previous(spark, pages_df):
    df = pages_df.select("url", "track_id", "seq", "warc_ts", "lat", "lon")
    out = qc.distance_jump_filter(df, order_col="seq")
    before = df.filter(F.col("track_id").isNotNull() & F.col("lat").isNotNull()).count()
    after = out.filter(F.col("track_id").isNotNull() & F.col("lat").isNotNull()).count()
    # the generator injects ~2 jumps per track x 8 tracks; each nulls ONE row
    assert 0 < before - after <= 20


def test_distance_jump_exact_outlier_count(spark):
    """Reference-shape pin (tests/geometry/test_line_simplification.py:68-81
    asserts exactly 10 outliers): plant exactly 10 teleport points in an
    otherwise-smooth track; the filter must null exactly those 10 rows'
    coords and leave every other row's coords intact."""
    n = 200
    planted = {7, 23, 41, 59, 83, 101, 127, 149, 171, 193}  # 10 outliers
    rows = []
    for i in range(n):
        lat = 10.0 + i * 0.0005  # ~55 m/step, under any sane threshold
        lon = 20.0 + i * 0.0005
        if i in planted:
            lat += 5.0  # ~550 km teleport: i-1 -> i jump fires on row i-1
        rows.append(("t1", i, float(i), lat, lon))
    df = spark.createDataFrame(rows, "track_id string, seq int, warc_ts double, lat double, lon double")
    out = qc.distance_jump_filter(df, order_col="seq").toPandas().set_index("seq")
    nulled = set(out.index[out["lat"].isna()])
    # reference convention: distance(i-1 -> i) over threshold nulls i-1 —
    # and the return from the teleport (i -> i+1) nulls the outlier i too
    expect = planted | {i - 1 for i in planted}
    assert nulled == expect
    kept = out.loc[sorted(set(range(n)) - expect)]
    assert kept["lat"].notna().all() and kept["lon"].notna().all()


def test_full_qc_single_scan_plan(spark):
    """r3 plan guarantee: the composed QC chain reads its input ONCE and
    shuffles ONCE (null-isolating two-level window key shared across both
    window stages) — the r2 filter+union shape scanned the source up to
    4x at ingest."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.when(F.col("id") % 3 == 0, None).otherwise((F.col("id") % 7).cast("string")).alias("track_id"),
        F.col("id").alias("seq"),
        F.col("id").cast("double").alias("warc_ts"),
        (F.col("id") % 170 - 85).cast("double").alias("lat"),
        (F.col("id") % 350 - 175).cast("double").alias("lon"),
    )
    plan = qc.full_qc(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Range (0, 2000") == 1  # single scan of the source
    assert "Union" not in plan


def test_min_group_size_passthrough_nontrack(spark, pages_df):
    df = pages_df.select("url", "track_id", "lat", "lon")
    out = qc.min_group_size_filter(df)
    # non-track rows survive untouched
    assert out.filter(F.col("track_id").isNull()).count() == df.filter(F.col("track_id").isNull()).count()


def test_min_group_size_drops_small_tracks(spark):
    rows = [("a", f"u{i}", 1.0 + i * 0.01, 2.0) for i in range(3)] + [
        ("b", f"v{i}", 1.0 + i * 0.01, 2.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "track_id string, url string, lat double, lon double")
    out = qc.min_group_size_filter(df)
    tracks = {r["track_id"] for r in out.select("track_id").distinct().collect()}
    assert tracks == {"b"}


def test_monotonic_repair(spark):
    rows = [("t", 0, 100), ("t", 1, 200), ("t", 2, 150), ("t", 3, 160), ("t", 4, 300)]
    df = spark.createDataFrame(rows, "track_id string, seq int, warc_ts long")
    out = qc.monotonic_repair(df, ts_col="warc_ts", out_col="fixed")
    got = {r["seq"]: r["fixed"] for r in out.collect()}
    assert got == {0: 100, 1: 200, 2: 200, 3: 200, 4: 300}


def test_assert_sorted_raises(spark):
    rows = [("t", 0, 100), ("t", 1, 50)]
    df = spark.createDataFrame(rows, "track_id string, seq int, ts long")
    import pytest

    with pytest.raises(ValueError):
        qc.assert_sorted(df, "track_id", "seq", "ts")


def test_filename_timestamp(spark):
    df = spark.createDataFrame([("D20070711-T182032.raw",), ("nope",)], "name string")
    got = df.select(filename_timestamp(F.col("name")).alias("ts")).collect()
    assert str(got[0]["ts"]) == "2007-07-11 18:20:32"
    assert got[1]["ts"] is None


def test_distance_jump_nulls_both_coords(spark):
    """Review r4 (confirmed-by-execution finding): the jump mask must
    null lat AND lon together — the two-withColumn form re-analyzed the
    flag against the already-masked lat and left lon populated."""
    rows = [
        ("t", 0, 1000, 10.0, 20.0),
        ("t", 1, 2000, 10.0001, 20.0001),
        ("t", 2, 3000, 15.0, 25.0),  # row 1 -> row 2 is a ~700km jump
        ("t", 3, 4000, 15.0001, 25.0001),
    ]
    df = spark.createDataFrame(rows, "track_id string, seq int, warc_ts long, lat double, lon double")
    out = {r["seq"]: (r["lat"], r["lon"]) for r in qc.distance_jump_filter(df).collect()}
    # row 1 is the flagged row (its NEXT row teleports): both coords NULL
    assert out[1] == (None, None)
    # the null-together invariant holds for every row
    for seq, (la, lo) in out.items():
        assert (la is None) == (lo is None), seq


def test_monotonic_repair_null_group_passthrough(spark):
    """Review r4 (confirmed): NULL-group rows keep their own timestamps
    instead of being clamped against unrelated rows in one mega-window."""
    rows = [
        ("t", 0, 100), ("t", 1, 50),
        (None, 0, 500), (None, 1, 100), (None, 2, 300),
    ]
    df = spark.createDataFrame(rows, "track_id string, seq int, warc_ts long")
    out = qc.monotonic_repair(df, ts_col="warc_ts", out_col="fixed")
    got = {(r["track_id"], r["seq"]): r["fixed"] for r in out.collect()}
    assert got[("t", 0)] == 100 and got[("t", 1)] == 100  # repaired
    # NULL-group rows untouched (each its own value, no cross-clamping)
    assert got[(None, 0)] == 500 and got[(None, 1)] == 100 and got[(None, 2)] == 300


def test_monotonic_repair_requires_order_column(spark):
    import pytest

    df = spark.createDataFrame([("t", 100)], "track_id string, warc_ts long")
    with pytest.raises(ValueError, match="order column"):
        qc.monotonic_repair(df, ts_col="warc_ts")


def test_filename_timestamp_invalid_calendar_is_null(spark):
    """Review r4: regex-valid but calendar-invalid stems (month 13, hour
    25) must yield NULL under ANSI, not throw."""
    from water_column_sonar_processing_spark.operators import extract as ex

    df = spark.createDataFrame(
        [("D20231399-T256090",), ("D20230615-T120000",)], "stem string"
    )
    out = [r["ts"] for r in df.select(ex.filename_timestamp(F.col("stem")).alias("ts")).collect()]
    assert out[0] is None and out[1] is not None
