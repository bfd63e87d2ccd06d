"""Cell-encoder unit tests: exact ids, packing round-trips, SQL-twin parity
(the DuckDB oracle must be bit-identical — the correctness gate's core)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.functions import cells


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (0, 0.0, 0.0),
        (1, 40.712345, -74.006789),
        (2, 51.5074, -0.1276),
        (3, -89.999999, 179.999999),
        (4, 90.0, 180.0),
        (5, -90.0, -180.0),
        (6, 85.05, 12.34),
        (7, -33.8688, 151.2093),
        (8, 0.0001, -0.0001),
        (9, 64.1466, -21.9426),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    df.createOrReplaceTempView("pts_cells")
    return df


def test_grid_cell_known_values(spark, pts):
    # res 0: cell size 180 deg -> gx in {0,1}, gy == 0
    out = {r["id"]: r["c"] for r in pts.withColumn("c", cells.grid_cell(F.col("lat"), F.col("lon"), 0)).collect()}
    assert out[0] == 0 * (1 << 58) + 0 * (1 << 26) + 1  # (0,0) -> gx=1 (lon 0 is in east half)
    assert out[5] == 0  # (-90,-180) -> gx=0, gy=0
    assert out[4] == 0 * (1 << 58) + 0 * (1 << 26) + 1  # clamped top corner


def test_grid_parent_consistency(spark, pts):
    df = pts.withColumn("c12", cells.grid_cell(F.col("lat"), F.col("lon"), 12)).withColumn(
        "c7_direct", cells.grid_cell(F.col("lat"), F.col("lon"), 7)
    ).withColumn("c7_parent", cells.grid_parent(F.col("c12"), 12, 7))
    bad = df.filter(F.col("c7_direct") != F.col("c7_parent")).count()
    assert bad == 0


def test_grid_cell_sql_twin_parity(spark, pts):
    for res in (0, 3, 7, 12):
        got_spark = {
            r["id"]: r["c"]
            for r in pts.withColumn("c", cells.grid_cell(F.col("lat"), F.col("lon"), res)).collect()
        }
        pdf = pts.toPandas()
        duckdb.register("pts_duck", pdf)
        sql = f"SELECT id, {cells.grid_cell_sql('lat', 'lon', res)} AS c FROM pts_duck"
        got_duck = {int(i): int(c) for i, c in duckdb.sql(sql).fetchall()}
        assert got_spark == got_duck, f"res={res}"


def test_hex_cell_sql_twin_parity(spark, pts):
    for res in (3, 7, 10):
        got_spark = {
            r["id"]: r["c"] for r in pts.withColumn("c", cells.hex_cell(F.col("lat"), F.col("lon"), res)).collect()
        }
        pdf = pts.toPandas()
        duckdb.register("pts_duck2", pdf)
        sql = f"SELECT id, {cells.hex_cell_sql('lat', 'lon', res)} AS c FROM pts_duck2"
        got_duck = {int(i): int(c) for i, c in duckdb.sql(sql).fetchall()}
        assert got_spark == got_duck, f"res={res}"


def test_hex_cell_center_roundtrip(spark, pts):
    # center of the assigned hex must re-encode to the same hex
    df = pts.filter(F.abs(F.col("lat")) < 80).withColumn("c", cells.hex_cell(F.col("lat"), F.col("lon"), 7))
    clat, clon = cells.hex_cell_center(F.col("c"))
    df2 = df.withColumn("c2", cells.hex_cell(clat, clon, 7))
    assert df2.filter(F.col("c") != F.col("c2")).count() == 0


def test_hex_kring_sizes():
    for k in (0, 1, 2, 3):
        assert len(cells.hex_kring_offsets(k)) == 1 + 3 * k * (k + 1)


def test_mercator_tile_known(spark):
    # (0,0) at zoom 1 -> tile (1,1) by the OSM convention
    df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    r = df.select(cells.mercator_tile(F.col("lat"), F.col("lon"), 1).alias("t")).collect()[0]["t"]
    zoom, tx, ty = 1, 1, 1
    assert r == zoom * (1 << 52) + ty * (1 << 26) + tx
    # London zoom 10: known slippy tile (511, 340) for (51.5074, -0.1276)
    df = spark.createDataFrame([(51.5074, -0.1276)], "lat double, lon double")
    r = df.select(cells.mercator_tile(F.col("lat"), F.col("lon"), 10).alias("t")).collect()[0]["t"]
    assert r == 10 * (1 << 52) + 340 * (1 << 26) + 511


def test_mercator_decode_roundtrip(spark, pts):
    df = pts.withColumn("t", cells.mercator_tile(F.col("lat"), F.col("lon"), 9))
    z, tx, ty = cells.mercator_decode(F.col("t"))
    out = df.select(z.alias("z"), tx.alias("tx"), ty.alias("ty")).collect()
    for r in out:
        assert r["z"] == 9 and 0 <= r["tx"] < 512 and 0 <= r["ty"] < 512


def test_grid_cell_and_xy_nan_guard(spark):
    """Review r4: NaN coords must yield NULL cells (NaN sorts greatest in
    Spark, so unguarded least/greatest routed them to the max corner)."""
    import pyspark.sql.functions as F
    from water_column_sonar_processing_spark.functions import cells

    nan = float("nan")
    df = spark.createDataFrame(
        [(nan, 20.0), (10.0, nan), (10.0, 20.0), (None, 20.0)], "lat double, lon double"
    )
    gx, gy = cells.grid_cell_xy(F.col("lat"), F.col("lon"), 5)
    out = df.select(
        cells.grid_cell(F.col("lat"), F.col("lon"), 5).alias("c"), gx.alias("gx"), gy.alias("gy")
    ).collect()
    assert [r["c"] is None for r in out] == [True, True, False, True]
    assert [r["gx"] is None for r in out] == [True, True, False, True]


def test_quality_score_null_text_is_zero(spark):
    """Review r4: least() skips NULL operands, so NULL text used to score
    400 (outranking real short docs) — both dialects now return 0."""
    import duckdb
    import pyspark.sql.functions as F
    from water_column_sonar_processing_spark.functions import text as tx

    df = spark.createDataFrame([(None,), ("hi there",)], "text string")
    got = [r["q"] for r in df.select(tx.quality_score_x1000(F.col("text")).alias("q")).collect()]
    assert got[0] == 0 and got[1] > 0
    sql = tx.quality_score_x1000_sql("text")
    duck = duckdb.connect().execute(
        f"SELECT {sql} AS q FROM (VALUES (CAST(NULL AS VARCHAR)), ('hi there')) t(text)"
    ).fetchall()
    assert duck[0][0] == 0 and duck[1][0] == got[1]
