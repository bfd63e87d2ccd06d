"""Property-based tests (hypothesis) for the cell encoders — the piece of
the test pyramid the reference lacks (SURVEY.md §5 'no property-based
testing'): random coordinates must satisfy the encoder invariants AND the
Spark<->DuckDB SQL-twin bit-parity the correctness gate depends on."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from water_column_sonar_processing_spark.functions import cells, s2

finite_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
finite_lon = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


def _py_grid_cell(lat: float, lon: float, res: int) -> int:
    """Pure-python reference for the packed grid id."""
    s_ = 180.0 / (1 << res)
    nx = 2 * (1 << res)
    ny = 1 << res
    gx = max(min(int(np.floor((lon + 180.0) / s_)), nx - 1), 0)
    gy = max(min(int(np.floor((lat + 90.0) / s_)), ny - 1), 0)
    return res * (1 << 58) + gy * (1 << 26) + gx


@given(finite_lat, finite_lon, st.integers(min_value=0, max_value=15))
@settings(max_examples=300, deadline=None)
def test_grid_cell_sql_twin_property(lat, lon, res):
    """The DuckDB SQL twin reproduces the python/numpy semantics for any
    coordinate (duck stands in for Spark here — test_cells.py pins the
    Spark==duck direction on fixed points; this covers the space)."""
    sql = cells.grid_cell_sql(repr(lat), repr(lon), res)
    got = duckdb.sql(f"SELECT {sql} AS c").fetchone()[0]
    assert got == _py_grid_cell(lat, lon, res)


@given(finite_lat, finite_lon, st.integers(min_value=2, max_value=12))
@settings(max_examples=200, deadline=None)
def test_grid_parent_property(lat, lon, res):
    child = _py_grid_cell(lat, lon, res)
    parent_sql = cells.grid_parent_sql(str(child), res, res - 2)
    got = duckdb.sql(f"SELECT {parent_sql} AS c").fetchone()[0]
    assert got == _py_grid_cell(lat, lon, res - 2)


@given(finite_lat, finite_lon)
@settings(max_examples=200, deadline=None)
def test_hex_cell_round_property(lat, lon):
    """Hex cube-rounding invariant: rounded q+r+y == 0 and the cell center
    is within one hex size of the input point (containment-ish)."""
    if abs(lat) > 85:
        return  # equirect hex grid distorts at the poles; QC bounds clamp
    sqlc = cells.hex_cell_sql(repr(lat), repr(lon), 7)
    cell = duckdb.sql(f"SELECT {sqlc} AS c").fetchone()[0]
    res = cell // (1 << 52)
    rem = cell - res * (1 << 52)
    q = rem // (1 << 21) - (1 << 20)
    r = rem % (1 << 21) - (1 << 20)
    assert res == 7
    s_ = 1.0 / (1 << 7)
    clat = 1.5 * r * s_
    clon = (q * s_ + clat / 3.0) / (np.sqrt(3.0) / 3.0)
    assert abs(clat - lat) < 2.5 * s_
    assert abs(clon - lon) < 3.0 * s_


@given(
    st.lists(st.tuples(finite_lat, finite_lon), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=50, deadline=None)
def test_s2_parent_containment_property(points, level):
    lat = np.array([p[0] for p in points])
    lon = np.array([p[1] for p in points])
    leaf = s2.s2_cell_np(lat, lon, 30).view(np.uint64)
    direct = s2.s2_cell_np(lat, lon, level).view(np.uint64)
    derived = s2.parent_id(leaf, level)
    assert (direct == derived).all()
    assert (s2.s2_level(direct.view(np.int64)) == level).all()


@pytest.mark.parametrize("res", [3, 7, 11])
def test_spark_duck_twin_on_random_batch(spark, res):
    """Bulk Spark<->DuckDB twin parity on 2000 random coords (one Spark
    job instead of 2000 — hypothesis drives duck-vs-python above)."""
    rng = np.random.default_rng(res)
    pdf = pd.DataFrame(
        {
            "id": np.arange(2000),
            "lat": rng.uniform(-90, 90, 2000),
            "lon": rng.uniform(-180, 180, 2000),
        }
    )
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = {
        r["id"]: (r["g"], r["h"])
        for r in sdf.select(
            "id",
            cells.grid_cell(F.col("lat"), F.col("lon"), res).alias("g"),
            cells.hex_cell(F.col("lat"), F.col("lon"), res).alias("h"),
        ).collect()
    }
    duckdb.register("rand_pts", pdf)
    duck = {
        int(i): (int(g), int(h))
        for i, g, h in duckdb.sql(
            f"SELECT id, {cells.grid_cell_sql('lat', 'lon', res)} AS g, "
            f"{cells.hex_cell_sql('lat', 'lon', res)} AS h FROM rand_pts"
        ).fetchall()
    }
    assert got == duck
