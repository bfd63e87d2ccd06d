"""S2 implementation invariants (level bits, parent containment, locality,
round-trip against the quadratic ST projection)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.functions import s2


def test_face_assignment():
    lat = np.array([0.0, 0.0, 89.9, -89.9, 0.0, 0.0])
    lon = np.array([0.0, 90.0, 0.0, 0.0, 179.9, -90.0])
    face, _, _ = s2.leaf_ij(lat, lon)
    assert list(face) == [0, 1, 2, 5, 3, 4]


def test_level_encoding():
    lat = np.random.default_rng(7).uniform(-80, 80, 100)
    lon = np.random.default_rng(8).uniform(-179, 179, 100)
    for level in (0, 5, 12, 30):
        ids = s2.s2_cell_np(lat, lon, level)
        assert (s2.s2_level(ids) == level).all()


def test_parent_containment():
    # parent at level 12 computed directly == parent derived from leaf
    rng = np.random.default_rng(11)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    leaf = s2.s2_cell_np(lat, lon, 30).view(np.uint64)
    direct = s2.s2_cell_np(lat, lon, 12).view(np.uint64)
    derived = s2.parent_id(leaf, 12)
    assert (direct == derived).all()


def test_range_containment():
    # children of a cell sort inside [id - lsb + 1, id + lsb - 1]
    rng = np.random.default_rng(13)
    lat = rng.uniform(-85, 85, 200)
    lon = rng.uniform(-180, 180, 200)
    leaf = s2.s2_cell_np(lat, lon, 30).view(np.uint64)
    parent = s2.parent_id(leaf, 10)
    lsb = np.uint64(1) << np.uint64(2 * (30 - 10))
    lo = parent - lsb + np.uint64(1)
    hi = parent + lsb - np.uint64(1)
    assert ((leaf >= lo) & (leaf <= hi)).all()


def test_locality_nearby_points_share_cell():
    # two points ~10 m apart share a level-12 cell (~3-6 km edge) almost surely
    lat = np.array([40.7128, 40.71285])
    lon = np.array([-74.0060, -74.00605])
    ids = s2.s2_cell_np(lat, lon, 12)
    assert ids[0] == ids[1]
    # far-apart points differ
    ids2 = s2.s2_cell_np(np.array([40.7, -33.8]), np.array([-74.0, 151.2]), 12)
    assert ids2[0] != ids2[1]


def test_udf_matches_numpy(spark):
    rng = np.random.default_rng(17)
    lat = rng.uniform(-85, 85, 300)
    lon = rng.uniform(-180, 180, 300)
    expected = s2.s2_cell_np(lat, lon, 12)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double"
    )
    got = [r["c"] for r in df.select(s2.s2_cell_udf(12)(F.col("lat"), F.col("lon")).alias("c")).collect()]
    assert got == list(expected)


def test_udf_null_propagation(spark):
    df = spark.createDataFrame([(None, 1.0), (2.0, None), (3.0, 4.0)], "lat double, lon double")
    got = [r["c"] for r in df.select(s2.s2_cell_udf(12)(F.col("lat"), F.col("lon")).alias("c")).collect()]
    assert got[0] is None and got[1] is None and got[2] is not None


def test_st_uv_roundtrip():
    u = np.linspace(-1, 1, 1001)
    s = s2._st_from_uv(u)
    u2 = s2._uv_from_st(s)
    assert np.allclose(u, u2, atol=1e-12)
