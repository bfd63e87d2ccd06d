"""Shared Spark session + deterministic fixtures for the test suite.

Mirrors the reference's pytest strategy (SURVEY.md §5): session-scoped
expensive fixtures, deterministic content-addressed inputs (seeded
generator instead of pooch sha256 downloads)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from water_column_sonar_processing_spark.fixtures.pages_gen import (  # noqa: E402
    gen_pages,
    gen_polygons,
    gen_track_points,
)
from water_column_sonar_processing_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wcsp-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    return gen_pages(2000)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    df = spark.createDataFrame(pages_pdf)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def polygons_pdf():
    return gen_polygons()


@pytest.fixture(scope="session")
def track_points_pdf():
    return gen_track_points(4000, 4)


@pytest.fixture(scope="session")
def track_points_df(spark, track_points_pdf):
    df = spark.createDataFrame(track_points_pdf)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
