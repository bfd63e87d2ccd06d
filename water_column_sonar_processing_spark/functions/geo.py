"""Geodesic/planar distance + GPS quality-control column expressions.

Reference parity (all native Spark expressions, whole-stage codegen):

- bounds QC: lat outside +-90 / lon outside +-180 -> NULL
  (/root/reference/water_column_sonar_processing/processing/raw_to_zarr.py:230-244)
- null-island QC: |lat|<1e-3 AND |lon|<1e-3 -> NULL (raw_to_zarr.py:265-272,
  geometry/geometry_manager.py:88-95)
- haversine / equirectangular planar distance: analog of the reference's
  projected-CRS point distance (geometry/spatiotemporal.py:39-46,
  geometry/line_simplification.py:117-124)

NaN-vs-NULL: the reference uses NaN as the missing sentinel (zarr
fill_value=NaN, model/zarr_manager.py:109,155,197); Spark keeps NaN
distinct from NULL and sorts it above all values, so these QC ops
normalize BOTH out-of-range values and NaN to SQL NULL at ingest
(SURVEY.md §7.4 hard-parts list).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # IUGG mean Earth radius

NULL_ISLAND_EPS = 1e-3  # geometry_manager.py:88-95 threshold
DISTANCE_JUMP_M = 100.0  # line_simplification.py:138-158 threshold
MIN_TRACK_POINTS = 4  # geometry_manager.py:97-107 MIN_ALLOWED_SIZE

KNOTS_PER_MPS = 1.94384  # line_simplification.py:24-31 unit conversion
MPS_PER_KNOT = 0.514444


def qc_bounds(lat: Column, lon: Column) -> tuple[Column, Column]:
    """Out-of-range or NaN coordinates -> NULL (P2). Returns (lat, lon)."""
    ok = (
        lat.isNotNull()
        & lon.isNotNull()
        & ~F.isnan(lat)
        & ~F.isnan(lon)
        & lat.between(-90.0, 90.0)
        & lon.between(-180.0, 180.0)
    )
    return F.when(ok, lat), F.when(ok, lon)


def qc_bounds_sql(lat: str, lon: str) -> tuple[str, str]:
    """DuckDB twin of :func:`qc_bounds` (NaN check included)."""
    ok = (
        f"({lat} IS NOT NULL AND {lon} IS NOT NULL AND NOT isnan({lat}) AND NOT isnan({lon})"
        f" AND {lat} BETWEEN -90.0 AND 90.0 AND {lon} BETWEEN -180.0 AND 180.0)"
    )
    return f"(CASE WHEN {ok} THEN {lat} END)", f"(CASE WHEN {ok} THEN {lon} END)"


def qc_null_island(lat: Column, lon: Column, eps: float = NULL_ISLAND_EPS) -> tuple[Column, Column]:
    """|lat|<eps AND |lon|<eps -> NULL (P3, the 'null island' filter)."""
    bad = (F.abs(lat) < F.lit(eps)) & (F.abs(lon) < F.lit(eps))
    return F.when(~bad, lat), F.when(~bad, lon)


def qc_null_island_sql(lat: str, lon: str, eps: float = NULL_ISLAND_EPS) -> tuple[str, str]:
    bad = f"(ABS({lat}) < {eps!r} AND ABS({lon}) < {eps!r})"
    return f"(CASE WHEN NOT {bad} THEN {lat} END)", f"(CASE WHEN NOT {bad} THEN {lon} END)"


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (native trig, codegen'd)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = F.sin(dphi / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlam / 2) ** 2
    # clamp: float rounding can push a marginally above 1 for near-
    # antipodal pairs; asin(>1) is NaN and NaN sorts greatest, so a
    # threshold filter would treat the pair as infinitely far (r4 review)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.sqrt(a), F.lit(1.0)))


def equirect_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Equirectangular-approximation distance in meters — the analog of the
    reference's projected-CRS planar distance (spatiotemporal.py:41-44);
    accurate to <0.5% at track-point spacing."""
    x = F.radians(lon2 - lon1) * F.cos(F.radians((lat1 + lat2) / 2))
    y = F.radians(lat2 - lat1)
    return F.lit(EARTH_RADIUS_M) * F.sqrt(x * x + y * y)


def planar_deg_sq(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Squared planar distance in degree units — integer-exact-friendly
    ranking metric for oracle-checked kNN (no transcendental functions,
    bit-identical on DuckDB)."""
    dx = lon2 - lon1
    dy = lat2 - lat1
    return dx * dx + dy * dy


def planar_deg_sq_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return f"((({lon2}) - ({lon1})) * (({lon2}) - ({lon1})) + (({lat2}) - ({lat1})) * (({lat2}) - ({lat1})))"


def planar_deg_sq_wrapped(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Squared planar degree distance with antimeridian wrap on the lon
    axis: dlon = min(|dlon|, 360 - |dlon|). Used by grid kNN, whose
    candidate rings wrap in gx."""
    adlon = F.abs(lon2 - lon1)
    dx = F.least(adlon, F.lit(360.0) - adlon)
    dy = lat2 - lat1
    return dx * dx + dy * dy


def planar_deg_sq_wrapped_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    adlon = f"ABS(({lon2}) - ({lon1}))"
    dx = f"LEAST({adlon}, 360.0e0 - {adlon})"
    dy = f"(({lat2}) - ({lat1}))"
    return f"(({dx}) * ({dx}) + {dy} * {dy})"


def mps_to_knots(mps: Column) -> Column:
    """m/s -> knots (reference constant 1.94384, line_simplification.py:24-31)."""
    return mps * F.lit(KNOTS_PER_MPS)
