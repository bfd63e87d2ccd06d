"""GPS/coordinate quality control — window-based filters (all native).

Reference analogs (file:line in /root/reference/water_column_sonar_processing/):
- P2 bounds -> NULL: processing/raw_to_zarr.py:230-244
- P3 null island -> NULL: processing/raw_to_zarr.py:265-272
- P4 distance-jump outlier nulls the PREVIOUS point:
  geometry/line_simplification.py:138-158 (reference test pins exactly 10
  outliers, tests/geometry/test_line_simplification.py:68-81)
- P6 reject groups with < 4 valid points: geometry/geometry_manager.py:97-107
- W5 sortedness assertion: geometry/geometry_manager.py:66-70
- W6 monotonic-time repair: processing/raw_to_zarr.py:199-207 (echopype
  _clean_reversed analog — here a running-max clamp)

The distance-jump filter uses a lead() window: the reference computes
distance(i-1 -> i) and nulls index i-1, which is exactly "null row i when
distance(i -> i+1) exceeds the threshold".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geo


def apply_bounds_and_island(df: DataFrame, lat: str = "lat", lon: str = "lon") -> DataFrame:
    """P2 + P3: out-of-range, NaN, and null-island coords -> NULL."""
    la, lo = geo.qc_bounds(F.col(lat), F.col(lon))
    la, lo = geo.qc_null_island(la, lo)
    return df.withColumn(lat, la).withColumn(lon, lo)


def distance_jump_filter(
    df: DataFrame,
    group_col: str = "track_id",
    order_col: str = "warc_ts",
    lat: str = "lat",
    lon: str = "lon",
    threshold_m: float = geo.DISTANCE_JUMP_M,
) -> DataFrame:
    """P4: null the coords of a row whose distance to the NEXT row exceeds
    the threshold (the reference's previous-index convention).

    Non-track rows (NULL group key) pass through untouched — consecutive
    unrelated pages are not a GPS sequence, and a NULL mega-window would be
    a skew hazard at scale."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    nlat = F.lead(lat).over(w)
    nlon = F.lead(lon).over(w)
    d = geo.equirect_m(F.col(lat), F.col(lon), nlat, nlon)
    bad = nlat.isNotNull() & (d > F.lit(threshold_m))
    tracked = (
        df.filter(F.col(group_col).isNotNull())
        .withColumn("_jump", bad)
        .withColumn(lat, F.when(~F.coalesce(F.col("_jump"), F.lit(False)), F.col(lat)))
        .withColumn(lon, F.when(~F.coalesce(F.col("_jump"), F.lit(False)), F.col(lon)))
        .drop("_jump")
    )
    return tracked.unionByName(df.filter(F.col(group_col).isNull()))


def min_group_size_filter(
    df: DataFrame, group_col: str = "track_id", lat: str = "lat", min_points: int = geo.MIN_TRACK_POINTS
) -> DataFrame:
    """P6: drop all rows of groups having fewer than min_points valid coords.

    Implemented as a window count (no second scan / no collect). Rows with a
    NULL group key are NOT tracks and pass through untouched — grouping them
    into one giant NULL window would both change semantics and create a
    mega-partition skew hazard at scale."""
    w = Window.partitionBy(group_col)
    grouped = (
        df.filter(F.col(group_col).isNotNull())
        .withColumn("_valid_cnt", F.count(F.col(lat)).over(w))
        .filter(F.col("_valid_cnt") >= F.lit(min_points))
        .drop("_valid_cnt")
    )
    return grouped.unionByName(df.filter(F.col(group_col).isNull()))


def monotonic_repair(
    df: DataFrame, group_col: str = "track_id", ts_col: str = "warc_ts", out_col: str | None = None
) -> DataFrame:
    """W6: repair reversed timestamps with a per-group running-max clamp.

    ts_fixed = max(ts) over (partition by group order by original position
    rows unbounded preceding). Position is the stable input order key
    (`seq` if present, else the timestamp itself sorted — caller supplies a
    deterministic order column via `seq`)."""
    out_col = out_col or ts_col
    order = "seq" if "seq" in df.columns else ts_col
    w = Window.partitionBy(group_col).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.max(ts_col).over(w))


def assert_sorted(df: DataFrame, group_col: str, order_col: str, ts_col: str) -> None:
    """W5: fail fast if ts is not non-decreasing along order within groups."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    bad = (
        df.withColumn("_prev", F.lag(ts_col).over(w))
        .filter(F.col("_prev").isNotNull() & (F.col(ts_col) < F.col("_prev")))
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(f"{ts_col} not sorted within {group_col} by {order_col}")


def full_qc(df: DataFrame, group_col: str = "track_id", order_col: str = "warc_ts") -> DataFrame:
    """The composed L0 QC chain (bounds -> island -> jump -> min-size)."""
    out = apply_bounds_and_island(df)
    out = distance_jump_filter(out, group_col=group_col, order_col=order_col)
    return min_group_size_filter(out, group_col=group_col)
