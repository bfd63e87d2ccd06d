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


# Two-level window key that isolates every NULL-group row into its own
# singleton window: tracked rows get (group, 0); untracked rows get
# (NULL, unique-id), so they hash-distribute uniformly (no NULL
# mega-partition) and window functions see them as 1-row windows —
# pass-through semantics in the SAME scan, instead of the r2
# filter(isNotNull) ... unionByName(filter(isNull)) shape that read the
# source twice per QC stage (4x at ingest through full_qc).
_QC_PK = "_qc_pk"


def _with_null_isolating_key(df: DataFrame, group_col: str) -> tuple[DataFrame, bool]:
    """Returns (df_with_key, added). monotonically_increasing_id is unique
    per row within a job, which is all the isolation needs — the ids never
    appear in the output."""
    if _QC_PK in df.columns:
        return df, False
    key = F.when(F.col(group_col).isNull(), F.monotonically_increasing_id()).otherwise(F.lit(0))
    return df.withColumn(_QC_PK, key), True


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

    Non-track rows (NULL group key) pass through untouched: they ride the
    same scan in singleton windows (lead() is NULL there, so the jump
    predicate never fires) — single pass, no union-of-filters."""
    df2, added = _with_null_isolating_key(df, group_col)
    w = Window.partitionBy(group_col, _QC_PK).orderBy(order_col)
    nlat = F.lead(lat).over(w)
    nlon = F.lead(lon).over(w)
    d = geo.equirect_m(F.col(lat), F.col(lon), nlat, nlon)
    bad = F.coalesce(nlat.isNotNull() & (d > F.lit(threshold_m)), F.lit(False))
    # materialize the flag ONCE: two withColumn(when(~bad)) calls would
    # re-analyze `bad` against the already-masked lat in the second call,
    # leaving lon un-nulled (review r4, confirmed by execution) — both
    # coords must null together or every count(lat)/count(lon) invariant
    # downstream breaks
    out = (
        df2.withColumn("_djf_bad", bad)
        .withColumn(lat, F.when(~F.col("_djf_bad"), F.col(lat)))
        .withColumn(lon, F.when(~F.col("_djf_bad"), F.col(lon)))
        .drop("_djf_bad")
    )
    return out.drop(_QC_PK) if added else out


def min_group_size_filter(
    df: DataFrame, group_col: str = "track_id", lat: str = "lat", min_points: int = geo.MIN_TRACK_POINTS
) -> DataFrame:
    """P6: drop all rows of groups having fewer than min_points valid coords.

    Window count over the null-isolating key — one scan; NULL-group rows
    pass through via the explicit isNull disjunct (their singleton-window
    count would otherwise drop them)."""
    df2, added = _with_null_isolating_key(df, group_col)
    w = Window.partitionBy(group_col, _QC_PK)
    out = (
        df2.withColumn("_valid_cnt", F.count(F.col(lat)).over(w))
        .filter(F.col(group_col).isNull() | (F.col("_valid_cnt") >= F.lit(min_points)))
        .drop("_valid_cnt")
    )
    return out.drop(_QC_PK) if added else out


def monotonic_repair(
    df: DataFrame,
    group_col: str = "track_id",
    ts_col: str = "warc_ts",
    out_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """W6: repair reversed timestamps with a per-group running-max clamp.

    ts_fixed = max(ts) over (partition by group order by position rows
    unbounded preceding). Position must be an ordering INDEPENDENT of the
    timestamp (`order_col`, default `seq`): ordering by the timestamp
    itself would sort the reversals away and make the clamp the identity
    (a silent no-op) — so a missing order column raises.

    NULL-group rows pass through untouched via the null-isolating key
    (review r4, confirmed by execution: without it every non-track row
    landed in ONE window partition, ordered by an all-NULL seq, and got
    clamped against unrelated rows' timestamps — garbage output at toy
    scale and a mega-partition at corpus scale)."""
    out_col = out_col or ts_col
    order = order_col or "seq"
    if order not in df.columns:
        raise ValueError(
            f"monotonic_repair needs an order column independent of {ts_col!r} "
            f"({order!r} not in {df.columns}); ordering by the timestamp itself "
            "would silently repair nothing"
        )
    df2, added = _with_null_isolating_key(df, group_col)
    w = (
        Window.partitionBy(group_col, _QC_PK)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fixed = F.when(F.col(group_col).isNull(), F.col(ts_col)).otherwise(F.max(ts_col).over(w))
    out = df2.withColumn(out_col, fixed)
    return out.drop(_QC_PK) if added else out


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
    """The composed L0 QC chain (bounds -> island -> jump -> min-size).

    The null-isolating key is computed ONCE and shared by both window
    stages, so the whole chain is one scan and one Exchange: the jump
    filter's (group, pk) sort-window and the size filter's unordered count
    window hash-partition identically, and Catalyst reuses the shuffle."""
    out, _ = _with_null_isolating_key(apply_bounds_and_island(df), group_col)
    out = distance_jump_filter(out, group_col=group_col, order_col=order_col)
    return min_group_size_filter(out, group_col=group_col).drop(_QC_PK)
