"""Track analytics: speed / distance / smoothing / simplification.

Reference analogs (file:line under /root/reference/water_column_sonar_processing/):
- W1-W4 lag-difference distance, time delta, speed + knots conversion,
  first-row backfill: geometry/spatiotemporal.py:30-66,
  geometry/line_simplification.py:117-135
- W7 Kalman smoothing per track: geometry/line_simplification.py:75-103
  (pykalman constant-velocity model; re-implemented here as a from-scratch
  numpy Kalman filter + RTS smoother — inherently sequential state, so it
  runs per-group in applyInPandas)
- U4 RDP line simplification: geometry/pmtile_generation.py:93-95
  (tolerance 0.001 / 0.0001)

Speed/distance are PURE window expressions — no Python hop; Kalman/RDP are
per-track grouped-map UDFs, with group size bounded by track length (the
reference's per-cruise working set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geo


def track_metrics(
    df: DataFrame,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
    ts_unit_ns: bool = True,
) -> DataFrame:
    """Add diff_seconds, distance_meters, speed_mps, speed_knots per row.

    First-row backfill (W4): the first row copies the second row's diffs
    (spatiotemporal.py:46,49) — implemented as coalesce(val, lead(val))."""
    w = Window.partitionBy(track_col).orderBy(ts_col)
    plat, plon = F.lag(lat).over(w), F.lag(lon).over(w)
    dist = geo.equirect_m(plat, plon, F.col(lat), F.col(lon))
    if ts_unit_ns:
        dt = (F.col(ts_col) - F.lag(ts_col).over(w)).cast("double") / F.lit(1e9)
    else:
        dt = F.col(ts_col).cast("double") - F.lag(ts_col).over(w).cast("double")
    out = df.withColumn("_dist", dist).withColumn("_dt", dt)
    out = out.withColumn("distance_meters", F.coalesce(F.col("_dist"), F.lead("_dist").over(w))).withColumn(
        "diff_seconds", F.coalesce(F.col("_dt"), F.lead("_dt").over(w))
    )
    speed = F.when(F.col("diff_seconds") > 0, F.col("distance_meters") / F.col("diff_seconds"))
    return (
        out.withColumn("speed_mps", speed)
        .withColumn("speed_knots", geo.mps_to_knots(speed))
        .drop("_dist", "_dt")
    )


def kalman_smooth(
    df: DataFrame,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
    process_var: float = 1e-6,
    obs_var: float = 1e-5,
) -> DataFrame:
    """Constant-velocity Kalman filter + RTS smoother over each track's
    (lon, lat) sequence; adds lat_smooth/lon_smooth.

    From-scratch numpy implementation of the public constant-velocity
    Kalman equations (state [x, y, vx, vy]); sequential per group, so a
    grouped-map UDF, exactly like the reference runs pykalman per cruise
    (line_simplification.py:75-103)."""
    out_fields = df.schema.fieldNames() + ["lat_smooth", "lon_smooth"]
    schema_parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(schema_parts + ["lat_smooth double", "lon_smooth double"])

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        obs_mask = pdf[lat].notna() & pdf[lon].notna()
        n = len(pdf)
        lat_s = np.full(n, np.nan)
        lon_s = np.full(n, np.nan)
        idx = np.flatnonzero(obs_mask.to_numpy())
        if len(idx) >= 2:
            z = pdf.loc[obs_mask, [lon, lat]].to_numpy(dtype=np.float64)
            m = len(z)
            A = np.array([[1, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float64)
            H = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], dtype=np.float64)
            Q = np.eye(4) * process_var
            R = np.eye(2) * obs_var
            x = np.array([z[0, 0], z[0, 1], 0.0, 0.0])
            P = np.eye(4)
            xs_f = np.zeros((m, 4))
            Ps_f = np.zeros((m, 4, 4))
            xs_p = np.zeros((m, 4))
            Ps_p = np.zeros((m, 4, 4))
            for t in range(m):
                if t > 0:
                    x = A @ x
                    P = A @ P @ A.T + Q
                xs_p[t], Ps_p[t] = x, P
                y = z[t] - H @ x
                S = H @ P @ H.T + R
                K = P @ H.T @ np.linalg.inv(S)
                x = x + K @ y
                P = (np.eye(4) - K @ H) @ P
                xs_f[t], Ps_f[t] = x, P
            # RTS backward smoother
            xs_s = xs_f.copy()
            Ps_s = Ps_f.copy()
            for t in range(m - 2, -1, -1):
                G = Ps_f[t] @ A.T @ np.linalg.inv(Ps_p[t + 1])
                xs_s[t] = xs_f[t] + G @ (xs_s[t + 1] - xs_p[t + 1])
                Ps_s[t] = Ps_f[t] + G @ (Ps_s[t + 1] - Ps_p[t + 1]) @ G.T
            lon_s[idx] = xs_s[:, 0]
            lat_s[idx] = xs_s[:, 1]
        elif len(idx) == 1:
            lon_s[idx] = pdf.loc[obs_mask, lon].to_numpy()
            lat_s[idx] = pdf.loc[obs_mask, lat].to_numpy()
        pdf["lat_smooth"] = lat_s
        pdf["lon_smooth"] = lon_s
        return pdf[out_fields]

    return df.groupBy(track_col).applyInPandas(_smooth, schema=schema)


def rdp_simplify_np(points: np.ndarray, tol: float) -> np.ndarray:
    """Iterative (stack-based) Ramer-Douglas-Peucker; returns keep-mask.

    points: (n, 2) array of (x, y). From-scratch vectorized perpendicular
    distances; no recursion (tracks can be ~1e5 points)."""
    n = len(points)
    if n < 3:
        return np.ones(n, dtype=bool)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = points[lo + 1 : hi]
        a, b = points[lo], points[hi]
        ab = b - a
        denom = np.hypot(ab[0], ab[1])
        if denom == 0.0:
            d = np.hypot(seg[:, 0] - a[0], seg[:, 1] - a[1])
        else:
            # 2-D cross-product magnitude (np.cross on 2-vectors is
            # deprecated in numpy 2.x)
            d = np.abs(ab[0] * (seg[:, 1] - a[1]) - ab[1] * (seg[:, 0] - a[0])) / denom
        imax = int(np.argmax(d))
        if d[imax] > tol:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return keep


def simplify_tracks(
    df: DataFrame,
    tol: float = 0.001,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-track RDP simplification -> subset of rows (the GeoJSON
    linestring vertex set, pmtile_generation.py:93-95 tolerance 0.001)."""
    schema_parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(schema_parts)
    names = df.schema.fieldNames()

    def _simp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        m = pdf[lat].notna() & pdf[lon].notna()
        sub = pdf[m]
        if len(sub) < 3:
            return sub[names]
        pts = sub[[lon, lat]].to_numpy(dtype=np.float64)
        keep = rdp_simplify_np(pts, tol)
        return sub[keep][names]

    return df.groupBy(track_col).applyInPandas(_simp, schema=schema)


def tracks_to_geojson(
    df: DataFrame,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """One GeoJSON LineString Feature per track (S12/S14 sink analog,
    geometry_manager.py:117-158) — collect_list of (ts, lon, lat) structs
    sorted by ts, rendered with native to_json."""
    pts = F.array_sort(F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(lon).alias("x"), F.col(lat).alias("y"))))
    coords = F.transform(pts, lambda p: F.array(p["x"], p["y"]))
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(F.lit("LineString").alias("type"), coords.alias("coordinates")).alias("geometry"),
        )
    )
    return (
        df.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull() & F.col(track_col).isNotNull())
        .groupBy(track_col)
        .agg(feature.alias("geojson"), F.count(F.lit(1)).alias("n_points"))
    )
