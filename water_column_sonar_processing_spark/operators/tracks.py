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
    # W4 backfill applies to the FIRST row only (lag is NULL there) — a
    # blanket coalesce would also fire on a mid-track row whose _dist is
    # NULL because ITS coords are QC-nulled, fabricating the next
    # segment's distance with this row's dt (review r4). On NULL-free
    # tracks the two forms are identical (first row is the only NULL).
    first = F.lag(ts_col).over(w).isNull()
    out = out.withColumn(
        "distance_meters", F.when(first, F.lead("_dist").over(w)).otherwise(F.col("_dist"))
    ).withColumn("diff_seconds", F.when(first, F.lead("_dt").over(w)).otherwise(F.col("_dt")))
    speed = F.when(F.col("diff_seconds") > 0, F.col("distance_meters") / F.col("diff_seconds"))
    return (
        out.withColumn("speed_mps", speed)
        .withColumn("speed_knots", geo.mps_to_knots(speed))
        .drop("_dist", "_dt")
    )


def _kf_forward_backward(z, A, H, Q, R, mu0, S0):
    """Kalman filter + RTS smoother (standard published equations).

    Returns (xs_s, Ps_s, pair) where pair[t] = Cov(x_t, x_{t-1} | all z)
    = Ps_s[t] @ G_{t-1}.T (the lag-one smoothed covariance the EM M-step
    needs; pair[0] is unused). Convention matches pykalman: at t=0 the
    prior (mu0, S0) is updated with z_0 directly (no predict step)."""
    m, ds = len(z), len(mu0)
    I = np.eye(ds)
    xs_p = np.zeros((m, ds))
    Ps_p = np.zeros((m, ds, ds))
    xs_f = np.zeros((m, ds))
    Ps_f = np.zeros((m, ds, ds))
    x, P = mu0, S0
    for t in range(m):
        if t > 0:
            x = A @ x
            P = A @ P @ A.T + Q
        xs_p[t], Ps_p[t] = x, P
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        x = x + K @ (z[t] - H @ x)
        P = (I - K @ H) @ P
        xs_f[t], Ps_f[t] = x, P
    xs_s = xs_f.copy()
    Ps_s = Ps_f.copy()
    gains = np.zeros((m, ds, ds))
    for t in range(m - 2, -1, -1):
        G = Ps_f[t] @ A.T @ np.linalg.inv(Ps_p[t + 1])
        gains[t] = G
        xs_s[t] = xs_f[t] + G @ (xs_s[t + 1] - xs_p[t + 1])
        Ps_s[t] = Ps_f[t] + G @ (Ps_s[t + 1] - Ps_p[t + 1]) @ G.T
    pair = np.zeros((m, ds, ds))
    for t in range(1, m):
        pair[t] = Ps_s[t] @ gains[t - 1].T
    return xs_s, Ps_s, pair


def kalman_em_smooth_np(z: np.ndarray, n_iter: int = 2) -> np.ndarray:
    """Reference-parity Kalman smoothing of an (m, 2) array of (lon, lat).

    From-scratch implementation of the exact procedure the reference runs
    (line_simplification.py:75-103): pykalman KalmanFilter with state
    [x, vx, y, vy], A=[[1,1,0,0],[0,1,0,0],[0,0,1,1],[0,0,0,1]],
    H=[[1,0,0,0],[0,0,1,0]], initial_state_mean=[z0x, 0, z0y, 0], then
    `em(measurements, n_iter=2)` over pykalman's DEFAULT em_vars
    (transition_covariance Q, observation_covariance R, initial_state_mean
    mu0, initial_state_covariance S0 — all initialized to identity), then
    `smooth()`. The EM M-step updates are the published closed-form
    Shumway-Stoffer equations (the same ones pykalman implements):

      Q  <- 1/(T-1) SUM_t [ err err^T + A P_t A^T + P_{t+1}
                            - C_{t+1} A^T - A C_{t+1}^T ],
            err = x_{t+1} - A x_t,  C = lag-one smoothed covariance
      R  <- 1/T SUM_t [ (z_t - H x_t)(z_t - H x_t)^T + H P_t H^T ]
      mu0 <- x_0;  S0 <- P_0  (pykalman updates mu0 first, so the
                               (x_0 - mu0)(x_0 - mu0)^T term vanishes)

    Returns the smoothed (m, 2) positions (columns [0, 2] of the state,
    i.e. lon, lat), matching `smoothed_state_means[:, [0, 2]]`."""
    z = np.asarray(z, dtype=np.float64)
    m = len(z)
    A = np.array([[1, 1, 0, 0], [0, 1, 0, 0], [0, 0, 1, 1], [0, 0, 0, 1]], dtype=np.float64)
    H = np.array([[1, 0, 0, 0], [0, 0, 1, 0]], dtype=np.float64)
    Q = np.eye(4)
    R = np.eye(2)
    mu0 = np.array([z[0, 0], 0.0, z[0, 1], 0.0])
    S0 = np.eye(4)
    for _ in range(n_iter):
        xs, Ps, pair = _kf_forward_backward(z, A, H, Q, R, mu0, S0)
        if m >= 2:
            acc = np.zeros((4, 4))
            for t in range(m - 1):
                err = xs[t + 1] - A @ xs[t]
                CA = pair[t + 1] @ A.T
                acc += np.outer(err, err) + A @ Ps[t] @ A.T + Ps[t + 1] - CA - CA.T
            Q = acc / (m - 1)
        acc_r = np.zeros((2, 2))
        for t in range(m):
            err = z[t] - H @ xs[t]
            acc_r += np.outer(err, err) + H @ Ps[t] @ H.T
        R = acc_r / m
        # pykalman's _em reassigns initial_state_mean BEFORE computing
        # initial_state_covariance, so the mean-shift outer product is
        # identically zero: S0 collapses to the smoothed P_0.
        mu0 = xs[0].copy()
        S0 = Ps[0].copy()
    xs, _, _ = _kf_forward_backward(z, A, H, Q, R, mu0, S0)
    return xs[:, [0, 2]]


def kalman_smooth(
    df: DataFrame,
    track_col: str = "track_id",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
    em_iter: int = 2,
) -> DataFrame:
    """Constant-velocity Kalman EM + RTS smoother over each track's
    (lon, lat) sequence; adds lat_smooth/lon_smooth.

    Reference parity: runs the same EM(n_iter=2)-then-smooth procedure as
    line_simplification.py:75-103 (see kalman_em_smooth_np). Inherently
    sequential per track, so a grouped-map UDF — exactly like the
    reference runs pykalman per cruise; group size is bounded by track
    length (the reference's per-cruise working set)."""
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
            sm = kalman_em_smooth_np(z, n_iter=em_iter)
            lon_s[idx] = sm[:, 0]
            lat_s[idx] = sm[:, 1]
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
