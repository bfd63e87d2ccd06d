"""Regrid/resample: per-track nearest-neighbor interpolation onto a
regular axis — the UDTF-shaped L2 consolidation kernel.

Reference analog: ResampleRegrid.interpolate_data
(/root/reference/water_column_sonar_processing/cruise/resample_regrid.py:23-123):
per (file, channel) group, samples are interpolated onto the shared
depth grid with method="nearest" and written into the global cube slab.
Here: per track group, observations are snapped onto a regular time grid
(rows in != rows out -> grouped-map applyInPandas; np.searchsorted gives
exact nearest-neighbor parity with xarray's interp 'nearest').

Also provides the pure-expression `grid_snap` (J6): nearest grid value of
a scalar column — floor(v/step + 0.5) * step — used when the grid is
uniform (the reference's linspace depth grid, zarr_manager.py:33-52).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_snap_idx(v: Column, step: float) -> Column:
    """J6 nearest-grid index: floor(v/step + 0.5) (ties round up — the
    half-open convention both engines reproduce with floor)."""
    return F.floor(v / F.lit(step) + F.lit(0.5)).cast("long")


def grid_snap_idx_sql(v: str, step: float) -> str:
    # e0 suffixes: bare decimal literals parse as DECIMAL in both engines
    # with engine-specific arithmetic (the repo-wide _dlit rule; r4 review)
    return f"CAST(FLOOR({v} / {step!r}e0 + 0.5e0) AS BIGINT)"


def regrid_nearest_np(ts: "np.ndarray", step: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Nearest-observation index per regular grid point (numpy kernel the
    grouped-map UDF and the golden generator share).

    ts must be sorted ascending. Returns (grid, idx): grid points
    ceil(ts[0]/step)*step .. floor(ts[-1]/step)*step and, per point, the
    index of the nearest observation (searchsorted left/right neighbor;
    exact ties keep the LEFT neighbor — `<` not `<=`)."""
    if np.issubdtype(np.asarray(ts).dtype, np.integer):
        # exact integer ceil/floor division: int64 ns ticks exceed
        # float64's 2^53 mantissa, so np.ceil(ts/step) could flip at step
        # boundaries (r4 review); -(-a//b) is exact at any magnitude
        lo = int(-((-int(ts[0])) // int(step)))
        hi = int(int(ts[-1]) // int(step))
    else:
        lo = int(np.ceil(ts[0] / step))
        hi = int(np.floor(ts[-1] / step))
    if hi < lo:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    grid = np.arange(lo, hi + 1, dtype=np.int64) * step
    right = np.searchsorted(ts, grid, side="left")
    left = np.clip(right - 1, 0, len(ts) - 1)
    right = np.clip(right, 0, len(ts) - 1)
    pick_right = np.abs(ts[right] - grid) < np.abs(grid - ts[left])
    idx = np.where(pick_right, right, left)
    return grid, idx


def regrid_tracks(
    df: DataFrame,
    step: int,
    track_col: str = "track_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("lat", "lon"),
    max_gap: int | None = None,
) -> DataFrame:
    """Resample each track onto a regular ts grid (origin = global 0,
    spacing = step), taking the NEAREST observation per grid point.

    Output: (track_id, grid_ts, <value_cols>, src_ts). Grid points whose
    nearest observation is farther than max_gap are dropped (the
    write_empty_chunks=False analog). Groups are bounded by track length,
    like the reference's per-file slabs."""
    fields = [f"`{track_col}` {df.schema[track_col].dataType.simpleString()}", "grid_ts long"]
    for v in value_cols:
        fields.append(f"`{v}` {df.schema[v].dataType.simpleString()}")
    fields.append("src_ts long")
    schema = ", ".join(fields)

    def _regrid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=list(value_cols)).sort_values(ts_col, kind="mergesort")
        if pdf.empty:
            return pd.DataFrame(columns=[track_col, "grid_ts", *value_cols, "src_ts"])
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        grid, idx = regrid_nearest_np(ts, step)
        if len(grid) == 0:
            return pd.DataFrame(columns=[track_col, "grid_ts", *value_cols, "src_ts"])
        out = pd.DataFrame(
            {
                track_col: pdf[track_col].iloc[0],
                "grid_ts": grid,
                "src_ts": ts[idx],
            }
        )
        for v in value_cols:
            out[v] = pdf[v].to_numpy()[idx]
        if max_gap is not None:
            out = out[np.abs(out["src_ts"] - out["grid_ts"]) <= max_gap]
        return out[[track_col, "grid_ts", *value_cols, "src_ts"]]

    return df.groupBy(track_col).applyInPandas(_regrid, schema=schema)
