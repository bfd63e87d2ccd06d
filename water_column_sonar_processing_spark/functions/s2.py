"""S2 cell ids (public S2 geometry algorithm), vectorized with numpy.

Implements the standard S2 mapping lat/lon -> unit sphere -> cube face
(u,v) -> quadratic (s,t) -> leaf (i,j) -> Hilbert-curve position -> 64-bit
cell id, plus parent derivation at any level. This is the published S2
algorithm (s2geometry.io docs / the open-source C++ reference semantics),
re-implemented from scratch for Arrow-batch execution.

Reference parity: the graft north rule mandates S2 level-12 encoding as one
of the two cell indexes; in the reference the analogous op is the global
depth-grid assignment (/root/reference/water_column_sonar_processing/
cruise/resample_regrid.py:94-107 nearest-grid interpolation).

Cell ids are uint64 in S2; Spark LongType is signed, so ids are
reinterpreted two's-complement (faces 4-5 appear negative). Equality joins
and groupBys are unaffected.

Execution: `s2_cell_udf` is a scalar pandas UDF — Arrow-batched, ~8 numpy
passes per batch (one per 4-bit Hilbert chunk), no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.int64,
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)


def _build_lookup_tables() -> tuple[np.ndarray, np.ndarray]:
    """Build the 1024-entry (ij,orient)->(pos,orient) tables (4 bits/step)."""
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def init(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        r = _POS_TO_IJ[orient]
        for idx in range(4):
            init(
                level + 1,
                (i << 1) + (int(r[idx]) >> 1),
                (j << 1) + (int(r[idx]) & 1),
                orig,
                (pos << 2) + idx,
                orient ^ int(_POS_TO_ORIENT[idx]),
            )

    for orig in (0, _SWAP, _INVERT, _SWAP | _INVERT):
        init(0, 0, 0, orig, 0, orig)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup_tables()


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    with np.errstate(invalid="ignore"):
        # np.where evaluates both branches; the inactive branch's sqrt of a
        # negative is discarded
        return np.where(u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def xyz_from_latlon(lat_deg: np.ndarray, lon_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.radians(lat_deg)
    theta = np.radians(lon_deg)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def face_uv_from_xyz(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2)).astype(np.int64)
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0.0, face + 3, face)
    # over='ignore' too: np.select evaluates ALL six branch expressions, so
    # the five inactive divisions can overflow; their results are discarded
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return face, u, v


def leaf_ij(lat_deg: np.ndarray, lon_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face, i, j) leaf coordinates at level 30."""
    x, y, z = xyz_from_latlon(lat_deg, lon_deg)
    face, u, v = face_uv_from_xyz(x, y, z)
    smax = (1 << MAX_LEVEL) - 1
    i = np.clip(np.floor(_st_from_uv(u) * (1 << MAX_LEVEL)).astype(np.int64), 0, smax)
    j = np.clip(np.floor(_st_from_uv(v) * (1 << MAX_LEVEL)).astype(np.int64), 0, smax)
    return face, i, j


def cell_id_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Hilbert-encode (face,i,j) -> leaf cell id (uint64), vectorized.

    8 table-lookup steps of 4 bits each (the standard lookup-table form of
    the S2 FromFaceIJ algorithm).
    """
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return n * np.uint64(2) + np.uint64(1)


def parent_id(leaf: np.ndarray, level: int) -> np.ndarray:
    """Parent cell id at ``level`` for leaf (or finer) ids. uint64 in/out."""
    nl = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (leaf & ~(nl * np.uint64(2) - np.uint64(1))) | nl


def s2_cell_np(lat_deg: np.ndarray, lon_deg: np.ndarray, level: int = 12) -> np.ndarray:
    """lat/lon arrays -> S2 cell id at ``level`` as int64 (two's complement)."""
    face, i, j = leaf_ij(np.asarray(lat_deg, dtype=np.float64), np.asarray(lon_deg, dtype=np.float64))
    leaf = cell_id_from_face_ij(face, i, j)
    return parent_id(leaf, level).view(np.int64) if level < MAX_LEVEL else leaf.view(np.int64)


def s2_level(cell_int64: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of lowest set bit)."""
    u = cell_int64.view(np.uint64) if cell_int64.dtype == np.int64 else cell_int64
    lsb = u & (~u + np.uint64(1))
    # log2(lsb) is even for valid ids; level = 30 - log2(lsb)/2
    exp = np.zeros_like(u, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        exp = np.where(big, exp + shift, exp)
        v = np.where(big, v >> np.uint64(shift), v)
    return MAX_LEVEL - exp // 2


def s2_cell_udf(level: int = 12):
    """Scalar pandas UDF: (lat double, lon double) -> s2 cell id long."""

    @F.pandas_udf(T.LongType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        lo = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        valid = ~(np.isnan(la) | np.isnan(lo))
        out = np.zeros(len(la), dtype=np.int64)
        if valid.any():
            out[valid] = s2_cell_np(la[valid], lo[valid], level)
        res = pd.Series(out, dtype="Int64")
        res[~valid] = pd.NA
        return res

    return _enc


def s2_cell_token(cell_int64: int) -> str:
    """Hex token (debug/display), canonical S2 style: strip trailing zeros."""
    u = np.uint64(cell_int64).item() if cell_int64 >= 0 else (cell_int64 + (1 << 64))
    h = f"{u:016x}".rstrip("0")
    return h or "X"
