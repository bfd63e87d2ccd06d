"""Deterministic generator for the graft input tables.

Produces the `pages` table mandated by the input hint
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string),
plus `polygons` and `track_points`, per FIXTURES.md.

Synthesis rules mirror the reference's data pathologies:
- tracks of sequential GPS-like points at ~1 s cadence, ~10-50 m spacing
  (geometry/line_simplification.py:173-174 "measurements every 1 second");
- a pinned count of out-of-bounds rows (raw_to_zarr.py:230-244 analog);
- a pinned count of null-island rows (raw_to_zarr.py:265-272);
- distance jumps > 100 m (line_simplification.py:138-158 — reference test
  pins exactly 10 outliers, tests/geometry/test_line_simplification.py:68-81);
- a run of REVERSED timestamps to exercise monotonic repair
  (raw_to_zarr.py:199-207);
- rows with no coordinates at all (count feeds num_dropna metadata,
  raw_to_zarr.py:274-279);
- hot-cell skew: a large fraction of rows concentrated in 2 dense cells
  (coastal/urban analog of dense ping regions) to exercise salting.

The `text` column embeds the coordinates in a fixed format; extraction must
round-trip byte-identically per url (the per-row invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

LANGS = np.array(["en", "es", "de", "fr", "zh", "pt", "it", "nl"])
# Zipf-ish language skew
LANG_P = np.array([0.38, 0.17, 0.12, 0.10, 0.09, 0.06, 0.05, 0.03])

# hot cells (coastal/urban analogs): (lat, lon) centers of dense regions
HOT_CENTERS = [(40.71, -74.006), (51.507, -0.1276)]
HOT_FRACTION = 0.35  # fraction of non-track rows packed into hot cells

# pinned dirty-row counts per 1000 rows (FIXTURES.md §1)
N_OOB_PER_1000 = 8  # out-of-bounds lat/lon
N_ISLAND_PER_1000 = 6  # null island
N_NOCOORD_PER_1000 = 50  # no coords in text
N_JUMP_PER_TRACK = 2  # distance jumps injected per track

MAGIC_EK60 = b"CON0"
MAGIC_EK80 = b"XML0"


def _mk_text(url: str, lat: float | None, lon: float | None, filler: str) -> str:
    if lat is None:
        return f"url={url} {filler} no-geo"
    return f"url={url} lat={lat:.6f} lon={lon:.6f} {filler}"


def gen_pages(n_rows: int = 2000, n_tracks: int = 8, seed: int = SEED) -> pd.DataFrame:
    """Deterministic `pages` table. ~70% of rows belong to tracks."""
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    base_ts = np.datetime64("2007-07-11T18:20:32.657000", "us")

    n_track_rows = int(n_rows * 0.7)
    per_track = n_track_rows // n_tracks
    idx = 0
    for t in range(n_tracks):
        # track start point away from null island / poles
        lat0 = float(rng.uniform(-60, 60))
        lon0 = float(rng.uniform(-170, 170))
        heading = float(rng.uniform(0, 2 * np.pi))
        lat, lon = lat0, lon0
        jump_candidates = np.arange(5, max(6, per_track - 1))
        n_jumps = min(N_JUMP_PER_TRACK, per_track // 3, len(jump_candidates))
        jump_at = set(rng.choice(jump_candidates, size=n_jumps, replace=False).tolist())
        reversed_run = set(range(per_track // 2, per_track // 2 + 3)) if per_track > 12 else set()
        for i in range(per_track):
            step_m = float(rng.uniform(10, 50))
            if i in jump_at:
                step_m = float(rng.uniform(200, 500))  # distance jump > 100 m
            heading += float(rng.normal(0, 0.1))
            dlat = step_m / 111320.0 * np.cos(heading)
            dlon = step_m / (111320.0 * max(0.2, np.cos(np.radians(lat)))) * np.sin(heading)
            lat, lon = lat + dlat, lon + dlon
            ts = base_ts + np.timedelta64(int((t * 100000 + i) * 1_000_000 + rng.integers(0, 900_000)), "us")
            if i in reversed_run:  # reversed-timestamp run (monotonic-repair exercise)
                ts = ts - np.timedelta64(5_000_000, "us")
            url = f"https://track{t}.test/page/{idx}"
            filler = f"track={t} seq={i}"
            rows.append(
                dict(
                    url=url,
                    warc_ts=ts,
                    lat=round(lat, 6),
                    lon=round(lon, 6),
                    track_id=f"TRK{t:04d}",
                    seq=i,
                    text=_mk_text(url, round(lat, 6), round(lon, 6), filler),
                    lang=str(rng.choice(LANGS, p=LANG_P)),
                )
            )
            idx += 1

    # non-track rows: hot-cell skew + uniform + dirty rows
    n_rest = n_rows - len(rows)
    n_oob = max(1, n_rest * N_OOB_PER_1000 // 1000)
    n_island = max(1, n_rest * N_ISLAND_PER_1000 // 1000)
    n_nocoord = max(1, n_rest * N_NOCOORD_PER_1000 // 1000)
    for i in range(n_rest):
        url = f"https://example{i % 997}.test/page/{idx}"
        ts = base_ts + np.timedelta64(int((900000 + i) * 1_000_000), "us")
        lang = str(rng.choice(LANGS, p=LANG_P))
        if i < n_oob:  # out-of-bounds
            lat = float(rng.uniform(91, 120)) * (1 if i % 2 else -1)
            lon = float(rng.uniform(-360, 360))
        elif i < n_oob + n_island:  # null island
            lat = float(rng.uniform(-9e-4, 9e-4))
            lon = float(rng.uniform(-9e-4, 9e-4))
        elif i < n_oob + n_island + n_nocoord:
            lat = None
            lon = None
        elif rng.random() < HOT_FRACTION:  # hot cell
            c = HOT_CENTERS[int(rng.integers(0, len(HOT_CENTERS)))]
            lat = float(c[0] + rng.normal(0, 0.01))
            lon = float(c[1] + rng.normal(0, 0.01))
        else:
            lat = float(rng.uniform(-85, 85))
            lon = float(rng.uniform(-180, 180))
        lat_r = None if lat is None else round(lat, 6)
        lon_r = None if lon is None else round(lon, 6)
        rows.append(
            dict(
                url=url,
                warc_ts=ts,
                lat=lat_r,
                lon=lon_r,
                track_id=None,
                seq=None,
                text=_mk_text(url, lat_r, lon_r, f"misc={i}"),
                lang=lang,
            )
        )
        idx += 1

    df = pd.DataFrame(rows)
    # html: deterministic bytes with a 5-byte magic at offset 3 (datagram-scan
    # analog, index/index_manager.py:237-250)
    htmls = []
    for i, u in enumerate(df["url"]):
        magic = MAGIC_EK60 if i % 3 else MAGIC_EK80
        htmls.append(b"\x00\x01\x02" + magic + b"<html>" + u.encode() + b"</html>")
    df["html"] = htmls
    # keep microsecond precision: Spark's parquet reader rejects
    # TIMESTAMP(NANOS); the ns-precision path carries epoch-ns as long in
    # track_points instead (SURVEY.md §7.4)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).astype("datetime64[us]")
    df["seq"] = df["seq"].astype("Int64")  # nullable int, not float-with-NaN
    return df[["url", "warc_ts", "html", "text", "lang", "lat", "lon", "track_id", "seq"]]


def gen_polygons(seed: int = SEED) -> pd.DataFrame:
    """Deterministic polygon set: rectangles over hot cells, a concave ring,
    a tiny sub-cell polygon, and one crossing the antimeridian (stored as
    two lobes; flagged edge case, line_simplification.py:168-175)."""
    polys = []

    def ring_wkt(pts: list[tuple[float, float]]) -> str:
        body = ", ".join(f"{x} {y}" for x, y in pts + [pts[0]])
        return f"POLYGON (({body}))"

    # rectangles over the two hot centers
    for pid, (clat, clon) in enumerate(HOT_CENTERS):
        d = 0.05
        polys.append(
            dict(
                polygon_id=pid,
                name=f"hot_{pid}",
                wkt=ring_wkt([(clon - d, clat - d), (clon + d, clat - d), (clon + d, clat + d), (clon - d, clat + d)]),
            )
        )
    # a big mid-ocean rectangle
    polys.append(dict(polygon_id=10, name="big_box", wkt=ring_wkt([(-40, -20), (-10, -20), (-10, 15), (-40, 15)])))
    # concave (C-shaped) polygon
    polys.append(
        dict(
            polygon_id=11,
            name="concave_c",
            wkt=ring_wkt(
                [(10, 10), (30, 10), (30, 14), (14, 14), (14, 26), (30, 26), (30, 30), (10, 30)]
            ),
        )
    )
    # tiny sub-cell polygon (forces exact ray-cast refine)
    polys.append(
        dict(polygon_id=12, name="tiny", wkt=ring_wkt([(5.001, 5.001), (5.003, 5.001), (5.003, 5.003), (5.001, 5.003)]))
    )
    # antimeridian-adjacent lobes
    polys.append(dict(polygon_id=13, name="antimeridian_w", wkt=ring_wkt([(178, -5), (180, -5), (180, 5), (178, 5)])))
    polys.append(dict(polygon_id=14, name="antimeridian_e", wkt=ring_wkt([(-180, -5), (-178, -5), (-178, 5), (-180, 5)])))
    return pd.DataFrame(polys)


def gen_track_points(n_points: int = 5000, n_tracks: int = 4, seed: int = SEED + 1) -> pd.DataFrame:
    """Ordered geospatial series mirroring HB1906_geospatial_coordinates
    (latitude/longitude float32 + int64 epoch-ns time; FIXTURES.md §3)."""
    rng = np.random.default_rng(seed)
    rows = []
    base_ns = 1184178032657000000  # 2007-07-11T18:20:32.657 epoch ns
    per = n_points // n_tracks
    for t in range(n_tracks):
        lat = float(rng.uniform(-50, 50))
        lon = float(rng.uniform(-160, 160))
        heading = float(rng.uniform(0, 2 * np.pi))
        jump_at = set(rng.choice(np.arange(5, per - 1), size=10, replace=False).tolist())
        for i in range(per):
            step_m = float(rng.uniform(8, 12))  # ~10 m/s at 1 Hz cadence
            if i in jump_at:
                step_m = float(rng.uniform(150, 400))
            heading += float(rng.normal(0, 0.05))
            lat += step_m / 111320.0 * np.cos(heading)
            lon += step_m / (111320.0 * max(0.2, np.cos(np.radians(lat)))) * np.sin(heading)
            rows.append(
                dict(
                    track_id=f"TRK{t:04d}",
                    ts=base_ns + (t * 1_000_000 + i) * 1_000_000_000 + int(rng.integers(0, 5_000_000)),
                    lat=np.float32(lat),
                    lon=np.float32(lon),
                )
            )
    df = pd.DataFrame(rows)
    df["lat"] = df["lat"].astype(np.float32)
    df["lon"] = df["lon"].astype(np.float32)
    return df


def write_fixtures(out_dir: str, n_rows: int = 2000) -> dict[str, str]:
    """Write all fixture parquets under out_dir; returns name->path."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, df in (
        ("pages", gen_pages(n_rows)),
        ("polygons", gen_polygons()),
        ("track_points", gen_track_points()),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
