"""Single-artifact indexed tile archive — the S14 consolidated-sink analog.

The reference ships cruise tiles as one `.pmtiles` artifact by shelling
out to tippecanoe (geometry/pmtile_generation.py:124-235). This module
completes that sink shape natively: the distributed tile TABLE
(`operators/tiles.py`) is serialized into ONE indexed binary file that
supports O(log n) point lookups and contiguous zoom-slice scans without
reading the whole artifact — the same access pattern the PMTiles spec
(public, protomaps/PMTiles) provides, re-derived from scratch with a
plain sorted directory instead of its compressed leaf directories.

Layout (little-endian):

    header   : magic 'WCSPTIL1' | u32 version | u64 n_entries
               | u64 dir_off | u64 data_off
    directory: n_entries x (u32 zoom | u64 gx | u64 gy
               | u64 offset | u64 length), sorted by (zoom, gx, gy)
    data     : concatenated tile payloads (offsets relative to data_off)

Scale notes:
- The DISTRIBUTED part (payload encode + global sort by tile key) runs
  in Spark; the final single-file assembly streams the sorted result
  through `toLocalIterator()` — one partition in driver memory at a
  time, the same inherently-serial tail every single-artifact sink has
  (tippecanoe included).
- The in-memory directory costs 36 bytes/tile while writing. Fine
  through base_res 12 (<=17M tiles/level); for finer bases write one
  archive per coarse spatial shard (the tile table is already
  partitioned that way) — the PMTiles leaf-directory idea expressed as
  multiple artifacts.
- Zoom-slice reads seek straight to the directory's contiguous zoom run
  (directory is sorted; binary search both ends), then one sequential
  read of the payload byte range — no full-file scan.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"WCSPTIL1"
VERSION = 1
_HDR = struct.Struct("<8sIQQQ")
_ENT = struct.Struct("<IQQQQ")


def write_tile_archive(
    tiles: DataFrame,
    path: str,
    payload_col: str | None = None,
    sort_partitions: int | None = None,
) -> int:
    """Serialize a tile table (zoom, gx, gy[, payload]) into one indexed
    archive file. Returns the number of tiles written.

    Without payload_col, the payload is the 8-byte LE doc_count — callers
    with richer per-tile content (rendered vectors, aggregates struct)
    pass their own binary column. Distributed work: payload encode +
    repartitionByRange sort on (zoom, gx, gy); the driver then streams
    the sorted iterator into the file."""
    if payload_col is None:
        body = tiles.select(
            F.col("zoom").cast("int").alias("zoom"),
            F.col("gx").cast("long").alias("gx"),
            F.col("gy").cast("long").alias("gy"),
            _le64(F.col("doc_count").cast("long")).alias("payload"),
        )
    else:
        body = tiles.select(
            F.col("zoom").cast("int").alias("zoom"),
            F.col("gx").cast("long").alias("gx"),
            F.col("gy").cast("long").alias("gy"),
            F.col(payload_col).cast("binary").alias("payload"),
        )
    n_part = sort_partitions or max(tiles.sparkSession.sparkContext.defaultParallelism, 8)
    ordered = body.repartitionByRange(n_part, "zoom", "gx", "gy").sortWithinPartitions("zoom", "gx", "gy")

    entries: list[tuple[int, int, int, int, int]] = []
    tmp = path + ".data.tmp"
    off = 0
    with open(tmp, "wb") as data_f:
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            payload = bytes(row["payload"])
            entries.append((row["zoom"], row["gx"], row["gy"], off, len(payload)))
            data_f.write(payload)
            off += len(payload)

    dir_off = _HDR.size
    data_off = dir_off + _ENT.size * len(entries)
    with open(path + ".tmp", "wb") as f:
        f.write(_HDR.pack(MAGIC, VERSION, len(entries), dir_off, data_off))
        for e in entries:
            f.write(_ENT.pack(*e))
        with open(tmp, "rb") as data_f:
            while True:
                chunk = data_f.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    os.remove(tmp)
    os.replace(path + ".tmp", path)  # atomic: readers never see a partial archive
    return len(entries)


class TileArchive:
    """Reader: O(log n) point lookup + contiguous zoom-slice scan."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic, version, n, dir_off, data_off = _HDR.unpack(f.read(_HDR.size))
            if magic != MAGIC:
                raise ValueError(f"{path}: not a WCSP tile archive")
            if version != VERSION:
                raise ValueError(f"{path}: unsupported version {version}")
            self.n = n
            self.data_off = data_off
            f.seek(dir_off)
            raw = f.read(_ENT.size * n)
        # numpy columns, not lists of tuples: tuple lists cost ~150-200
        # bytes/entry (~5x the 36-byte packed format) and OOM at the
        # 17M-tile bound the format supports; packed int64 keys + two
        # int64 columns are 24 bytes/entry and searchsorted replaces
        # bisect (r4 review). Key packing z<<52 | gx<<26 | gy preserves
        # the (z, gx, gy) sort order (gx, gy < 2^26 for res <= 25).
        import numpy as np

        dt = np.dtype([("z", "<u4"), ("gx", "<u8"), ("gy", "<u8"), ("off", "<u8"), ("ln", "<u8")])
        ents = np.frombuffer(raw, dtype=dt, count=n)
        self._np = np
        self._zkeys = (
            (ents["z"].astype(np.int64) << 52)
            | (ents["gx"].astype(np.int64) << 26)
            | ents["gy"].astype(np.int64)
        )
        self._offs = ents["off"].astype(np.int64)
        self._lens = ents["ln"].astype(np.int64)

    def get(self, zoom: int, gx: int, gy: int) -> bytes | None:
        key = (zoom << 52) | (gx << 26) | gy
        i = int(self._np.searchsorted(self._zkeys, key))
        if i == self.n or int(self._zkeys[i]) != key:
            return None
        off, ln = int(self._offs[i]), int(self._lens[i])
        with open(self.path, "rb") as f:
            f.seek(self.data_off + off)
            return f.read(ln)

    def zoom_slice(self, zoom: int) -> list[tuple[int, int, bytes]]:
        """All (gx, gy, payload) at one zoom: one sequential byte-range
        read (the directory is (zoom, gx, gy)-sorted, so a zoom level is
        a contiguous run of both directory and data)."""
        lo = int(self._np.searchsorted(self._zkeys, zoom << 52))
        hi = int(self._np.searchsorted(self._zkeys, (zoom + 1) << 52))
        if lo == hi:
            return []
        start = int(self._offs[lo])
        end = int(self._offs[hi - 1]) + int(self._lens[hi - 1])
        with open(self.path, "rb") as f:
            f.seek(self.data_off + start)
            blob = f.read(end - start)
        out = []
        m26 = (1 << 26) - 1
        for i in range(lo, hi):
            key, off, ln = int(self._zkeys[i]), int(self._offs[i]), int(self._lens[i])
            rel = off - start
            out.append(((key >> 26) & m26, key & m26, blob[rel : rel + ln]))
        return out

    def doc_count(self, zoom: int, gx: int, gy: int) -> int | None:
        """Convenience for default-payload archives (8-byte LE count)."""
        b = self.get(zoom, gx, gy)
        return None if b is None else struct.unpack("<q", b)[0]


def _le64(col):
    """8-byte little-endian encoding of a long column, JVM-side: reverse
    of the big-endian two's-complement from conv/unhex round trip — built
    from substrings of the 16-hex-digit rendering (no Python UDF)."""
    hx = F.lpad(F.lower(F.hex(col)), 16, "0")
    le_hex = F.concat(*[F.substring(hx, 15 - 2 * i, 2) for i in range(8)])
    return F.unhex(le_hex)
