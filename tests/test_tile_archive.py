"""Single-artifact tile archive: write from the distributed tile table,
read back by point lookup and zoom slice (S14 consolidated-sink analog,
reference geometry/pmtile_generation.py:124-235)."""

from __future__ import annotations

import os
import struct

from pyspark.sql import functions as F

from water_column_sonar_processing_spark.operators import tiles as tiles_op
from water_column_sonar_processing_spark.sources.tilearchive import TileArchive, write_tile_archive


def test_archive_roundtrip_and_zoom_slice(spark, pages_df, tmp_path):
    pyr = tiles_op.tile_pyramid(pages_df, base_res=8, min_res=4).cache()
    expected = {(r["zoom"], r["gx"], r["gy"]): r["doc_count"] for r in pyr.collect()}
    path = str(tmp_path / "tiles.wcsp")
    n = write_tile_archive(pyr, path)
    assert n == len(expected) > 0
    assert os.path.isfile(path) and not os.path.exists(path + ".tmp")  # ONE artifact

    arc = TileArchive(path)
    # point lookups: every tile readable, counts exact
    for (z, gx, gy), cnt in list(expected.items())[::7]:
        assert arc.doc_count(z, gx, gy) == cnt
    assert arc.get(4, 10**9, 10**9) is None  # miss -> None

    # zoom-slice read == table filtered to that zoom
    for zoom in (4, 6, 8):
        got = {(gx, gy): struct.unpack("<q", b)[0] for gx, gy, b in arc.zoom_slice(zoom)}
        exp = {(k[1], k[2]): v for k, v in expected.items() if k[0] == zoom}
        assert got == exp
    assert arc.zoom_slice(3) == []  # below min_res: empty, not an error


def test_archive_custom_payload(spark, tmp_path):
    df = spark.createDataFrame(
        [(4, 1, 2, bytearray(b"alpha")), (4, 3, 4, bytearray(b"")), (5, 0, 0, bytearray(b"beta"))],
        "zoom int, gx long, gy long, blob binary",
    )
    path = str(tmp_path / "custom.wcsp")
    assert write_tile_archive(df, path, payload_col="blob") == 3
    arc = TileArchive(path)
    assert arc.get(4, 1, 2) == b"alpha"
    assert arc.get(4, 3, 4) == b""  # zero-length payloads round-trip
    assert arc.get(5, 0, 0) == b"beta"
    assert [g for g, *_ in arc.zoom_slice(4)] == [1, 3]


def test_archive_negative_and_large_counts_le64(spark, tmp_path):
    """The JVM-side little-endian encoder must agree with struct '<q'
    across the long range (two's complement, >32-bit values)."""
    df = spark.createDataFrame(
        [(4, 0, 0, 1), (4, 0, 1, (1 << 40) + 123), (4, 1, 0, 9_999_999_999)],
        "zoom int, gx long, gy long, doc_count long",
    )
    path = str(tmp_path / "wide.wcsp")
    write_tile_archive(df, path)
    arc = TileArchive(path)
    assert arc.doc_count(4, 0, 0) == 1
    assert arc.doc_count(4, 0, 1) == (1 << 40) + 123
    assert arc.doc_count(4, 1, 0) == 9_999_999_999
