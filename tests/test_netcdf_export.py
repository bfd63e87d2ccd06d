"""S11 netCDF sink: the from-scratch classic-format writer against a
hand-built byte oracle (spec conformance, not just self-consistency),
round-trip through the independent reader, and the distributed
export_table('netcdf') sink."""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pytest

from water_column_sonar_processing_spark.sources import catalog
from water_column_sonar_processing_spark.sources.netcdf import (
    read_netcdf_classic,
    write_netcdf_classic,
)


def test_writer_matches_hand_built_spec_bytes(tmp_path):
    """Golden bytes assembled by hand straight from the classic-format
    spec (magic, big-endian dim/var lists, 4-byte alignment) for a 2-row
    NC_INT variable — pins the writer to the SPEC, so writer and reader
    cannot share an encoding bug invisibly."""
    p = str(tmp_path / "tiny.nc")
    write_netcdf_classic(p, {"a": np.array([1, 2], dtype=np.int32)})
    expected = b"".join(
        [
            b"CDF\x01",
            struct.pack(">i", 0),  # numrecs
            struct.pack(">ii", 0x0A, 1),  # NC_DIMENSION, 1 dim
            struct.pack(">i", 3) + b"row\x00",  # name "row" padded to 4
            struct.pack(">i", 2),  # dim size
            struct.pack(">ii", 0, 0),  # no global attributes
            struct.pack(">ii", 0x0B, 1),  # NC_VARIABLE, 1 var
            struct.pack(">i", 1) + b"a\x00\x00\x00",  # name "a" padded
            struct.pack(">i", 1),  # ndims
            struct.pack(">i", 0),  # dimid 0 (row)
            struct.pack(">ii", 0, 0),  # no var attributes
            struct.pack(">i", 4),  # NC_INT
            struct.pack(">i", 8),  # vsize
            struct.pack(">i", 80),  # begin offset (header is 80 bytes)
            struct.pack(">ii", 1, 2),  # the data
        ]
    )
    with open(p, "rb") as f:
        assert f.read() == expected


def test_roundtrip_all_types(tmp_path):
    p = str(tmp_path / "mixed.nc")
    cols = {
        "i32": np.array([1, -2, 3], dtype=np.int32),
        "i64_small": np.array([10, 20, 30], dtype=np.int64),  # narrows to NC_INT
        "f32": np.array([1.5, 2.5, -3.25], dtype=np.float32),
        "f64": np.array([1e-9, 2.0, 3e9], dtype=np.float64),
        "s": np.array(["ab", "", "xyz"], dtype=object),
        "b": np.array([True, False, True]),
    }
    write_netcdf_classic(p, cols)
    got = read_netcdf_classic(p)
    assert set(got) == set(cols)
    np.testing.assert_array_equal(got["i32"], cols["i32"])
    np.testing.assert_array_equal(got["i64_small"], cols["i64_small"].astype(np.int32))
    np.testing.assert_array_equal(got["f32"], cols["f32"])
    np.testing.assert_array_equal(got["f64"], cols["f64"])
    assert list(got["s"]) == ["ab", "", "xyz"]
    np.testing.assert_array_equal(got["b"], np.array([1, 0, 1], dtype=np.int8))


def test_int64_lossy_guard(tmp_path):
    p = str(tmp_path / "big.nc")
    big = np.array([2**40, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="int64"):
        write_netcdf_classic(p, {"x": big})
    write_netcdf_classic(p, {"x": big}, allow_lossy_int64=True)
    np.testing.assert_array_equal(read_netcdf_classic(p)["x"], big.astype(np.float64))


def test_export_table_netcdf_distributed(spark, tmp_path):
    """The Spark sink writes one part-<pid>.nc per non-empty partition and
    the union of parts round-trips the exact table contents."""
    from pyspark.sql import functions as F

    df = (
        spark.range(1000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("int").alias("grp"),
            (F.col("id") * 0.5).alias("score"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        )
        .repartition(4)
    )
    out = str(tmp_path / "nc_export")
    catalog.export_table(df, out, fmt="netcdf")
    parts = sorted(glob.glob(os.path.join(out, "part-*.nc")))
    assert 1 <= len(parts) <= 4
    rows = []
    for part in parts:
        cols = read_netcdf_classic(part)
        for i in range(len(cols["doc_id"])):
            rows.append((int(cols["doc_id"][i]), int(cols["grp"][i]), float(cols["score"][i]), cols["url"][i]))
    exp = [(r["doc_id"], r["grp"], r["score"], r["url"]) for r in df.collect()]
    assert sorted(rows) == sorted(exp)
    # overwrite mode replaces, error mode refuses
    catalog.export_table(df.limit(10), out, fmt="netcdf", mode="overwrite")
    assert sum(len(read_netcdf_classic(p)["doc_id"]) for p in glob.glob(os.path.join(out, "part-*.nc"))) == 10
    with pytest.raises(FileExistsError):
        catalog.export_table(df, out, fmt="netcdf", mode="error")


def test_int64_strict_by_default_in_sink(spark, tmp_path):
    """Review r4: the sink must not silently narrow big int64 (e.g.
    xxhash64 ids) — strict unless the caller opts in."""
    from pyspark.sql import functions as F

    df = spark.range(5).select(F.xxhash64(F.col("id").cast("string")).alias("h"))
    out = str(tmp_path / "strict")
    with pytest.raises(Exception, match="int64"):
        catalog.export_table(df, out, fmt="netcdf")
    catalog.export_table(df, out, fmt="netcdf", mode="overwrite", allow_lossy_int64=True)


def test_unsupported_dtype_fails_loudly(tmp_path):
    with pytest.raises(ValueError, match="no classic-NetCDF mapping"):
        write_netcdf_classic(
            str(tmp_path / "ts.nc"),
            {"t": np.array(["2026-01-01"], dtype="datetime64[ns]")},
        )


def test_unsigned_widening(tmp_path):
    p = str(tmp_path / "u.nc")
    cols = {
        "u8col": np.array([0, 200, 255], dtype=np.uint8),
        "u32col": np.array([0, 2**31 + 5], dtype=np.uint32)[:3],
    }
    write_netcdf_classic(p, {"u8col": cols["u8col"]})
    got = read_netcdf_classic(p)
    np.testing.assert_array_equal(got["u8col"], cols["u8col"].astype(np.int16))


def test_export_netcdf_empty_table(spark, tmp_path):
    df = spark.range(0).select(F_col_id())
    out = str(tmp_path / "empty")
    import water_column_sonar_processing_spark.sources.catalog as c

    p = c.export_table(df, out, fmt="netcdf")
    assert glob.glob(os.path.join(p, "part-*.nc")) == []


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id")


def test_global_attrs_hand_built_spec_bytes(tmp_path):
    """Golden bytes for a file WITH one global attribute, assembled by
    hand from the spec's att_list grammar (NC_ATTRIBUTE tag, name,
    nc_type, nelems, 4-byte-padded values) — updated by spec, not by
    re-recording the writer's output."""
    p = str(tmp_path / "attr.nc")
    write_netcdf_classic(p, {"a": np.array([1, 2], dtype=np.int32)}, attrs={"sw": "x"})
    expected = b"".join(
        [
            b"CDF\x01",
            struct.pack(">i", 0),  # numrecs
            struct.pack(">ii", 0x0A, 1),  # NC_DIMENSION, 1 dim
            struct.pack(">i", 3) + b"row\x00",  # name "row" padded to 4
            struct.pack(">i", 2),  # dim size
            struct.pack(">ii", 0x0C, 1),  # NC_ATTRIBUTE, 1 global attr
            struct.pack(">i", 2) + b"sw\x00\x00",  # attr name "sw" padded
            struct.pack(">i", 2),  # NC_CHAR
            struct.pack(">i", 1),  # nelems = 1 byte
            b"x\x00\x00\x00",  # value padded to 4
            struct.pack(">ii", 0x0B, 1),  # NC_VARIABLE, 1 var
            struct.pack(">i", 1) + b"a\x00\x00\x00",  # name "a" padded
            struct.pack(">i", 1),  # ndims
            struct.pack(">i", 0),  # dimid 0 (row)
            struct.pack(">ii", 0, 0),  # no var attributes
            struct.pack(">i", 4),  # NC_INT
            struct.pack(">i", 8),  # vsize
            struct.pack(">i", 100),  # begin (80-byte r4 header + 20-byte gatt)
            struct.pack(">ii", 1, 2),  # the data
        ]
    )
    with open(p, "rb") as f:
        assert f.read() == expected


def test_global_attrs_roundtrip(tmp_path):
    from water_column_sonar_processing_spark.sources.netcdf import read_netcdf_classic_full

    p = str(tmp_path / "attrs.nc")
    attrs = {"software": "wcsp-spark", "rows": 3, "scale": 0.25}
    write_netcdf_classic(p, {"a": np.array([1, 2, 3], dtype=np.int32)}, attrs=attrs)
    cols, got = read_netcdf_classic_full(p)
    np.testing.assert_array_equal(cols["a"], [1, 2, 3])
    assert got == attrs
    assert isinstance(got["rows"], int) and isinstance(got["scale"], float)
    # attr-free files still parse (ABSENT gatt list) and report {}
    p2 = str(tmp_path / "noattrs.nc")
    write_netcdf_classic(p2, {"a": np.array([1], dtype=np.int32)})
    assert read_netcdf_classic_full(p2)[1] == {}


def test_zero_row_write_refused(tmp_path):
    """A ('row', 0) dimension denotes the record dimension in the classic
    spec — conforming external readers would misread the file, so the
    writer refuses (ADVICE r4)."""
    with pytest.raises(ValueError, match="zero-row"):
        write_netcdf_classic(str(tmp_path / "e.nc"), {"a": np.array([], dtype=np.int32)})


def test_sink_parts_carry_provenance_attrs(spark, tmp_path):
    """Reference parity: every store carries software/version metadata
    (model/zarr_manager.py:289-301) — each .nc part does too."""
    from water_column_sonar_processing_spark import __version__
    from water_column_sonar_processing_spark.sources.netcdf import read_netcdf_classic_full

    df = spark.range(20).toDF("doc_id").coalesce(1)
    out = str(tmp_path / "prov")
    catalog.export_table(df, out, fmt="netcdf")
    (part,) = glob.glob(os.path.join(out, "part-*.nc"))
    _, attrs = read_netcdf_classic_full(part)
    assert attrs["software"] == "water_column_sonar_processing_spark"
    assert attrs["version"] == __version__
    assert attrs["rows"] == 20
