"""Declared schemas — the engine's DDL layer.

Reference analog: the centralized dtype/chunk constants and store DDL
(/root/reference/water_column_sonar_processing/utility/constants.py:39-106,
model/zarr_manager.py:55-305): every array's dtype, fill value, and chunk
shape is declared up front, never inferred. Same stance here: explicit
StructTypes at every boundary, schema-on-write.

NaN policy (SURVEY.md §7.4): the reference uses NaN fill values; this
engine normalizes missing coordinates to SQL NULL at ingest (qc module) —
floats in these schemas are nullable for exactly that reason.

ns-precision: Spark TimestampType is µs; epoch-ns rides as LongType in
track_points (the reference's int64 time axis,
tests/.../line_simplification fixture).
"""

from __future__ import annotations

from pyspark.sql import types as T

# the graft input (BASELINE.json input_hint shape)
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# L1: pages + extracted/QC'd coordinates + cell indexes
L1_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("cell_id", T.LongType(), True),
        T.StructField("hex_id", T.LongType(), True),
        T.StructField("s2_id", T.LongType(), True),
    ]
)

# L2 tile pyramid (the cruise-cube + PMTiles analog)
TILE_SCHEMA = T.StructType(
    [
        T.StructField("zoom", T.IntegerType(), False),
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("gx", T.LongType(), False),
        T.StructField("gy", T.LongType(), False),
        T.StructField("doc_count", T.LongType(), False),
    ]
)

# ordered geospatial series (HB1906 fixture mirror; ts is epoch-NS long)
TRACK_POINTS_SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("lat", T.FloatType(), True),
        T.StructField("lon", T.FloatType(), True),
    ]
)

POLYGONS_SCHEMA = T.StructType(
    [
        T.StructField("polygon_id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("wkt", T.StringType(), False),
    ]
)
