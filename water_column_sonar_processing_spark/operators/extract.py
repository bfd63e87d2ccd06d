"""Geolocation extraction from page text — the L0 decode stage.

Reference analog: ep.open_raw decoding of EK60 datagrams + GPS extraction
(/root/reference/water_column_sonar_processing/processing/raw_to_zarr.py:191-227,
geometry/geometry_manager.py:34-77). The graft parses `lat=.. lon=..`
mentions out of `text:string` with NATIVE regexp expressions (JVM-side,
whole-stage codegen — faster than any Python/Arrow hop) and classifies
`html:binary` by a 4-byte magic at offset 3 (datagram scan analog,
index/index_manager.py:237-250).

Per-row invariant: `text` passes through byte-identical per url — the
operator only ADDS columns, never rewrites `text`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LAT_RE = r"lat=(-?\d+\.\d+)"
LON_RE = r"lon=(-?\d+\.\d+)"


def extract_latlon(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add `lat`/`lon` doubles parsed from the text column (NULL if absent)."""
    lat_s = F.regexp_extract(F.col(text_col), LAT_RE, 1)
    lon_s = F.regexp_extract(F.col(text_col), LON_RE, 1)
    return df.withColumn("lat", F.when(lat_s != "", lat_s.cast("double"))).withColumn(
        "lon", F.when(lon_s != "", lon_s.cast("double"))
    )


def extract_latlon_sql(text: str) -> tuple[str, str]:
    """DuckDB twin: regexp_extract(text, re, 1) -> CAST AS DOUBLE."""
    lat = f"(CASE WHEN regexp_extract({text}, '{LAT_RE}', 1) <> '' THEN CAST(regexp_extract({text}, '{LAT_RE}', 1) AS DOUBLE) END)"
    lon = f"(CASE WHEN regexp_extract({text}, '{LON_RE}', 1) <> '' THEN CAST(regexp_extract({text}, '{LON_RE}', 1) AS DOUBLE) END)"
    return lat, lon


def classify_binary(html: Column) -> Column:
    """4-byte magic at offset 3 -> format label (EK60/EK80 scan analog).

    `substring` on BinaryType slices bytes without reading the rest of the
    payload — in a columnar scan this never touches the page body.
    """
    magic = F.substring(html, 4, 4).cast("string")
    return (
        F.when(magic == "CON0", F.lit("EK60"))
        .when(magic == "XML0", F.lit("EK80"))
        .otherwise(F.lit("UNKNOWN"))
    )


def filename_timestamp(name: Column) -> Column:
    """Parse D{yyyymmdd}-T{hhmmss} out of a file/url stem -> timestamp.

    Reference analog: index/index_manager.py:210-221 regex extraction.
    """
    d = F.regexp_extract(name, r"D(\d{8})", 1)
    t = F.regexp_extract(name, r"T(\d{6})", 1)
    # try_to_timestamp: under default-ANSI Spark 4, to_timestamp THROWS on
    # regex-valid but calendar-invalid stems (month 13, hour 25) — one
    # malformed filename must yield NULL, not kill the job (r4 review)
    return F.when((d != "") & (t != ""), F.try_to_timestamp(F.concat(d, t), F.lit("yyyyMMddHHmmss")))
