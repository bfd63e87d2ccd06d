"""GeoJSON source/sink (S12/S13 analogs).

Reference: geometry_manager.py writes FeatureCollections keyed by
timestamp (geometry/geometry_manager.py:117-158) and reads them back via
GeoDataFrame.from_features (aws/s3_manager.py:397-415,
geometry_manager.py:193-229). Spark restatement: native from_json /
explode over the features array — no Python geometry lib needed for the
point/linestring cases the pipeline emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _feature_schema(coords_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField(
                "geometry",
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("coordinates", coords_type),
                    ]
                ),
            ),
            T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
        ]
    )


FEATURE_SCHEMA = _feature_schema(T.ArrayType(T.ArrayType(T.DoubleType())))
_FEATURE_SCHEMA_POINT = _feature_schema(T.ArrayType(T.DoubleType()))

FEATURE_COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(FEATURE_SCHEMA)),
    ]
)
_FC_SCHEMA_POINT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(_FEATURE_SCHEMA_POINT)),
    ]
)


def parse_feature_collections(df: DataFrame, json_col: str = "geojson") -> DataFrame:
    """FeatureCollection JSON strings -> exploded rows
    (feature_id, geom_type, coordinates, properties).

    Point features are NORMALIZED to one-element coordinate arrays
    ([[lon, lat]], geom_type stays 'Point') so the output schema is
    uniform and linestring_to_points works on both. (A single from_json
    schema cannot type both array<double> and array<array<double>>
    coordinates, and the old line-only schema silently nulled Point
    coords — r4 review; the JSON is parsed once per shape, same string,
    features aligned by index.)

    Requires spark.sql.json.enablePartialResults (default true since
    Spark 3.4): with it disabled, a FeatureCollection mixing LineString
    and Point features parses to a fully-NULL _fcp struct (the LineString
    coordinate arrays fail the Point schema and poison the whole row)
    and Point coordinates would silently become NULL — checked here so
    the failure is loud instead."""
    partial = df.sparkSession.conf.get("spark.sql.json.enablePartialResults", "true")
    if str(partial).lower() != "true":
        raise RuntimeError(
            "parse_feature_collections needs spark.sql.json.enablePartialResults=true "
            "(the dual-schema Point/LineString parse relies on partial results; "
            "with it disabled Point coordinates silently null out)"
        )
    parsed = df.withColumn(
        "_fc", F.from_json(F.col(json_col), FEATURE_COLLECTION_SCHEMA)
    ).withColumn("_fcp", F.from_json(F.col(json_col), _FC_SCHEMA_POINT))
    exploded = parsed.select("*", F.posexplode("_fc.features").alias("_i", "feature"))
    point_coords = (
        F.element_at(F.col("_fcp.features"), F.col("_i") + 1)
        .getField("geometry")
        .getField("coordinates")
    )
    coords = F.when(
        F.col("feature.geometry.type") == "Point", F.array(point_coords)
    ).otherwise(F.col("feature.geometry.coordinates"))
    return exploded.select(
        F.col("feature.id").alias("feature_id"),
        F.col("feature.geometry.type").alias("geom_type"),
        coords.alias("coordinates"),
        F.col("feature.properties").alias("properties"),
    )


def linestring_to_points(df: DataFrame, coord_col: str = "coordinates") -> DataFrame:
    """Explode LineString coordinate arrays into ordered (seq, lon, lat)
    rows — the inverse of tracks_to_geojson."""
    return df.select(
        "*",
        F.posexplode(F.col(coord_col)).alias("seq", "pt"),
    ).select(
        *[c for c in df.columns if c != coord_col],
        "seq",
        F.col("pt").getItem(0).alias("lon"),
        F.col("pt").getItem(1).alias("lat"),
    )
