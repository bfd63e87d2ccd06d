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

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("coordinates", T.ArrayType(T.ArrayType(T.DoubleType()))),
                ]
            ),
        ),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(FEATURE_SCHEMA)),
    ]
)


def parse_feature_collections(df: DataFrame, json_col: str = "geojson") -> DataFrame:
    """FeatureCollection JSON strings -> exploded rows
    (feature_id, geom_type, coordinates, properties)."""
    parsed = df.withColumn("_fc", F.from_json(F.col(json_col), FEATURE_COLLECTION_SCHEMA))
    return (
        parsed.withColumn("feature", F.explode("_fc.features"))
        .select(
            F.col("feature.id").alias("feature_id"),
            F.col("feature.geometry.type").alias("geom_type"),
            F.col("feature.geometry.coordinates").alias("coordinates"),
            F.col("feature.properties").alias("properties"),
        )
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
