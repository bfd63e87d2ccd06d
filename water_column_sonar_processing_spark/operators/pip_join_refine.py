"""All-JVM exact PIP refine: ray casting as a broadcast edge join.

The even-odd ray cast counts polygon edges crossed by a horizontal ray.
That count is a JOIN + AGGREGATE: candidates x broadcast(edges of their
polygon) -> filter the crossing predicate -> parity of the per-(point,
polygon) count. Everything stays in whole-stage codegen; Catalyst's
partial aggregation collapses the edge expansion map-side, so the shuffle
carries one row per (point, polygon) candidate — there is NO Python/Arrow
hop at all (compare operators/pip.py's pandas-UDF refine: same formula,
same IEEE semantics, hence identical accept/reject decisions).

At 100 TB this is the preferred refine when polygons have bounded edge
counts (the x|edges| row expansion never materializes — it is pipelined
into the partial agg); the Arrow refine remains for huge-vertex polygons
where per-batch numpy wins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pip import build_cover_df, parse_wkt_polygon


def build_edges_df(spark: SparkSession, polygons_pdf: pd.DataFrame) -> DataFrame:
    """Polygon table -> broadcastable edge table (polygon_id, xi, yi, xj, yj)."""
    rows = []
    for _, p in polygons_pdf.iterrows():
        ring = parse_wkt_polygon(p["wkt"])
        prev = np.roll(ring, 1, axis=0)
        for (xi, yi), (xj, yj) in zip(ring, prev):
            rows.append((int(p["polygon_id"]), float(xi), float(yi), float(xj), float(yj)))
    schema = T.StructType(
        [
            T.StructField("polygon_id", T.LongType(), False),
            T.StructField("xi", T.DoubleType(), False),
            T.StructField("yi", T.DoubleType(), False),
            T.StructField("xj", T.DoubleType(), False),
            T.StructField("yj", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema=schema)


def pip_join_jvm(
    points: DataFrame,
    polygons_pdf: pd.DataFrame,
    res: int = 7,
    lat: str = "lat",
    lon: str = "lon",
    keep_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Two-phase PIP join with the all-JVM edge-parity refine.

    Phase 1 identical to operators/pip.py (broadcast cell cover, FULL
    cells accepted sans test). Phase 2: boundary candidates join the
    broadcast edge table on polygon_id; the horizontal-ray crossing
    predicate filters edges; odd crossing count per (point, polygon) means
    inside. Columns in keep_cols must uniquely key a point row.
    """
    from ..functions import cells

    spark = points.sparkSession
    cover = build_cover_df(spark, polygons_pdf, res)
    edges = build_edges_df(spark, polygons_pdf)

    pts = points.filter(F.col(lat).isNotNull() & F.col(lon).isNotNull()).withColumn(
        "cell_id", cells.grid_cell(F.col(lat), F.col(lon), res)
    )
    cand = pts.join(F.broadcast(cover), "cell_id").select(*keep_cols, lat, lon, "polygon_id", "is_full")

    # SINGLE pass: boundary rows expand over their polygon's edges via a
    # conditional LEFT broadcast join (FULL rows match nothing -> no
    # expansion, no second scan); crossing predicate mirrors
    # _points_in_poly bit-for-bit (same expression, same IEEE ops)
    e = F.broadcast(edges.withColumnRenamed("polygon_id", "e_pid"))
    joined = cand.join(e, (F.col("polygon_id") == F.col("e_pid")) & ~F.col("is_full"), "left")
    x, y = F.col(lon), F.col(lat)
    crossing = ((F.col("yi") > y) != (F.col("yj") > y)) & (
        x < (F.col("xj") - F.col("xi")) * (y - F.col("yi")) / (F.col("yj") - F.col("yi")) + F.col("xi")
    )
    return (
        joined.withColumn("_cross", F.when(crossing, F.lit(1)).otherwise(F.lit(0)))
        .groupBy(*keep_cols, "polygon_id", "is_full")
        .agg(F.sum("_cross").alias("_n"))
        .filter(F.col("is_full") | (F.col("_n") % 2 == 1))
        .select(*keep_cols, "polygon_id")
    )
