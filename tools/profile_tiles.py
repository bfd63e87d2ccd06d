"""Stage-level profiling of the tile_pyramid kernel at one parallelism
level (run in separate processes per level — one JVM per master).

Usage: python tools/profile_tiles.py <cpus> <rows> [shuffle_partitions]
Prints JSON: scan+base-agg time, fanout time, full-kernel time.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from water_column_sonar_processing_spark.functions import cells  # noqa: E402
from water_column_sonar_processing_spark.operators import tiles as tiles_op  # noqa: E402
from water_column_sonar_processing_spark.session import get_spark  # noqa: E402


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main():
    cpus = int(sys.argv[1])
    rows = int(sys.argv[2])
    shuf = int(sys.argv[3]) if len(sys.argv) > 3 else max(cpus, 16)
    spark = get_spark("tiles-prof", cores=cpus, shuffle_partitions=shuf)
    bench_dir = os.path.join("/tmp", f"wcsp_bench_pages_v2_{rows}")
    if not os.path.exists(bench_dir):
        import bench

        bench.synth_pages(spark, rows).repartition(128).write.mode("overwrite").parquet(bench_dir + ".tmp")
        import shutil

        shutil.move(bench_dir + ".tmp", bench_dir)
    pages = spark.read.parquet(bench_dir)
    valid = pages.filter(
        F.col("lat0").between(-90.0, 90.0)
        & F.col("lon0").between(-180.0, 180.0)
        & ~((F.abs("lat0") < 0.001) & (F.abs("lon0") < 0.001))
    ).select("url", F.col("lat0").alias("lat"), F.col("lon0").alias("lon"), "text")

    base_gx, base_gy = cells.grid_cell_xy(F.col("lat"), F.col("lon"), 12)
    base = (
        valid.select(base_gx.alias("bgx"), base_gy.alias("bgy"))
        .groupBy("bgx", "bgy")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    n_base = base.count()  # warms scan + gives cardinality

    res = {"cpus": cpus, "rows": rows, "shuffle_partitions": shuf, "base_cells": n_base}

    def scan_only():
        force(valid.select(base_gx.alias("bgx"), base_gy.alias("bgy")))

    def base_agg():
        force(base)

    def full():
        force(tiles_op.tile_pyramid(valid, base_res=12, min_res=4))

    for name, fn in (("scan_cells", scan_only), ("base_agg", base_agg), ("full", full)):
        fn()  # warm
        res[name] = min(timed(fn), timed(fn))
    res["fanout_derived"] = round(res["full"] - res["base_agg"], 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
