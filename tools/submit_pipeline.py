"""spark-submit entry point for the L0->L1->L2 pipeline.

The north rule's deployment mode:

    python tools/make_pyfiles_zip.py                 # -> dist/wcsp.zip
    spark-submit --master <cluster> \\
        --py-files dist/wcsp.zip \\
        tools/submit_pipeline.py \\
        --pages <parquet dir> --polygons <parquet> --out <dir> [--res 7]

Uses the ambient SparkSession created by spark-submit (no master/conf
overrides here — cluster sizing lives in spark-submit args), so the same
script runs at N and 4N executors unchanged.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet dir")
    ap.add_argument("--polygons", required=True, help="polygon parquet (polygon_id, name, wkt)")
    ap.add_argument("--out", required=True, help="output root for L1/L2 tables")
    ap.add_argument("--res", type=int, default=7)
    ap.add_argument("--no-s2", action="store_true", help="skip the S2 pandas-UDF column")
    ap.add_argument("--no-resume", action="store_true", help="ignore lineage checkpoints")
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import SparkSession

    from water_column_sonar_processing_spark.plans.pipeline import run_pipeline

    spark = SparkSession.builder.appName("wcsp-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pages = spark.read.parquet(args.pages)
    polys = pd.read_parquet(args.polygons)
    paths = run_pipeline(
        spark,
        pages,
        polys,
        args.out,
        grid_res=args.res,
        with_s2=not args.no_s2,
        resume=not args.no_resume,
    )
    for name, p in paths.items():
        print(f"{name}: {p} rows={spark.read.parquet(p).count()}")


if __name__ == "__main__":
    main()
