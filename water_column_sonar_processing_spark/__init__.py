"""water_column_sonar_processing_spark — a from-scratch PySpark-native
spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the reference
pipeline (CI-CMG/water-column-sonar-processing, studied read-only at
/root/reference/) as an idiomatic Spark DataFrame engine:

- L0 -> L1: per-page geolocation extraction + QC (the analog of
  raw_to_zarr.py per-file ingest),
- L1 -> L2: global offset assignment + cell/tile encoding + tile-pyramid
  consolidation (the analog of create_empty_zarr_store.py +
  resample_regrid.py),
- geometry: track speed/distance/outlier analytics, Kalman smoothing,
  line simplification (geometry/*.py analogs),
- lineage: per-partition checkpoint metrics table enabling resume
  (dynamodb_manager.py + pipeline_status.py analogs).

Everything is built on pyspark.sql DataFrame + vectorized pandas/Arrow
UDFs; no RDDs, no per-row Python in hot paths.
"""

__version__ = "0.1.0"
