"""Table catalog: partition-layout-faithful parquet tables.

The target deployment is Iceberg (`CREATE TABLE ... USING iceberg
PARTITIONED BY (...)`, MERGE INTO, overwritePartitions); this sandbox has
no Iceberg runtime jar, so the writer module keeps the exact partition
layout and idempotent-overwrite semantics on plain parquet behind one
seam — swapping in `df.writeTo(table).overwritePartitions()` is a one-line
change per call site (noted inline).

VENDORING ATTEMPT RECORD (round 4, so this is not re-proposed): the jar
cannot be obtained in this sandbox. Verified 2026-08-17:
- no iceberg/delta/hudi jar ships in pyspark's jars dir (grepped
  site-packages/pyspark/jars) and none exists anywhere on disk
  (`find / -name '*iceberg*'` -> only unrelated jars);
- the container has NO network egress: `curl repo1.maven.org` returns
  exit 000 (connect failure) and `pip download pyiceberg` resolves zero
  versions, so neither the Spark runtime jar
  (iceberg-spark-runtime-4.0_2.13) nor pyiceberg can be fetched;
- building from source is likewise impossible (no Maven/Gradle cache,
  no sources, no network).
What WOULD flip on a real cluster (each call site is marked inline):
write_table -> `writeTo(...).partitionedBy(...).createOrReplace()` /
`overwritePartitions()`; lineage.compact() -> `MERGE INTO` keyed on the
batch id; resume reads -> snapshot-scoped `VERSION AS OF`. The
semantics each emulation must preserve (atomic partition replace,
latest-wins upsert, read-your-own-committed) are pinned by
tests/test_pipeline_e2e.py and test_lineage_multimodal.py, so the flip
is mechanical.

Reference analog: the S3 prefix hierarchy as implicit catalog
(/root/reference/water_column_sonar_processing/index/index_manager.py:27-90,
utility/constants.py:29-32) and delete-before-write idempotency
(aws/s3_manager.py:346-367) — replaced by atomic dynamic-partition
overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import __version__ as _PKG_VERSION


def write_table(
    df: DataFrame,
    root: str,
    name: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    sort_within: tuple[str, ...] = (),
) -> str:
    """Write a table; dynamic partition overwrite replaces only touched
    partitions (Iceberg overwritePartitions analog).

    sort_within: task-local sort keys (sortWithinPartitions — NO extra
    shuffle) applied before the write so parquet row-group min/max
    statistics become selective on those columns: a reader filtering a
    cell/key range then skips whole row groups instead of scanning the
    file (the layout half of Iceberg's SORTED BY; at 100 TB this is the
    difference between touching one row group and one table)."""
    path = os.path.join(root, name)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        writer = writer.partitionBy(*partition_by).option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)
    return path


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, name))


EXPORT_FORMATS = ("parquet", "orc", "json", "csv", "netcdf")


def export_table(
    df: DataFrame,
    path: str,
    fmt: str = "orc",
    mode: str = "overwrite",
    allow_lossy_int64: bool = False,
) -> str:
    """S11 alternate-format sink (the reference's NetCDF export of the L2
    cube, processing/raw_to_netcdf.py:218-266, + geometry_manager.py
    GeoJSON): serialize the SAME table in a second format for downstream
    consumers.

    Spark-shipped formats are first-class. fmt='netcdf' (r4, previously
    library-gated) writes real classic-NetCDF (CDF-1) part files — one per
    partition, like every other Spark sink — via the from-scratch
    pure-numpy writer in sources/netcdf.py; no netCDF4/xarray needed."""
    if fmt == "netcdf":
        return _export_netcdf(df, path, mode, allow_lossy_int64=allow_lossy_int64)
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"unsupported export format {fmt!r}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    return path


def _export_netcdf(
    df: DataFrame, path: str, mode: str = "overwrite", allow_lossy_int64: bool = False
) -> str:
    """Distributed classic-NetCDF sink: each partition writes
    part-<NNNNN>.nc into `path` (mapInPandas; Arrow-batched), returning a
    tiny (file, rows) manifest that also serves as the action forcing the
    write. Empty partitions write nothing — the standard part-file shape.

    Commit protocol: each task writes to a random .tmp name and
    os.replace()s it over the final part name — a speculative/zombie
    duplicate attempt then atomically re-publishes identical content
    instead of tearing the winner's file mid-write. The sink requires a
    filesystem shared between executors and consumers (local/NFS), the
    same contract as the reference's direct-to-store writes
    (model/zarr_manager.py opens one store path from every worker).

    Each part carries the reference-parity global attributes
    (model/zarr_manager.py:289-301 stores software name/version on every
    store): software / version / rows."""
    import glob
    import shutil
    import uuid

    if mode not in ("overwrite", "error"):
        # append would re-use part-<pid> names and silently clobber
        raise ValueError(f"netcdf sink supports mode overwrite|error, got {mode!r}")
    if mode == "overwrite" and os.path.exists(path):
        shutil.rmtree(path)
    elif mode == "error" and os.path.exists(path):
        raise FileExistsError(path)
    os.makedirs(path, exist_ok=True)

    from .netcdf import write_netcdf_classic

    def write_parts(batches):
        from pyspark import TaskContext

        import pandas as pd

        pid = TaskContext.get().partitionId()
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        fn = os.path.join(path, f"part-{pid:05d}.nc")
        tmp = fn + f".{uuid.uuid4().hex}.tmp"
        # strict by default: int64 values beyond 32 bits raise unless the
        # CALLER opted into double narrowing (silent id corruption beyond
        # 2^53 — e.g. xxhash64 ids — must be a conscious choice)
        try:
            write_netcdf_classic(
                tmp,
                {c: pdf[c].to_numpy() for c in pdf.columns},
                allow_lossy_int64=allow_lossy_int64,
                attrs={
                    "software": "water_column_sonar_processing_spark",
                    "version": _PKG_VERSION,
                    "rows": int(len(pdf)),
                },
            )
            os.replace(tmp, fn)  # atomic publish (commit protocol, see docstring)
        finally:
            # a failed/killed attempt must not leave its .tmp in the
            # dataset directory (r5 review); os.replace consumed it on
            # the success path
            if os.path.exists(tmp):
                os.unlink(tmp)
        yield pd.DataFrame({"file": [fn], "rows": [len(pdf)]})

    manifest = df.mapInPandas(write_parts, "file string, rows long").collect()
    # verify against the manifest — but only when the DRIVER can see the
    # output directory at all: the sink's contract requires a filesystem
    # shared between executors and consumers, not necessarily the driver
    # (r5 review; a driver without the mount must not fail a successful
    # export)
    if os.path.isdir(path):
        written = {r["file"] for r in manifest}
        missing = [f for f in written if not os.path.exists(f)]
        if missing:
            raise IOError(f"netcdf sink: manifest lists unpublished parts {missing[:3]}")
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on bucket_cols later co-locate
    WITHOUT a shuffle (Iceberg `bucket(n, col)` partition-transform
    analog). The 100-TB pattern: bucket the L1 pages table by cell_id so
    every downstream cell-keyed join/agg skips its Exchange."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def load_sf_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict[str, DataFrame]:
    """Load driver test tables and register temp views (SQL entry point)."""
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
