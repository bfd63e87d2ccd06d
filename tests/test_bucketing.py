"""Bucketed co-located join: the pre-partitioning strategy that removes
the shuffle from repeated cell-keyed joins (SURVEY §4 partitioning row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.sources.catalog import write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    a = spark.range(0, 20000).withColumn("cell_id", F.col("id") % 500).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 5000).withColumn("cell_id", F.col("id") % 500).withColumn("w", F.col("id") * 3)
    write_bucketed(a, "bk_a", ("cell_id",), n_buckets=8)
    write_bucketed(b, "bk_b", ("cell_id",), n_buckets=8)
    ta = spark.table("bk_a")
    tb = spark.table("bk_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = ta.join(tb, "cell_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join with ZERO exchanges
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        n = joined.count()
        # oracle: each cell key matches (40 a-rows x 10 b-rows)
        assert n == 500 * 40 * 10
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_agg_has_no_exchange(spark):
    df = spark.range(0, 10000).withColumn("cell_id", F.col("id") % 100).withColumn("v", F.col("id"))
    write_bucketed(df, "bk_c", ("cell_id",), n_buckets=8)
    try:
        agg = spark.table("bk_c").groupBy("cell_id").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_c")


def test_export_table_alt_formats_roundtrip(spark, tmp_path_factory):
    """S11 alternate-format sink: the same table serialized to ORC and CSV
    reads back value-identical; the netcdf seam is gated like real media
    decode (dependency absent in this container)."""
    from water_column_sonar_processing_spark.sources.catalog import export_table

    root = str(tmp_path_factory.mktemp("export"))
    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 7).alias("zoom"),
        (F.col("id") * 3).cast("double").alias("v"),
    )
    want = {(r["id"], r["zoom"], r["v"]) for r in df.collect()}

    p_orc = export_table(df, root + "/t_orc", fmt="orc")
    got_orc = {(r["id"], r["zoom"], r["v"]) for r in spark.read.orc(p_orc).collect()}
    assert got_orc == want

    p_csv = export_table(df, root + "/t_csv", fmt="csv")
    back = spark.read.option("header", "true").csv(p_csv)
    got_csv = {
        (int(r["id"]), int(r["zoom"]), float(r["v"])) for r in back.collect()
    }
    assert got_csv == want

    # r4: netcdf is a real sink now (see test_netcdf_export for the full
    # spec-conformance suite); the alt-format round-trip covers it too
    from water_column_sonar_processing_spark.sources.netcdf import read_netcdf_classic
    import glob

    p_nc = export_table(df, root + "/t_nc", fmt="netcdf")
    got_nc = set()
    for part in glob.glob(p_nc + "/part-*.nc"):
        cols = read_netcdf_classic(part)
        for i in range(len(cols["id"])):
            got_nc.add((int(cols["id"][i]), int(cols["zoom"][i]), float(cols["v"][i])))
    assert got_nc == want

    with pytest.raises(ValueError):
        export_table(df, root + "/t_x", fmt="avroesque")


def test_write_table_sort_within_yields_ordered_row_groups(spark, tmp_path_factory):
    """sort_within=('cell_id',) must surface in parquet row-group min/max
    stats: within every written file the cell_id ranges of consecutive
    row groups are non-overlapping (what lets a cell-range reader skip
    whole row groups at 100 TB)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from water_column_sonar_processing_spark.sources.catalog import write_table

    out = str(tmp_path_factory.mktemp("sorted_write"))
    df = (
        spark.range(200_000)
        .select(
            F.col("id"),
            # scatter cell ids so unsorted writes would interleave ranges
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("cell_id"),
        )
        .repartition(4)
    )
    # force small row groups so each file has several (must go on the
    # hadoop conf — a runtime spark.conf set does not reach the writer)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        write_table(df, out, "t", sort_within=("cell_id",))
    finally:
        hconf.unset("parquet.block.size") if old is None else hconf.set("parquet.block.size", old)

    files = glob.glob(os.path.join(out, "t", "*.parquet"))
    assert files
    multi = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}["cell_id"]
        ranges = [
            (md.row_group(g).column(idx).statistics.min, md.row_group(g).column(idx).statistics.max)
            for g in range(md.num_row_groups)
        ]
        if len(ranges) > 1:
            multi += 1
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, (f, ranges)  # sorted -> non-overlapping, ascending
    assert multi > 0  # the stats claim is vacuous unless some file has >1 row group
