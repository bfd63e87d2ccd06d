"""interval_join (bucketized range join) vs a DuckDB BETWEEN oracle on
identical data, plus plan-shape and edge-case checks."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyspark.sql.functions as F
import pytest

from water_column_sonar_processing_spark.operators.interval import (
    interval_join,
    suggest_bucket_width,
)


def _data(seed=3, n_pts=4000, n_iv=300):
    import numpy as np

    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {"event_id": range(n_pts), "ts": rng.integers(0, 100_000, n_pts)}
    )
    starts = rng.integers(0, 100_000, n_iv)
    spans = rng.integers(1, 3_000, n_iv)
    iv = pd.DataFrame({"win_id": range(n_iv), "start": starts, "end": starts + spans})
    return pts, iv


def _oracle(pts, iv):
    con = duckdb.connect()
    con.register("pts", pts)
    con.register("iv", iv)
    return sorted(
        map(
            tuple,
            con.execute(
                "SELECT p.event_id, i.win_id FROM pts p JOIN iv i"
                " ON p.ts >= i.start AND p.ts < i.end"
            ).fetchall(),
        )
    )


@pytest.mark.parametrize("bucket_width", [None, 7, 50_000])
def test_interval_join_matches_duckdb_between(spark, bucket_width):
    """Any bucket width gives the same exact pairs (width is a perf knob,
    never a semantics knob)."""
    pts, iv = _data()
    got = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv), bucket_width=bucket_width
    )
    got_pairs = sorted((r["event_id"], r["win_id"]) for r in got.collect())
    assert got_pairs == _oracle(pts, iv)
    assert len(got_pairs) > 1000  # the layout actually produces overlap


def test_interval_join_no_bnl_or_cartesian(spark):
    pts, iv = _data(n_pts=500, n_iv=50)
    plan = interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv), bucket_width=500
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_left_keeps_unmatched_points(spark):
    pts = spark.createDataFrame([(1, 5), (2, 50), (3, 500)], "event_id long, ts long")
    iv = spark.createDataFrame([(10, 0, 10), (11, 40, 60)], "win_id long, start long, end long")
    out = interval_join(pts, iv, bucket_width=8, how="left").collect()
    by_event = {}
    for r in out:
        by_event.setdefault(r["event_id"], []).append(r["win_id"])
    assert by_event == {1: [10], 2: [11], 3: [None]}


def test_interval_join_half_open_boundaries(spark):
    pts = spark.createDataFrame([(1, 10), (2, 19), (3, 20)], "event_id long, ts long")
    iv = spark.createDataFrame([(7, 10, 20)], "win_id long, start long, end long")
    out = sorted(r["event_id"] for r in interval_join(pts, iv, bucket_width=4).collect())
    assert out == [1, 2]  # start inclusive, end exclusive


def test_interval_join_overlapping_intervals_multimatch(spark):
    pts = spark.createDataFrame([(1, 15)], "event_id long, ts long")
    iv = spark.createDataFrame(
        [(1, 0, 30), (2, 10, 20), (3, 16, 40)], "win_id long, start long, end long"
    )
    out = sorted(r["win_id"] for r in interval_join(pts, iv, bucket_width=10).collect())
    assert out == [1, 2]


def test_empty_and_degenerate_intervals(spark):
    pts = spark.createDataFrame([(1, 5)], "event_id long, ts long")
    iv = spark.createDataFrame([(1, 7, 7), (2, 9, 8)], "win_id long, start long, end long")
    assert interval_join(pts, iv, bucket_width=4).count() == 0  # empty/reversed dropped


def test_suggest_bucket_width(spark):
    iv = spark.createDataFrame([(1, 0, 100), (2, 0, 200), (3, 0, 300)], "win_id long, start long, end long")
    assert suggest_bucket_width(iv) == 200


def test_interval_join_left_null_attrs_not_duplicated(spark):
    """ADVICE r3: a matched point whose OTHER columns contain NULL must not
    also come back NULL-extended — the anti-join is id-based, not
    column-equality-based (NULL = NULL is not true)."""
    pts = spark.createDataFrame(
        [(1, 5, None), (2, 50, 9.5), (3, 500, None)],
        "event_id long, ts long, lat double",
    )
    iv = spark.createDataFrame([(10, 0, 10), (11, 40, 60)], "win_id long, start long, end long")
    out = interval_join(pts, iv, bucket_width=8, how="left").collect()
    by_event = {}
    for r in out:
        by_event.setdefault(r["event_id"], []).append(r["win_id"])
    # event 1 (NULL lat, matched) appears exactly once, matched only
    assert by_event == {1: [10], 2: [11], 3: [None]}
    assert "_iv_pid" not in interval_join(pts, iv, bucket_width=8, how="left").columns
    assert "_iv_pid" not in interval_join(pts, iv, bucket_width=8).columns
