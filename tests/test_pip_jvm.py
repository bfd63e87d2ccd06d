"""The all-JVM edge-parity PIP refine must agree exactly with the Arrow
refine and the numpy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from water_column_sonar_processing_spark.operators import pip as pip_op
from water_column_sonar_processing_spark.operators.pip_join_refine import pip_join_jvm


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(777)
    n = 4000
    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(n)],
            "lat": rng.uniform(-80, 80, n),
            "lon": rng.uniform(-179, 179, n),
        }
    )
    df = spark.createDataFrame(pdf)
    df.cache().count()
    return pdf, df


def test_jvm_refine_equals_arrow_refine(spark, pts, polygons_pdf):
    pdf, df = pts
    arrow = {(r["url"], r["polygon_id"]) for r in pip_op.pip_join(df, polygons_pdf, res=6).collect()}
    jvm = {(r["url"], r["polygon_id"]) for r in pip_join_jvm(df, polygons_pdf, res=6).collect()}
    assert arrow == jvm
    assert len(jvm) > 0


def test_jvm_refine_matches_numpy(spark, pts, polygons_pdf):
    pdf, df = pts
    jvm = {(r["url"], r["polygon_id"]) for r in pip_join_jvm(df, polygons_pdf, res=5).collect()}
    exp = set()
    for _, p in polygons_pdf.iterrows():
        ring = pip_op.parse_wkt_polygon(p["wkt"])
        ins = pip_op._points_in_poly(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), ring)
        exp |= {(u, p["polygon_id"]) for u in pdf.loc[ins, "url"]}
    assert jvm == exp


def test_jvm_plan_has_no_python(spark, pts, polygons_pdf):
    _, df = pts
    plan = pip_join_jvm(df, polygons_pdf, res=6)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert "BroadcastHashJoin" in plan