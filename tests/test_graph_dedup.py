"""connected_components (large-star/small-star) vs a pure-python
union-find oracle, and the dedup_corpus end-to-end removal operator."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from water_column_sonar_processing_spark.operators import dedup as dedup_op
from water_column_sonar_processing_spark.operators.graph import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _cc_spark(spark, edges, **kw):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r["node"]: r["component"] for r in connected_components(pairs, **kw).collect()}


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc_spark(spark, edges)
    want = _union_find(n, edges)
    touched = {x for e in edges for x in e}
    assert got == {x: want[x] for x in touched}


def test_cc_long_chain_converges_fast(spark):
    # a path graph is the worst case for naive O(diameter) label
    # propagation; the alternating algorithm must finish in max_iter=15
    n = 512
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {
        r["node"]: r["component"]
        for r in connected_components(pairs, max_iter=15, local_finish_edges=0).collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_cc_local_finish_equals_distributed(spark):
    """r4 hybrid: the bounded driver-side union-find finish and the
    distributed star loop produce identical labelings (long AND string
    ids), and the random-graph oracle check runs through BOTH paths."""
    rng = random.Random(23)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(350)]
    edges = [(a, b) for a, b in edges if a != b]
    local = _cc_spark(spark, edges)  # default threshold -> local path
    dist = _cc_spark(spark, edges, local_finish_edges=0)
    assert local == dist
    sedges = [("b.com", "a.com"), ("b.com", "c.com"), ("x.com", "y.com")]
    pairs = spark.createDataFrame(sedges, "id_a string, id_b string")
    s_local = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    s_dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, local_finish_edges=0).collect()
    }
    assert s_local == s_dist


def test_cc_multiple_components_and_dup_edges(spark):
    edges = [(1, 2), (2, 1), (2, 3), (10, 11), (20, 20), (30, 31), (31, 32), (30, 32)]
    got = _cc_spark(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 30: 30, 31: 30, 32: 30}


def test_cc_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_cc_string_ids(spark):
    # doc ids are urls in real corpora: min-label semantics follow string
    # ordering, the algorithm is type-agnostic
    edges = [("b.com", "a.com"), ("b.com", "c.com"), ("x.com", "y.com")]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {
        "a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
        "x.com": "x.com", "y.com": "x.com",
    }


def test_cc_max_iter_exhaustion_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(64)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1, local_finish_edges=0)


def test_dedup_corpus_removes_chained_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again %d"
    rows = []
    # cluster A: doc 0 exact-dup'd by 1; 2 and 3 near-dups chained off 0
    doc = " ".join(base % i for i in range(30))
    rows.append((0, doc))
    rows.append((1, doc))  # exact dup
    rows.append((2, doc.replace("fox", "cat", 2)))  # near dup of 0
    rows.append((3, doc.replace("fox", "cat", 2).replace("dog", "owl", 2)))  # near dup of 2
    # cluster B: unrelated doc survives
    rows.append((4, " ".join("completely different content block %d stream" % i for i in range(40))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_op.dedup_corpus(df, verify_threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert kept == [0, 4]
    # schema passthrough
    assert out.columns == df.columns


def test_dedup_corpus_no_dups_is_identity(spark):
    rows = [(i, " ".join(f"token{i}_{j} unique" for j in range(40))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_op.dedup_corpus(df)
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(6))


def test_dedup_corpus_string_ids(spark):
    doc = " ".join("string keyed corpora use url doc ids %d" % i for i in range(30))
    df = spark.createDataFrame(
        [("u/a", doc), ("u/b", doc), ("u/c", "a totally distinct third document body here")],
        "doc_id string, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_op.dedup_corpus(df).collect())
    assert kept == ["u/a", "u/c"]


def test_dedup_corpus_lsh_only_path(spark):
    # verify_threshold=None trusts LSH candidates directly
    doc = " ".join("shared boilerplate sentence number %d here" % i for i in range(30))
    df = spark.createDataFrame([(7, doc), (8, doc + " tail")], "doc_id long, text string")
    out = dedup_op.dedup_corpus(df, verify_threshold=None)
    assert [r["doc_id"] for r in out.collect()] == [7]


def test_numpy_cc_kernel_matches_union_find_large():
    """The r5 vectorized driver kernel (_numpy_cc) against an independent
    per-edge union-find on a 60k-edge supercritical random graph — the
    scale region the bounded local finish actually serves (no Spark in
    the loop; the Spark-facing equality is pinned by
    test_cc_local_finish_equals_distributed)."""
    import numpy as np

    from water_column_sonar_processing_spark.operators.graph import _numpy_cc

    rng = np.random.default_rng(11)
    n = 80_000
    e = 60_000
    s0 = rng.integers(0, n, e) * 13 + 5
    d0 = rng.integers(0, n, e) * 13 + 5
    m = s0 != d0
    s0, d0 = s0[m], d0[m]
    src = np.concatenate([s0, d0])
    dst = np.concatenate([d0, s0])
    nodes, comp = _numpy_cc(src, dst)

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(s0.tolist(), d0.tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = {x: find(x) for x in parent}
    assert len(nodes) == len(want)
    assert all(want[int(nd)] == int(c) for nd, c in zip(nodes, comp))


def test_numpy_cc_kernel_asymmetric_edges_and_self_loops():
    """r5 review: the kernel must not require the symmetric closure —
    a one-sided (hi, lo) edge connects, and a self-loop-only node still
    appears as its own component (the old per-edge union-find handled
    both, so the vectorized kernel must too)."""
    import numpy as np

    from water_column_sonar_processing_spark.operators.graph import _numpy_cc

    src = np.array([9, 5, 20], dtype=np.int64)  # (9,3) one-sided, (5,5) self
    dst = np.array([3, 5, 21], dtype=np.int64)
    nodes, comp = _numpy_cc(src, dst)
    got = dict(zip(nodes.tolist(), comp.tolist()))
    assert got == {9: 3, 3: 3, 5: 5, 20: 20, 21: 20}
