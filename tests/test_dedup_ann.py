"""Dedup family + ANN tests with planted duplicates and numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.operators import ann as ann_op
from water_column_sonar_processing_spark.operators import dedup as dedup_op


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(99)
    vocab = ["spark", "join", "filter", "window", "scan", "merge", "agg", "sort", "hash", "batch"]
    rows = []
    for i in range(200):
        words = rng.choice(vocab, size=30).tolist()
        rows.append((i, " ".join(words)))
    # planted exact duplicates
    rows.append((200, rows[0][1]))
    rows.append((201, rows[1][1]))
    # planted near-duplicate: one word changed
    w = rows[2][1].split()
    w[5] = "changed"
    rows.append((202, " ".join(w)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.cache().count()
    return rows, df


def test_exact_dedup_finds_planted(spark, docs):
    rows, df = docs
    out = dedup_op.exact_dedup(df).filter(F.col("dup_count") > 1).collect()
    keepers = {r["keep_id"]: r["dup_count"] for r in out}
    assert keepers.get(0) == 2 and keepers.get(1) == 2


def test_minhash_lsh_catches_near_dups(spark, docs):
    rows, df = docs
    pairs = {(r["id_a"], r["id_b"]) for r in dedup_op.minhash_lsh_pairs(df, n_perm=32, bands=16).collect()}
    # exact dups always collide in every band; near-dup should too at b=16
    assert (0, 200) in pairs and (1, 201) in pairs
    assert (2, 202) in pairs


def test_minhash_similarity_estimate(spark, docs):
    """Signature agreement rate approximates true shingle Jaccard."""
    rows, df = docs
    sub = df.filter(F.col("doc_id").isin(2, 202))
    sigs = {r["doc_id"]: r["sig"] for r in dedup_op.minhash_signatures(sub, n_perm=64).collect()}
    agree = np.mean([a == b for a, b in zip(sigs[2], sigs[202])])
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in sub.select("doc_id", dedup_op.shingles("text", 5).alias("sh")).collect()
    }
    true_j = len(sh[2] & sh[202]) / len(sh[2] | sh[202])
    assert abs(agree - true_j) < 0.25


def test_simhash_hamming_small_for_neardups(spark, docs):
    rows, df = docs
    sh = dedup_op.simhash64(df.filter(F.col("doc_id").isin(2, 202, 50)))
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(vals[2], vals[202]) < ham(vals[2], vals[50])


def test_ngram_jaccard_verify_stage(spark, docs):
    rows, df = docs
    pairs = spark.createDataFrame([(2, 202), (2, 50)], "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup_op.ngram_jaccard_pairs(df, pairs, threshold=0.0).collect()}
    assert out[(2, 202)] > out[(2, 50)]
    assert out[(2, 202)] > 0.5


def test_simhash_neardup_pairs_exact_vs_bruteforce(spark, docs):
    """Banded multi-index (Manku WWW'07) is EXACT for max_hamming < bands:
    identical pair set + hamming values to the all-pairs brute force."""
    rows, df = docs
    sub = df.filter(F.col("doc_id") % 3 == 0)
    hs = {r["doc_id"]: r["simhash"] & ((1 << 64) - 1) for r in dedup_op.simhash64(sub).collect()}
    ids = sorted(hs)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(hs[a] ^ hs[b]).count("1")
            if h <= 3:
                brute[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup_op.simhash_neardup_pairs(sub, max_hamming=3, bands=4).collect()
    }
    assert got == brute and len(brute) > 0


def test_jaccard_selfjoin_exact_matches_bruteforce(spark, docs):
    """Prefix-filter self-join is LOSSLESS: identical pair set + x1000
    values to the all-pairs brute force, at several thresholds."""
    rows, df = docs
    sub = df.filter(F.col("doc_id") % 5 == 0)
    sh_rows = sub.select("doc_id", dedup_op.shingles("text", 5).alias("sh")).collect()
    sets = {r["doc_id"]: set(r["sh"]) for r in sh_rows}
    ids = sorted(sets)
    sh_df = sub.select("doc_id", dedup_op.shingles("text", 5).alias("sh"))
    # r5: sweep every encoding path — plain lexicographic order,
    # df-ordered strings (provably exact), and df-ordered md5 int ids
    # (the contract path) — all must equal the all-pairs brute force
    modes = [
        dict(df_order=False),
        dict(df_order=True, hash_tokens=False),
        dict(df_order=True, hash_tokens=True),
    ]
    for tx in (100, 300, 700):
        brute = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                jx = inter * 1000 // (len(sets[a]) + len(sets[b]) - inter)
                if jx >= tx:
                    brute[(a, b)] = jx
        for mode in modes:
            got = {
                (r["id_a"], r["id_b"]): r["jacc_x1000"]
                for r in dedup_op.jaccard_selfjoin_exact(sh_df, "doc_id", "sh", tx, **mode).collect()
            }
            assert got == brute, f"threshold {tx} mode {mode}: {len(got)} vs {len(brute)} pairs"


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    n, dim = 300, 16
    vecs = rng.normal(0, 1, (n, dim))
    # planted near-dup of vector 0
    vecs[299] = vecs[0] + rng.normal(0, 0.01, dim)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    df.cache().count()
    return vecs, df


def _np_topk(vecs: np.ndarray, qi: int, k: int):
    sims = vecs @ vecs[qi] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[qi]))
    order = [(-s, i) for i, s in enumerate(sims) if i != qi]
    order.sort()
    return [i for _, i in order[:k]]


def test_bruteforce_topk_matches_numpy(spark, vectors):
    vecs, df = vectors
    q = df.filter(F.col("vec_id").isin(0, 17, 42))
    got = (
        ann_op.cosine_topk_bruteforce(q, df, k=5)
        .orderBy("q_id", "rank")
        .groupBy("q_id")
        .agg(F.collect_list("n_id").alias("ns"))
        .collect()
    )
    for r in got:
        assert r["ns"] == _np_topk(vecs, r["q_id"], 5)


def test_bruteforce_topk_enforces_query_bound(spark, vectors):
    """The exact baseline is O(Q*N) (BroadcastNestedLoopJoin) by design —
    it must REFUSE unbounded query sides rather than silently blow up at
    scale. max_queries=None is the explicit opt-out."""
    import pytest

    _, df = vectors
    with pytest.raises(ValueError, match="O\\(Q\\*N\\)"):
        ann_op.cosine_topk_bruteforce(df, df, k=2, max_queries=100)
    # explicit opt-out still runs (300x300 is fine at test scale)
    assert ann_op.cosine_topk_bruteforce(df.limit(3), df, k=2, max_queries=None).count() == 6


def test_lsh_topk_recall(spark, vectors):
    """Random-hyperplane LSH: must always find the planted near-identical
    vector (cos ~0.9999 -> same bucket w.p. ~1), and beat random recall on
    ordinary top-3 neighbors (random-gaussian neighbors are far — at
    6 bits + 1-bit multiprobe theory gives ~0.5 recall; random would be
    ~ (bucketed candidates)/n ~ 0.1)."""
    vecs, df = vectors
    q = df.filter(F.col("vec_id") < 20)
    got = ann_op.cosine_topk_lsh(q, df, dim=16, k=3, bits=6, multiprobe=1).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["n_id"])
    assert 299 in by_q.get(0, set())  # planted near-dup always recovered
    hits = total = 0
    for qi in range(20):
        true = set(_np_topk(vecs, qi, 3))
        total += 3
        hits += len(true & by_q.get(qi, set()))
    assert hits / total > 0.3


def test_embedding_neardup_finds_planted(spark, vectors):
    vecs, df = vectors
    out = {(r["id_a"], r["id_b"]) for r in ann_op.embedding_neardup_pairs(df, dim=16, threshold=0.99, bits=8).collect()}
    assert (0, 299) in out


def test_ivf_topk_recall(spark, vectors):
    """IVF probes its n_probe nearest lists: planted near-dup always found;
    recall beats the n_probe/n_lists random fraction handily."""
    vecs, df = vectors
    q = df.filter(F.col("vec_id") < 20)
    got = ann_op.cosine_topk_ivf(q, df, dim=16, k=3, n_lists=8, n_probe=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["n_id"])
    assert 299 in by_q.get(0, set())
    hits = total = 0
    for qi in range(20):
        true = set(_np_topk(vecs, qi, 3))
        total += 3
        hits += len(true & by_q.get(qi, set()))
    assert hits / total > 0.55  # 3/8 of lists probed, centroid-directed


def test_ann_zero_norm_vector_does_not_crash(spark):
    """Review r4 (ANSI DIVIDE_BY_ZERO confirmed for doubles): an all-zero
    embedding must not abort the query; it ranks with similarity 0."""
    from water_column_sonar_processing_spark.operators import ann as ann_op

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter("vec_id = 1")
    out = ann_op.cosine_topk_bruteforce(q, emb, k=2).collect()
    got = [(r["n_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [2, 3]  # zero vector present (sim 0), ranked last, no crash


def test_minhash_bands_must_divide_n_perm(spark):
    from water_column_sonar_processing_spark.operators import dedup as dd

    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="divide"):
        dd.minhash_lsh_pairs(df, n_perm=16, bands=32)
    with pytest.raises(ValueError, match="divide"):
        dd.minhash_lsh_pairs(df, n_perm=32, bands=5)


def test_null_text_docs_survive_dedup_corpus(spark):
    """Review r4: NULL-text docs must not collapse to one survivor via
    the constant [NULL]-shingle signature."""
    from water_column_sonar_processing_spark.operators import dedup as dd

    rows = [(1, None), (2, None), (3, None), (4, "real document text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dd.dedup_corpus(df).collect())
    assert kept == [1, 2, 3, 4]  # distinct docs; lacking text is not duplication


def test_ivf_persisted_index_matches_oneshot(spark, vectors, tmp_path):
    """build_ivf_index + query_ivf_index == cosine_topk_ivf exactly (same
    params; centroid doubles round-trip parquet bit-exact), and the
    postings land partitioned by list_id so probed queries prune."""
    vecs, df = vectors
    idx = str(tmp_path / "ivf_idx")
    ann_op.build_ivf_index(df, idx, n_lists=8)
    q = df.filter(F.col("vec_id") < 20)
    via_index = sorted(
        map(tuple, ann_op.query_ivf_index(spark, idx, q, k=3, n_probe=3).collect())
    )
    oneshot = sorted(
        map(tuple, ann_op.cosine_topk_ivf(q, df, dim=16, k=3, n_lists=8, n_probe=3).collect())
    )
    assert via_index == oneshot and len(via_index) > 0
    # physical layout: one partition directory per non-empty list
    import os

    parts = {d for d in os.listdir(f"{idx}/postings") if d.startswith("list_id=")}
    assert len(parts) > 1
    # and the probed query actually PRUNES: the postings scan's partition
    # filters carry a static list_id IN (...) predicate, not a bare
    # isnotnull (a plain equi-join would full-scan all partitions)
    plan = (
        ann_op.query_ivf_index(spark, idx, q, k=3, n_probe=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pf = [seg.split("]")[0] for seg in plan.split("PartitionFilters: [")[1:]]
    assert pf and any("IN (" in seg for seg in pf)


def test_jaccard_bitmap_verify_equals_array_join(spark, docs, monkeypatch):
    """r6 hybrid bitmap verify: the broadcast popcount(AND) path and the
    distributed array_intersect join must return the IDENTICAL pair set
    and jacc_x1000 values (the budget env toggles which path runs)."""
    rows, df = docs
    sh_df = df.select("doc_id", dedup_op.shingles("text", 5).alias("sh"))

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_VERIFY_MB", "0")
    dist = sorted(
        (r["id_a"], r["id_b"], r["jacc_x1000"])
        for r in dedup_op.jaccard_selfjoin_exact(sh_df, "doc_id", "sh", 200).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_VERIFY_MB", "1024")
    local = sorted(
        (r["id_a"], r["id_b"], r["jacc_x1000"])
        for r in dedup_op.jaccard_selfjoin_exact(sh_df, "doc_id", "sh", 200).collect()
    )
    assert dist == local and len(local) > 0


def test_jaccard_all_three_paths_identical(spark, docs, monkeypatch):
    """r6: jaccard_selfjoin_exact has THREE execution paths — the local
    all-pairs bitmap scan (default in budget), the prefix join + local
    bitmap verify (scan disabled), and the fully distributed prefix join
    + array_intersect verify (both disabled). All must return the
    identical (id_a, id_b, jacc_x1000) set at every threshold."""
    rows, df = docs
    sh_df = df.select("doc_id", dedup_op.shingles("text", 5).alias("sh"))
    combos = {
        "scan": {"SPARK_GRAFT_LOCAL_SCAN_MB": "2048", "SPARK_GRAFT_LOCAL_VERIFY_MB": "1024"},
        "prefix+bitmap": {"SPARK_GRAFT_LOCAL_SCAN_MB": "0", "SPARK_GRAFT_LOCAL_VERIFY_MB": "1024"},
        "distributed": {"SPARK_GRAFT_LOCAL_SCAN_MB": "0", "SPARK_GRAFT_LOCAL_VERIFY_MB": "0"},
    }
    for tx in (150, 400, 1000):
        got = {}
        for name, env in combos.items():
            for k, v in env.items():
                monkeypatch.setenv(k, v)
            got[name] = sorted(
                (r["id_a"], r["id_b"], r["jacc_x1000"])
                for r in dedup_op.jaccard_selfjoin_exact(sh_df, "doc_id", "sh", tx).collect()
            )
        assert got["scan"] == got["prefix+bitmap"] == got["distributed"], f"tx={tx}"
        if tx <= 400:
            assert len(got["scan"]) > 0


def test_minhash_bucket_cap_drops_only_overcap_buckets(spark):
    """r6: the cap prefilter (count -> semi-join -> collect survivors)
    must drop every pair of an over-cap bucket and keep small buckets,
    matching the uncapped run restricted to surviving buckets."""
    boiler = [(i, "the same boilerplate template page text repeated verbatim") for i in range(12)]
    family = [(100 + i, "a distinct small family of near identical documents here") for i in range(3)]
    df = spark.createDataFrame(boiler + family, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup_op.minhash_lsh_pairs(df, max_bucket=5).collect()
    }
    # family pairs survive; every boilerplate pair (bucket size 12 > 5) is dropped
    assert capped == {(100, 101), (100, 102), (101, 102)}
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup_op.minhash_lsh_pairs(df, max_bucket=1000).collect()
    }
    assert {(a, b) for a, b in uncapped if a >= 100} <= uncapped
    assert len(uncapped) == 66 + 3  # C(12,2) boilerplate + family
