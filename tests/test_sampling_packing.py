"""Deterministic sampling + sequence packing vs pure-python twins."""

from __future__ import annotations

import pyspark.sql.functions as F

from water_column_sonar_processing_spark.operators.packing import chunk_pack, greedy_pack
from water_column_sonar_processing_spark.operators.sampling import (
    hash_sample,
    split_train_holdout,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        ((F.col("id") * 37) % 900 + 100).alias("n_tokens"),
    )


def test_hash_sample_fraction_and_determinism(spark):
    df = _docs(spark)
    s1 = hash_sample(df, 0.2, seed=5)
    n = s1.count()
    assert abs(n - 400) < 80  # ~20% +- noise
    # layout-independent: a repartition picks the SAME rows
    ids_a = {r["doc_id"] for r in s1.collect()}
    ids_b = {r["doc_id"] for r in hash_sample(df.repartition(13), 0.2, seed=5).collect()}
    assert ids_a == ids_b


def test_hash_sample_nesting(spark):
    df = _docs(spark)
    small = {r["doc_id"] for r in hash_sample(df, 0.05, seed=1).collect()}
    big = {r["doc_id"] for r in hash_sample(df, 0.25, seed=1).collect()}
    assert small <= big


def test_split_train_holdout_partitions_exactly(spark):
    df = _docs(spark)
    train, hold = split_train_holdout(df, 0.1, seed=3)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == 2000


def test_stratified_sample_exact_per_stratum(spark):
    df = _docs(spark)
    out = stratified_sample(df, "host", 25)
    per = {r["host"]: r["n"] for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {f"h{i}" for i in range(7)}
    assert all(v == 25 for v in per.values())
    # deterministic across layouts
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df.repartition(17), "host", 25).collect())
    assert a == b


def test_stratified_sample_small_stratum_keeps_all(spark):
    df = _docs(spark, n=10)  # strata h0..h6, sizes 1-2
    out = stratified_sample(df, "host", 5)
    assert out.count() == 10


def test_chunk_pack_matches_prefix_sum_twin(spark):
    df = _docs(spark, n=500)
    out = chunk_pack(df, budget=4096, by="host").collect()
    rows = sorted(((r["host"], r["doc_id"], r["n_tokens"], r["stream_off"], r["seq_id"], r["seq_off"]) for r in out))
    # twin: per-host exclusive prefix sum in doc_id order
    by_host: dict[str, list] = {}
    for h, d, t, *_ in rows:
        by_host.setdefault(h, []).append((d, t))
    want = {}
    for h, docs in by_host.items():
        acc = 0
        for d, t in sorted(docs):
            want[(h, d)] = (acc, acc // 4096, acc % 4096)
            acc += t
    for h, d, t, so, sid, soff in rows:
        assert (so, sid, soff) == want[(h, d)]


def test_greedy_pack_respects_budget_and_order(spark):
    df = _docs(spark, n=500)
    out = greedy_pack(df, budget=1024, by="host").collect()
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r["host"], []).append((r["doc_id"], r["n_tokens"], r["seq_id"], r["seq_off"]))
    for h, rows in by_host.items():
        rows.sort()
        # twin: first-fit-next in doc_id order
        cur, fill = 0, 0
        for d, t, sid, soff in rows:
            if fill > 0 and fill + t > 1024:
                cur += 1
                fill = 0
            assert (sid, soff) == (cur, fill), (h, d)
            fill += t
        # no sequence (except oversize singletons) exceeds the budget
        fills: dict[int, int] = {}
        for d, t, sid, _ in rows:
            fills[sid] = fills.get(sid, 0) + t
        for sid, total in fills.items():
            members = [t for _, t, s, _ in rows if s == sid]
            assert total <= 1024 or len(members) == 1


def test_greedy_pack_oversize_doc_gets_own_sequence(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 100)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: (r["seq_id"], r["seq_off"]) for r in greedy_pack(df, budget=1024).collect()}
    assert out == {1: (0, 0), 2: (1, 0), 3: (2, 0)}


def test_greedy_pack_preserves_group_dtype(spark):
    """ADVICE r3: the `by` column keeps its input type (it used to come
    back coerced to string via the pinned Arrow schema)."""
    df = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 200), (7, 3, 300)], "bucket long, doc_id long, n_tokens long"
    )
    out = greedy_pack(df, budget=1024, by="bucket")
    assert dict(out.dtypes)["bucket"] == "bigint"
    assert sorted((r["bucket"], r["doc_id"]) for r in out.collect()) == [(0, 1), (0, 2), (7, 3)]
