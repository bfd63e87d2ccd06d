"""Invariants of the dedup scaling-bench corpus (bench.synth_docs) and of
dedup_corpus run over it.

synth_docs is the input for the north-rule dedup scaling pair
(BENCH/BASELINE.md): half the docs live in 4-member near-dup families
(canonical + 3 perturbed variants), half are singletons. These tests pin
what the generator GUARANTEES (determinism, family text structure) and
what dedup over it guarantees regardless of LSH recall (every family
keeps >=1 survivor, singletons are untouched) — so a scaling measurement
is never silently running on a degenerate corpus.
"""

from __future__ import annotations

import sys
import os

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synth_docs  # noqa: E402

from water_column_sonar_processing_spark.operators import dedup as dedup_op


N = 1600  # 100 full 16-blocks: 200 families of 4, 800 singletons


def _fam(doc_id: int) -> int:
    return doc_id - (doc_id % 4) if doc_id % 16 < 8 else doc_id


def test_synth_docs_deterministic_and_structured(spark):
    a = synth_docs(spark, N).collect()
    b = synth_docs(spark, N).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = {r["doc_id"]: r["text"] for r in a}
    assert len(rows) == N
    # every doc: exactly 80 space-joined words
    assert all(len(t.split(" ")) == 80 for t in rows.values())
    # canonical<->variant word overlap is high but not total; docs from
    # DIFFERENT families share (almost) nothing
    fam0 = [rows[i] for i in range(4)]
    canon = fam0[0].split(" ")
    for v in fam0[1:]:
        same = sum(1 for x, y in zip(canon, v.split(" ")) if x == y)
        assert 66 <= same <= 79, same  # ~6% perturbation, never identical-by-construction
    other = rows[16].split(" ")
    cross = len(set(canon) & set(other))
    assert cross < 20  # hash collisions only


def test_dedup_corpus_on_synth_docs_invariants(spark):
    docs = synth_docs(spark, N)
    kept = [r["doc_id"] for r in dedup_op.dedup_corpus(docs, "doc_id", "text").collect()]
    kept_set = set(kept)
    assert len(kept) == len(kept_set)
    singles = {i for i in range(N) if i % 16 >= 8}
    # singletons never collide with anything: all survive
    assert singles <= kept_set
    # every family keeps at least its minimum member; no family is wiped out
    fams = {}
    for i in range(N):
        if i % 16 < 8:
            fams.setdefault(_fam(i), []).append(i)
    for fam, members in fams.items():
        survivors = [m for m in members if m in kept_set]
        assert survivors, f"family {fam} wiped out"
        assert min(survivors) == fam  # keep-min-id policy
    # the corpus must actually be deduplicatable: a large share of the
    # 3*200 variant docs collapse (LSH recall at J~0.8 is ~0.98/pair and
    # CC closes variant<->variant transitively through the canonical)
    removed = N - len(kept)
    assert removed >= 400, removed  # >= 2/3 of the 600 variants
