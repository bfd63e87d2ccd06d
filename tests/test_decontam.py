"""Test-set decontamination (operators/decontam.py) vs an independent
Python brute-force oracle, plus edge cases and the scale-plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from water_column_sonar_processing_spark.operators import decontam as D


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = text.strip().split()
    if not text.strip() or len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_decontaminate(train: list[tuple], evals: list[tuple], n: int) -> dict[int, tuple]:
    ev_grams: dict[str, int] = {}
    for eid, text in evals:
        for g in _py_ngrams(text, n):
            ev_grams[g] = min(ev_grams.get(g, eid), eid)
    out = {}
    for tid, text in train:
        hits = [ev_grams[g] for g in _py_ngrams(text, n) if g in ev_grams]
        if hits:
            out[tid] = (len(hits), min(hits))
    return out


def _corpus(k: int = 120) -> tuple[list[tuple], list[tuple]]:
    """Deterministic synthetic docs over a small vocab so n-gram overlap
    actually occurs; includes blank, whitespace-only and short docs."""
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = []
    for i in range(k):
        toks = [vocab[(i * 7 + j * 3) % len(vocab)] for j in range(5 + (i % 9))]
        docs.append((i, " ".join(toks)))
    docs.append((k, ""))  # blank
    docs.append((k + 1, "   "))  # whitespace only
    docs.append((k + 2, "alpha beta"))  # shorter than n
    evals = [d for d in docs if d[0] % 10 == 0]
    train = [d for d in docs if d[0] % 10 != 0]
    return train, evals


@pytest.mark.parametrize("n", [3, 4, 6])
def test_decontaminate_matches_bruteforce(spark, n):
    train, evals = _corpus()
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    edf = spark.createDataFrame(evals, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_shared"], r["first_eval_id"])
        for r in D.ngram_decontaminate(tdf, edf, n=n).collect()
    }
    assert got == _py_decontaminate(train, evals, n)


def test_hashed_path_matches_string_path(spark):
    train, evals = _corpus()
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    edf = spark.createDataFrame(evals, ["doc_id", "text"])
    plain = sorted(D.ngram_decontaminate(tdf, edf, n=4).collect())
    hashed = sorted(D.ngram_decontaminate(tdf, edf, n=4, hashed=True).collect())
    assert plain == hashed  # xxhash64 collisions ~impossible at this size


def test_decontaminated_survivors_partition_train(spark):
    train, evals = _corpus()
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    edf = spark.createDataFrame(evals, ["doc_id", "text"])
    flagged = set(_py_decontaminate(train, evals, 4))
    kept = {r["doc_id"] for r in D.decontaminated(tdf, edf, n=4).collect()}
    assert kept == {tid for tid, _ in train} - flagged
    assert kept and flagged  # both sides non-trivial


def test_short_and_blank_docs_produce_no_grams(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a b"), (4, None), (5, "a b c d")], ["doc_id", "text"]
    )
    rows = df.select(
        "doc_id", F.size(D.token_ngrams(F.col("text"), 3)).alias("k")
    ).collect()
    assert {r["doc_id"]: r["k"] for r in rows} == {1: 0, 2: 0, 3: 0, 4: 0, 5: 2}


def test_ngram_rejects_bad_n():
    with pytest.raises(ValueError):
        D.token_ngrams(F.lit("a b c"), 0)


def test_eval_side_broadcasts(spark):
    """The 100-TB plan shape: the eval-gram table must reach the join as a
    broadcast (map-side train pass, no shuffle of exploded train grams)."""
    train, evals = _corpus()
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    edf = spark.createDataFrame(evals, ["doc_id", "text"])
    plan = D.ngram_decontaminate(tdf, edf, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---- property tests (hypothesis): the DuckDB oracle's n-gram fragment
# reproduces the python semantics for arbitrary token lists and spacing
# (duck stands in for Spark here, same as test_property_cells.py — the
# Spark==duck direction is pinned by the parity gate and the fixed-point
# tests above).

import duckdb
from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
# \v excluded by design: Java \s includes it, RE2's does not — the
# operator's explicit [ \t\n\f\r] class is the cross-engine common set
_sep = st.sampled_from([" ", "  ", "\t", " \t ", "\n", "\f", "\r"])
_WS = " \t\n\f\r"


@given(st.lists(st.tuples(_word, _sep), min_size=0, max_size=12), st.integers(2, 5))
@settings(max_examples=200, deadline=None)
def test_duck_ngram_fragment_property(pairs, n):
    text = "".join(w + s for w, s in pairs)
    clean_sql = f"regexp_replace('{text}', '^[ \t\n\f\r]+|[ \t\n\f\r]+$', '', 'g')"
    sql = f"""
    WITH toks AS (SELECT regexp_split_to_array({clean_sql}, '[ \t\n\f\r]+') AS t
                  WHERE {clean_sql} <> '')
    SELECT list_transform(range(1, len(t) - {n} + 2),
                          i -> array_to_string(t[i:i+{n - 1}], ' ')) FROM toks
    """
    rows = duckdb.sql(sql).fetchall()
    got = list(rows[0][0]) if rows else []
    toks = text.strip(_WS).split() if text.strip(_WS) else []
    exp = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    assert got == exp


def test_empty_eval_set_flags_nothing(spark):
    train, _ = _corpus()
    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    edf = spark.createDataFrame([], "doc_id long, text string")
    assert D.ngram_decontaminate(tdf, edf, n=4).count() == 0
    assert D.decontaminated(tdf, edf, n=4).count() == len(train)


def test_unicode_line_terminator_parity_fixed_points(spark):
    """Java's $ matches before a final U+0085/U+2028/U+2029; RE2's does
    not — the \\A/\\z anchors must make Spark and DuckDB tokenize these
    identically (review-confirmed divergence with ^/$)."""
    nasty = [
        (1, "a \u2028"),   # trailing space BEFORE a final LINE SEPARATOR
        (2, "a \u0085"),   # ... before NEL
        (3, "a \u2029"),   # ... before PARAGRAPH SEPARATOR
        (4, "a\u00a0b c"), # NBSP is NOT a separator in either engine
        (5, "\u2028 a b"), # leading separator char + space
    ]
    sdf = spark.createDataFrame(nasty, ["doc_id", "text"])
    spark_grams = {
        r["doc_id"]: list(r["g"])
        for r in sdf.select("doc_id", D.token_ngrams(F.col("text"), 2).alias("g")).collect()
    }
    ws = " \t\n\f\r"
    clean = f"regexp_replace(text, '\\A[{ws}]+|[{ws}]+\\z', '', 'g')"
    rows = duckdb.sql(
        "WITH d AS (SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in nasty)
        + ") v(doc_id, text)), toks AS ("
        f"SELECT doc_id, regexp_split_to_array({clean}, '[{ws}]+') AS t "
        f"FROM d WHERE {clean} <> '') "
        "SELECT doc_id, list_transform(range(1, len(t) - 2 + 2), "
        "i -> array_to_string(t[i:i+1], ' ')) AS g FROM toks"
    ).fetchall()
    duck_grams = {doc_id: list(g) for doc_id, g in rows}
    assert spark_grams == duck_grams
