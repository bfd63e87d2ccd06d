"""Gopher-style repetition stats + C4-style PII redaction vs independent
python twins (operators/quality.py)."""

from __future__ import annotations

import re
from collections import Counter

from water_column_sonar_processing_spark.operators import quality as Q

# the engines' exact whitespace model (NOT python .strip()/.split(),
# which use unicode whitespace incl. \v — see cross-engine notes in
# operators/decontam.py): line edges trim [ \t\f\r]; tokens split on
# [ \t\n\f\r]+ after \A/\z edge strip
_LINE_WS = " \t\f\r"
_TOK_WS = " \t\n\f\r"


def _toks(text: str) -> list[str]:
    t = text.strip(_TOK_WS)
    return re.split(f"[{re.escape(_TOK_WS)}]+", t) if t else []


def _py_line_stats(text: str):
    lines = [ln.strip(_LINE_WS) for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    if not lines:
        return (0, 0, 0)
    c = Counter(lines)
    dup_lines = sum(n for n in c.values() if n > 1)
    chars = sum(len(ln) for ln in lines)
    dup_chars = sum(len(ln) * n for ln, n in c.items() if n > 1)
    return (
        len(lines),
        dup_lines * 1000 // len(lines),
        dup_chars * 1000 // chars if chars else 0,
    )


def _py_top_ngram(text: str, n: int):
    toks = _toks(text)
    if len(toks) < n:
        return (None, 0, 0)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    c = Counter(grams)
    top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    frac = top[1] * len(top[0]) * 1000 // len(text) if text else 0
    return (top[0], top[1], frac)


DOCS = [
    (0, "alpha beta\nalpha beta\ngamma delta\nalpha beta"),  # dup lines
    (1, "spam spam spam spam spam eggs"),  # dominant 3-gram
    # clean AND long enough that its once-occurring top 3-gram covers
    # <18% of the chars (the Gopher thresholds target web-length docs)
    (2, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    (3, ""),  # empty
    (4, "\n\n  \n"),  # only blank lines
    (5, "x y"),  # fewer than 3 tokens
    (6, "foo\n\tfoo \nfoo"),  # tab-indented + trailing-space lines dedupe
    (7, "a\r\nb\r\nb"),  # CRLF: the \r must not keep lines distinct
]


def test_duplicate_line_stats_matches_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["dup_line_frac_x1000"], r["dup_line_char_frac_x1000"])
        for r in Q.duplicate_line_stats(df).collect()
    }
    assert got == {i: _py_line_stats(t) for i, t in DOCS}


def test_top_ngram_char_fraction_matches_python(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["top_gram"], r["top_gram_count"], r["top_gram_char_frac_x1000"])
        for r in Q.top_ngram_char_fraction(df, 3).collect()
    }
    assert got == {i: _py_top_ngram(t, 3) for i, t in DOCS}


def test_repetition_filter_drops_the_repetitive(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = {r["doc_id"] for r in Q.repetition_filter(df).collect()}
    assert 0 not in kept  # 3/4 duplicate lines
    assert 1 not in kept  # 'spam spam spam' dominates
    assert 2 in kept and 5 in kept  # clean docs pass


def test_redact_pii_fixed_points(spark):
    rows = [
        (0, "mail me at alice.smith+x@example.co.uk today"),
        (1, "server at 192.168.1.10 is down"),
        (2, "call +1(555)123-4567 now"),
        (3, "nothing sensitive here 12 34"),
        (4, "a@b.io and 10.0.0.1 and +44-20-7946-0958"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in Q.redacted(df).collect()}
    assert got[0] == "mail me at [EMAIL] today"
    assert got[1] == "server at [IP] is down"
    assert got[2] == "call [PHONE] now"
    assert got[3] == "nothing sensitive here 12 34"
    assert got[4] == "[EMAIL] and [IP] and [PHONE]"


def test_redaction_is_idempotent(spark):
    rows = [(0, "a@b.io 10.0.0.1 +1555123456 end")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = Q.redacted(df)
    twice = Q.redacted(once)
    assert once.collect() == twice.collect()
