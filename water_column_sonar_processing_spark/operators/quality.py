"""Repetition-based quality statistics and PII redaction — the
document-hygiene operators a web-scale training corpus runs after
dedup (Rae et al. 2021 "Scaling Language Models" (Gopher) §A1.1
repetition rules; C4's regex scrubbing; public-knowledge re-derivation
as native DataFrame ops — no UDFs anywhere in this module).

Scale shape: every statistic is explode -> partial-agg'd groupBy(doc)
(two shuffles keyed on doc id, both map-side combined); redaction is a
pure projection. Nothing here is quadratic in anything.

Integer x1000 fractions throughout — the same FLOOR-based convention
as functions/text.py, so every stat is bit-stable across engines and
python twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import token_ngrams


def _line_stats_agg(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stats rows for docs with >= 1 non-blank line (the agg core;
    blank-only docs are simply absent). Line edges strip via regex —
    trim() removes ASCII spaces only (the token_ngrams lesson), and the
    class excludes \n (lines were split on it) and \v (Java-vs-RE2)."""
    edge = "\\A[ \t\f\r]+|[ \t\f\r]+\\z"
    lines = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("_raw"))
        .select(F.col(id_col), F.regexp_replace(F.col("_raw"), edge, "").alias("_ln"))
        .filter(F.col("_ln") != "")
    )
    per_line = lines.groupBy(id_col, "_ln").agg(F.count(F.lit(1)).alias("_c"))
    dup = F.col("_c") > 1
    agg = per_line.groupBy(id_col).agg(
        F.sum("_c").alias("n_lines"),
        F.sum(F.when(dup, F.col("_c")).otherwise(F.lit(0))).alias("_dl"),
        F.sum(F.col("_c") * F.length("_ln")).alias("_chars"),
        F.sum(F.when(dup, F.col("_c") * F.length("_ln")).otherwise(F.lit(0))).alias("_dc"),
    )
    return agg.select(
        F.col(id_col),
        F.col("n_lines"),
        F.floor(F.col("_dl") * F.lit(1000) / F.col("n_lines")).cast("long").alias(
            "dup_line_frac_x1000"
        ),
        F.when(F.col("_chars") > 0, F.floor(F.col("_dc") * F.lit(1000) / F.col("_chars")))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_line_char_frac_x1000"),
    )


def duplicate_line_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc duplicate-line statistics (Gopher repetition rule family):

      (id_col, n_lines, dup_line_frac_x1000, dup_line_char_frac_x1000)

    A line is "duplicated" when its exact text occurs >= 2 times in the
    SAME document; every occurrence of such a line counts (Gopher's
    'fraction of lines that are duplicates of other lines'). Lines are
    newline-separated, edge-trimmed on [ \t\f\r]; blank lines are
    ignored. Docs with no non-blank lines report 0 lines and 0
    fractions — restored via ONE left join with coalesce defaults (an
    anti-join union would embed the agg subtree twice in the plan)."""
    stats = _line_stats_agg(df, id_col, text_col)
    z = F.lit(0).cast("long")
    return df.select(F.col(id_col)).join(stats, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_lines"), z).alias("n_lines"),
        F.coalesce(F.col("dup_line_frac_x1000"), z).alias("dup_line_frac_x1000"),
        F.coalesce(F.col("dup_line_char_frac_x1000"), z).alias("dup_line_char_frac_x1000"),
    )


def top_ngram_char_fraction(
    df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc fraction of characters covered by the MOST FREQUENT word
    n-gram (Gopher's top-n-gram rule):

      (id_col, top_gram, top_gram_count, top_gram_char_frac_x1000)

    char coverage = count * length(gram) / length(text), floored x1000
    (an approximation above 1000 is possible for overlapping grams —
    Gopher's own definition has the same property). Deterministic
    tie-break: highest count, then lexicographically smallest gram.
    Docs with fewer than n tokens report (NULL, 0, 0) via the same
    single-agg left-join restoration as duplicate_line_stats."""
    stats = _top_ngram_agg(df, n, id_col, text_col)
    z = F.lit(0).cast("long")
    return df.select(F.col(id_col)).join(stats, id_col, "left").select(
        F.col(id_col),
        F.col("top_gram"),
        F.coalesce(F.col("top_gram_count"), z).alias("top_gram_count"),
        F.coalesce(F.col("top_gram_char_frac_x1000"), z).alias("top_gram_char_frac_x1000"),
    )


def _top_ngram_agg(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """Agg core: rows only for docs with >= n tokens (short docs absent)."""
    grams = df.select(
        F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("_g")
    )
    counts = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    # deterministic argmax: min_by over the (negated count, gram) struct —
    # struct comparison is field-ordered, so this picks highest count,
    # then the lexicographically smallest gram among ties
    best = counts.groupBy(id_col).agg(
        F.min_by(
            F.struct(F.col("_g").alias("g"), F.col("_c").alias("c")),
            F.struct((-F.col("_c")).alias("nc"), F.col("_g").alias("g")),
        ).alias("_b")
    )
    lens = df.select(F.col(id_col), F.length(text_col).alias("_len"))
    return best.join(lens, id_col).select(
        F.col(id_col),
        F.col("_b.g").alias("top_gram"),
        F.col("_b.c").cast("long").alias("top_gram_count"),
        F.when(
            F.col("_len") > 0,
            F.floor(F.col("_b.c") * F.length("_b.g") * F.lit(1000) / F.col("_len")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_gram_char_frac_x1000"),
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line_frac_x1000: int = 300,
    max_dup_line_char_frac_x1000: int = 200,
    top_ngram_n: int = 3,
    max_top_ngram_char_frac_x1000: int = 180,
) -> DataFrame:
    """Docs surviving the Gopher-style repetition thresholds (defaults
    from the paper's §A1.1: 30% duplicate lines, 20% chars in duplicate
    lines, 18% chars in the top 3-gram). Original schema preserved."""
    # agg cores, not the public restored views: docs absent from an agg
    # have zero stats and can never exceed a threshold, so the zero-stat
    # restoration join would be pure plan weight here
    ls = _line_stats_agg(df, id_col, text_col)
    tg = _top_ngram_agg(df, top_ngram_n, id_col, text_col)
    bad = (
        ls.filter(
            (F.col("dup_line_frac_x1000") > max_dup_line_frac_x1000)
            | (F.col("dup_line_char_frac_x1000") > max_dup_line_char_frac_x1000)
        )
        .select(id_col)
        .union(
            tg.filter(F.col("top_gram_char_frac_x1000") > max_top_ngram_char_frac_x1000).select(
                id_col
            )
        )
        .distinct()
    )
    return df.join(bad, id_col, "left_anti")


# C4-style scrubbing: ordered so earlier rewrites cannot fabricate later
# matches' inputs (emails contain dots/digits -> redact before IP/phone)
_PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\+?\d[\d().\-]{6,}\d\b", "[PHONE]"),
)


def redact_pii(text):
    """Column expression: heuristic email/IPv4/phone-run redaction (the
    C4-style regex scrub — deliberately simple, documented patterns; a
    production pipeline tunes the rule list). Pure regexp_replace chain,
    no UDF.

    Known false-positive surface (r5 advisor): the [PHONE] rule matches
    any 8+-char digit/dot/dash/paren run, so ISO dates (2026-08-18),
    dotted version strings, and long numeric IDs are rewritten to
    [PHONE] too. That is the documented C4-style trade — recall over
    precision for a default-on scrub; callers that must preserve
    dates/versions should override _PII_RULES (e.g. require >= 7 actual
    digits, or exclude the \\d{4}-\\d{2}-\\d{2} shape) rather than rely
    on the default."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, token in _PII_RULES:
        col = F.regexp_replace(col, pat, token)
    return col


def redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df with text_col replaced by its redacted form (schema otherwise
    unchanged)."""
    return df.withColumn(text_col, redact_pii(F.col(text_col)))
