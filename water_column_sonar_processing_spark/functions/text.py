"""Text-analysis functions for the webtext pipeline — all native Spark
expressions (JVM, codegen), each with a DuckDB-SQL twin for the
correctness oracle.

These are the training-data-pipeline ops layered on the graft input
(documents table): token counting, quality scoring, language ID,
document fingerprinting. Designed integer/string-exact so the oracle
hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def token_count_sql(text: str) -> str:
    return (
        f"(CASE WHEN TRIM({text}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(TRIM({text}), '\\s+')) END)"
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count of word/number/punct runs."""
    arr = F.regexp_extract_all(text, F.lit(r"(\w+|[^\w\s])"), 1)
    return F.size(arr).cast("long")


def word_token_count_sql(text: str) -> str:
    return f"len(regexp_extract_all({text}, '(\\w+|[^\\w\\s])', 1))"


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio_x1000(text: Column) -> Column:
    """Punctuation chars per 1000 chars (FLOOR'd integer — exact across
    engines; explicit floor because Spark casts double->long by truncation
    while DuckDB CAST rounds)."""
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(F.length(text) > 0, F.floor(n_punct * F.lit(1000) / F.length(text))).otherwise(
        F.lit(0)
    ).cast("long")


def punct_ratio_x1000_sql(text: str) -> str:
    n_punct = f"(len({text}) - len(regexp_replace({text}, '[^\\w\\s]', '', 'g')))"
    return f"(CASE WHEN len({text}) > 0 THEN CAST(FLOOR({n_punct} * 1000 / len({text})) AS BIGINT) ELSE 0 END)"


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of marker-word occurrences for one language (word-boundary).

    ONE alternation regex per language instead of a scan per marker word
    (r5: the per-word form cost ~4x once lang_id joined the text_metrics
    contract scan). Value-identical: markers are distinct whole words, so
    non-overlapping alternation matches = the sum of per-word counts."""
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 1)).cast("long")


def stopword_hits_sql(text: str, lang: str) -> str:
    pat = "\\b(" + "|".join(LANG_MARKERS[lang]) + ")\\b"
    return f"len(regexp_extract_all(lower({text}), '{pat}', 1))"


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-hit counts, 'und' if all 0.

    Deterministic tie-break by fixed language order (en, es, de, fr) —
    array_position returns the FIRST index of the max, which is exactly
    first-max-wins in that order.

    Shape matters: a nested CASE chain duplicates every score expression
    (each is 5 regexp_extract_all calls) exponentially across branches —
    janino aborts codegen with 'Code grows beyond 64 KB' and the whole
    stage falls back to interpreted mode. The array/argmax form references
    each score once, keeping the projection inside whole-stage codegen."""
    langs = list(LANG_MARKERS)
    scores = F.array(*[stopword_hits(text, lg) for lg in langs])
    mx = F.array_max(scores)
    pick = F.element_at(
        F.array(*[F.lit(lg) for lg in langs]), F.array_position(scores, mx).cast("int")
    )
    return F.when(mx > 0, pick).otherwise(F.lit("und"))


def lang_id_sql(text: str) -> str:
    exprs = {lg: stopword_hits_sql(text, lg) for lg in LANG_MARKERS}
    best_lang, best_score = "'und'", "CAST(0 AS BIGINT)"
    for lg in reversed(list(LANG_MARKERS)):
        sc = exprs[lg]
        best_lang = f"(CASE WHEN {sc} >= {best_score} THEN '{lg}' ELSE {best_lang} END)"
        best_score = f"(CASE WHEN {sc} >= {best_score} THEN CAST({sc} AS BIGINT) ELSE {best_score} END)"
    return f"(CASE WHEN {best_score} > 0 THEN {best_lang} ELSE 'und' END)"


def quality_score_x1000(text: Column) -> Column:
    """Integer quality score in [0, 1000]:
    + length component (capped at 500 chars -> up to 400)
    + word-diversity proxy: tokens per 100 chars banded (up to 300)
    - punctuation penalty (punct ratio above 100/1000 costs up to 300)
    All integer arithmetic — bit-exact on the oracle."""
    L = F.length(text).cast("long")
    len_comp = F.floor(F.least(L, F.lit(500)) * F.lit(400) / F.lit(500)).cast("long")
    toks = token_count(text)
    tok_per100 = F.when(L > 0, F.floor(toks * F.lit(100) / L)).otherwise(F.lit(0)).cast("long")
    div_comp = F.least(tok_per100 * F.lit(15), F.lit(300))
    pr = punct_ratio_x1000(text)
    punct_pen = F.least(F.greatest(pr - F.lit(100), F.lit(0)) * F.lit(3), F.lit(300))
    score = (len_comp + div_comp.cast("long") - punct_pen.cast("long")).cast("long")
    # NULL text scores 0, not 400: least() SKIPS NULL operands, so the
    # NULL length would otherwise max out the length component while the
    # other components default to 0 — letting empty docs outrank real
    # ones (r4 review; the SQL twin guards identically)
    return F.when(text.isNull(), F.lit(0).cast("long")).otherwise(score)


def quality_score_x1000_sql(text: str) -> str:
    L = f"CAST(len({text}) AS BIGINT)"
    len_comp = f"CAST(FLOOR(LEAST({L}, 500) * 400 / 500) AS BIGINT)"
    toks = token_count_sql(text)
    tok_per100 = f"(CASE WHEN {L} > 0 THEN CAST(FLOOR({toks} * 100 / {L}) AS BIGINT) ELSE 0 END)"
    div_comp = f"CAST(LEAST({tok_per100} * 15, 300) AS BIGINT)"
    pr = punct_ratio_x1000_sql(text)
    punct_pen = f"CAST(LEAST(GREATEST({pr} - 100, 0) * 3, 300) AS BIGINT)"
    return (
        f"(CASE WHEN {text} IS NULL THEN CAST(0 AS BIGINT) "
        f"ELSE ({len_comp} + {div_comp} - {punct_pen}) END)"
    )


FINGERPRINT_P = 1_000_000_007
FINGERPRINT_A = 2_654_435_761


FINGERPRINT_HEAD = 64  # chars of the document head that feed the hash


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling-hash fingerprint of the document head,
    bit-exact across engines:

        fp = (len(text) * 1315423911
              + sum_{i=1..64} ascii(char_i) * ((i * A) % P)) % 2^61

    Position-dependent weights make it order-sensitive; the 64-term sum is
    unrolled into native integer expressions (whole-stage codegen — no
    lambda/UDF), with the identical unrolled form on the DuckDB side."""
    h = F.length(text).cast("long") * F.lit(1315423911)
    for i in range(1, FINGERPRINT_HEAD + 1):
        w = (i * FINGERPRINT_A) % FINGERPRINT_P
        c = F.when(F.length(text) >= i, F.ascii(F.substring(text, i, 1))).otherwise(F.lit(0))
        h = h + c.cast("long") * F.lit(w)
    return F.pmod(h, F.lit(1 << 61))


def fingerprint_sql(text: str) -> str:
    terms = [f"CAST(len({text}) AS BIGINT) * 1315423911"]
    for i in range(1, FINGERPRINT_HEAD + 1):
        w = (i * FINGERPRINT_A) % FINGERPRINT_P
        terms.append(
            f"CAST((CASE WHEN len({text}) >= {i} THEN ascii(substring({text}, {i}, 1)) ELSE 0 END) AS BIGINT) * {w}"
        )
    total = " + ".join(terms)
    m = 1 << 61
    return f"((({total}) % {m}) + {m}) % {m}"
