"""Test-set decontamination: flag/remove training documents that share
any token n-gram with a held-out evaluation set.

The standard LLM training-data hygiene operator (the GPT-3 appendix-C
13-gram overlap filter; The Pile and PaLM data cards describe the same
shape): any training document sharing at least one n-gram with an eval
benchmark is flagged — and usually dropped — so benchmark scores measure
generalization rather than memorization. Reference analog: the
dirty-data exclusion stances in
/root/reference/water_column_sonar_processing/processing/raw_to_zarr.py:230-272
(rows failing a validity predicate are removed before the store is
published); here the predicate is cross-corpus membership instead of a
per-row bound.

Scale shape (the 100-TB story): eval benchmarks are tiny next to the
training corpus (10^3..10^7 grams vs 10^12 docs), so the distinct
eval-gram table BROADCASTS — the train side is a single map-side pass
(per-doc array_distinct before explode, then a broadcast inner join;
no shuffle of the exploded train grams), and only matched (doc, gram)
hits — rare by construction — reach the per-doc aggregation shuffle.
With broadcast_eval=False the same plan degrades to a shuffle equi-join
on the gram for eval sets too large to broadcast. hashed=True joins on
xxhash64(gram) instead of the gram string, cutting broadcast/shuffle
bytes several-fold; a collision can only ever ADD a flag, at ~2^-64
per gram pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined n-grams over whitespace tokens.

    Empty/blank/short (< n tokens) texts yield an empty array — NOT a
    descending F.sequence (sequence(1, k) with k < 1 counts DOWN in
    Spark, which would fabricate grams).

    Edge whitespace is stripped with a regex, not trim(): both Spark's
    and DuckDB's trim() remove ASCII SPACES only, so a trailing tab
    would survive and split() would emit a phantom empty token (caught
    by the hypothesis property test). \\v is excluded from the class:
    Java \\s includes it but RE2's does not, and the oracle must match.
    Anchors are \\A/\\z, NOT ^/$: Java's $ also matches BEFORE a final
    line terminator (U+0085/U+2028/U+2029) while RE2's $ is end-of-text
    only — 'a \\u2028' tokenized differently across engines with $
    (caught by review; the fixed-point test pins these inputs)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    clean = F.regexp_replace(text, "\\A[ \t\n\f\r]+|[ \t\n\f\r]+\\z", "")
    toks = F.split(clean, r"[ \t\n\f\r]+")
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        (clean != "") & (k >= 1),
        F.transform(F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def _gram_rows(df: DataFrame, id_col: str, text_col: str, n: int, hashed: bool) -> DataFrame:
    """(id, gram) rows, deduped PER DOC map-side (array_distinct before
    the explode — no shuffle; a corpus-wide distinct would shuffle every
    train gram)."""
    rows = df.select(
        F.col(id_col), F.explode(F.array_distinct(token_ngrams(F.col(text_col), n))).alias("_g")
    )
    if hashed:
        rows = rows.select(id_col, F.xxhash64("_g").alias("_g"))
    return rows


def eval_gram_table(
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hashed: bool = False,
) -> DataFrame:
    """(_g, _eid): every distinct eval n-gram with the smallest eval-doc
    id containing it — the static side of every decontamination join.

    Callers running MANY joins against the same eval set (streaming
    micro-batches, per-shard batch sweeps) should materialize this once
    (`.localCheckpoint()`) and pass it as `eval_grams`; otherwise the
    eval tokenize/explode/agg re-executes per join."""
    return _gram_rows(eval_df, id_col, text_col, n, hashed).groupBy("_g").agg(
        F.min(F.col(id_col)).alias("_eid")
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hashed: bool = False,
    broadcast_eval: bool = True,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-train-doc contamination report against a held-out eval set.

    Returns one row per CONTAMINATED training doc:
      (id_col, n_shared, first_eval_id)
    where n_shared counts the doc's distinct n-grams that appear anywhere
    in the eval set and first_eval_id is the smallest eval-doc id sharing
    any gram (deterministic evidence pointer). Clean docs are absent.

    Plan: eval grams -> groupBy(gram).min(eval_id) (tiny) -> broadcast
    inner join against the map-side train gram stream -> partial-agg'd
    groupBy(train id). No all-pairs anywhere. Pass a pre-built
    `eval_grams` (see eval_gram_table) to amortize the eval side across
    repeated calls; `eval_df` may then be None. The gram-key TYPE is
    validated against `hashed` (a hashed=True table joined under
    hashed=False would cast-coerce to NULLs and silently report every
    doc clean); matching `n` remains the caller's responsibility."""
    if eval_grams is not None:
        g_type = dict(eval_grams.dtypes).get("_g")
        want = "bigint" if hashed else "string"
        if g_type != want:
            raise ValueError(
                f"eval_grams._g is {g_type} but hashed={hashed} needs {want} — "
                "was the table built with a different hashed flag?"
            )
        ev = eval_grams
    elif eval_df is not None:
        ev = eval_gram_table(eval_df, id_col, text_col, n, hashed)
    else:
        raise ValueError("one of eval_df or eval_grams is required")
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = _gram_rows(train, id_col, text_col, n, hashed)
    return (
        tr.join(ev, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min("_eid").alias("first_eval_id"),
        )
    )


def decontaminated(
    train: DataFrame,
    eval_df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hashed: bool = False,
    broadcast_eval: bool = True,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """The train subset that survives decontamination (original schema).

    left_anti against the contaminated-id set — the same keep-shape as
    dedup_corpus's final stage, so the two compose into one hygiene
    pipeline (dedup -> decontaminate) without re-materializing.
    `eval_grams` (see eval_gram_table) amortizes the eval side across
    repeated calls, as in ngram_decontaminate."""
    flagged = ngram_decontaminate(
        train, eval_df, id_col, text_col, n, hashed, broadcast_eval, eval_grams
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")
