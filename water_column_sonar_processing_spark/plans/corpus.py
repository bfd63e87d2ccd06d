"""Composed training-corpus preparation pipeline — the LLM-data analog of
plans/pipeline.py's geospatial L0->L1->L2 chain. One call takes a raw
documents table to packed training sequences, each stage an
already-tested operator:

    annotate   lang-ID, quality score, token count (native exprs)
    filter     language allowlist + quality floor + length band
               (+ optional Gopher repetition rules, operators/quality.py)
    dedup      exact md5 + MinHash-LSH + Jaccard verify + connected
               components -> one survivor per near-dup cluster
    decontam   (optional) drop docs sharing any token n-gram with a
               held-out eval set (broadcast eval-gram anti pass)
    split      leakage-safe content-hash train/holdout carve
    pack       concat-then-chunk sequence assignment per split

Everything stays a lazy DataFrame program until the caller writes; the
only eager work is dedup's bounded CC loop. Returns the per-stage frames
so callers can materialize intermediates (at 100 TB you write the
deduped corpus once and iterate on splits/packing downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as textf
from ..operators.decontam import decontaminated
from ..operators.dedup import dedup_corpus
from ..operators.quality import repetition_filter
from ..operators.packing import chunk_pack
from ..operators.sampling import split_train_holdout


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] | None = None,
    min_quality_x1000: int = 300,
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    holdout_fraction: float = 0.01,
    seq_budget: int = 4096,
    split_seed: int = 0,
    eval_df: DataFrame | None = None,
    decontam_n: int = 13,
    repetition: bool = False,
) -> dict[str, DataFrame]:
    """Raw documents -> {'annotated', 'filtered', 'deduped',
    ['decontaminated' if eval_df,] 'train', 'holdout', 'packed_train',
    'packed_holdout'}. `eval_df` is the held-out benchmark table
    (id_col/text_col schema); when given, docs sharing any
    `decontam_n`-gram with it are dropped between dedup and split.
    repetition=True additionally applies the Gopher repetition filter
    (duplicate-line + top-n-gram thresholds) to the filtered set before
    dedup."""
    annotated = docs.withColumns(
        {
            "lang_pred": textf.lang_id(F.col(text_col)),
            "quality_x1000": textf.quality_score_x1000(F.col(text_col)),
            "n_tokens": textf.token_count(F.col(text_col)),
        }
    )
    cond = (
        (F.col("quality_x1000") >= min_quality_x1000)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )
    if langs is not None:
        cond = cond & F.col("lang_pred").isin(*langs)
    filtered = annotated.filter(cond)
    if repetition:
        filtered = repetition_filter(filtered, id_col, text_col)

    deduped = dedup_corpus(filtered, id_col=id_col, text_col=text_col)
    clean = deduped
    extra = {}
    if eval_df is not None:
        clean = decontaminated(deduped, eval_df, id_col, text_col, n=decontam_n)
        extra["decontaminated"] = clean
    train, holdout = split_train_holdout(
        clean, holdout_fraction, key_col=id_col, seed=split_seed
    )
    return {
        "annotated": annotated,
        "filtered": filtered,
        "deduped": deduped,
        **extra,
        "train": train,
        "holdout": holdout,
        "packed_train": chunk_pack(train, "n_tokens", id_col, seq_budget),
        "packed_holdout": chunk_pack(holdout, "n_tokens", id_col, seq_budget),
    }
