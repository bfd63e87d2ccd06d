"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent on partitioning (a repartition changes
which rows survive), which makes corpus snapshots unreproducible. These
operators sample by CONTENT hash instead: the same row always makes the
same decision, on any cluster layout, at any scale — the property a
100-TB corpus refresh needs so that yesterday's 1% eval slice is the
same documents tomorrow.

All decisions are native expressions (xxhash64 + integer compare / rank),
whole-stage-codegen friendly; the only shuffle is the per-stratum window
in stratified_sample (partial-agg'd by the window key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# granularity of the keep-threshold: fraction resolves to 1e-6
_SCALE = 1_000_000


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Keep ~`fraction` of rows, decided per row by content hash.

    Deterministic and layout-independent: keep iff
    pmod(xxhash64(key, seed'), 1e6) < fraction*1e6. Different seeds give
    independent samples; the SAME seed gives nested samples (a 1% sample
    is a subset of the 10% sample — handy for eval-slice laddering)."""
    assert 0.0 <= fraction <= 1.0
    thresh = int(round(fraction * _SCALE))
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_SCALE))
    return df.filter(bucket < F.lit(thresh))


def split_train_holdout(
    df: DataFrame, holdout_fraction: float, key_col: str = "doc_id", seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, holdout) split by the same hash rule —
    the leakage-safe way to carve an eval set out of a training corpus
    (near-dups of a holdout doc should be removed separately via
    dedup_corpus; this guarantees the EXACT doc never appears in both)."""
    thresh = int(round(holdout_fraction * _SCALE))
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_SCALE))
    return df.filter(bucket >= F.lit(thresh)), df.filter(bucket < F.lit(thresh))


def stratified_sample(
    df: DataFrame, strata_col: str, n_per_stratum: int, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, deterministically.

    Rank rows inside each stratum by (hash, key) — the hash makes the
    pick pseudo-random, the key tie-break makes it total — and keep the
    first n. One shuffle on the stratum key; at 100 TB a hot stratum is
    bounded by the window's per-partition sort, not a collect."""
    w = Window.partitionBy(strata_col).orderBy(
        F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_SCALE)).asc(), F.col(key_col).asc()
    )
    return df.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= n_per_stratum).drop("_rk")
