"""Exact two-phase top-k per key — the skew-proof version of
`row_number().over(partitionBy(key).orderBy(...)) <= k`.

The window form shuffles EVERY row of every key to one reducer per key
and sorts there: a hot key (one host with 10^9 pages) serializes on a
single task. The classic fix is partial top-k before the shuffle —
Catalyst has no partial mode for window ranks, so phase 1 runs per-
partition bounded heaps in mapInPandas (Arrow-batched; memory =
keys_in_partition x k entries) and phase 2 finalizes with the ordinary
window over at most num_partitions x k rows per key.

EXACT, not approximate: a row in the global top-k of its key is in the
top-k of whatever partition holds it, so phase 1 never drops a winner.
Determinism needs a TOTAL order — ties in the order column are broken
by the id column in BOTH phases (same rule as the oracle query).

Ordering is DESCENDING on order_col ("largest k"); negate the column
for smallest-k.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int,
    id_col: str,
) -> DataFrame:
    """(input columns) + rank, rank 1..k per key by (order_col DESC,
    id_col ASC). Output column set/order: df.columns + ['rank'].

    NULL keys — and NaN keys, for floating key columns — BYPASS the
    pandas phase 1 and go straight to the phase-2 window: the
    Arrow<->pandas interchange renders SQL NULL and float NaN as the
    same NaN, which would merge two groups Spark's window keeps
    distinct (letting the k-row prune drop one group's winners) and
    would rewrite NaN key values to NULL in the output. Bypassing keeps
    both groups exact and byte-faithful; the cost — those two groups
    shuffle unreduced — only matters if NULL/NaN is itself a hot key,
    which QC upstream should have culled."""
    cols = df.columns
    schema = df.schema
    funky = F.col(key_col).isNull()
    if dict(df.dtypes).get(key_col) in ("float", "double"):
        funky = funky | F.isnan(F.col(key_col))
    clean = df.filter(~funky)

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-key accumulator across ALL batches of this partition;
        # the head(k) keeps it bounded at k rows per key seen here
        acc: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(key_col, sort=False):
                prev = acc.get(key)
                both = pd.concat([prev, grp]) if prev is not None else grp
                # total order: order DESC, id ASC — stable against ties
                both = both.sort_values(
                    [order_col, id_col], ascending=[False, True], kind="mergesort"
                ).head(k)
                acc[key] = both
        if acc:
            yield pd.concat(acc.values())[cols]

    reduced = clean.mapInPandas(partial_topk, schema).unionByName(df.filter(funky))
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
    )


def topk_per_key_window(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int,
    id_col: str,
) -> DataFrame:
    """The single-window formulation — the oracle twin (identical result,
    full shuffle). Use it when keys are known small."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= F.lit(k))
