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
    lcols = [c for c in left.columns if c not in value_cols]
    l_tag = left.select(*lcols).withColumn("_is_left", F.lit(1)).withColumn(
        "_vals", F.lit(None).cast(f"struct<{', '.join(f'{v}: {right.schema[v].dataType.simpleString()}' for v in value_cols)}>")
    )
    r_tag = right.select(
        *([by] if by else []),
        ts_col,
        F.struct(*value_cols).alias("_vals"),
    ).withColumn("_is_left", F.lit(0))
    for c in lcols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        (Window.partitionBy(by) if by else Window.partitionBy())
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
        rpdf = pdf[pdf["_side"] == 1][[ts_col, *value_cols]].sort_values(ts_col, kind="mergesort")
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in fields])
        merged = pd.merge_asof(lpdf, rpdf, on=ts_col, direction="backward")
        return merged[[f.name for f in fields]]

    return tagged.groupBy(by).applyInPandas(_merge, schema=schema)
