"""Interval (range-containment) join: point t joins every interval with
start <= t < end — "which maintenance window / session / cruise leg does
this event fall into".

Spark expresses this as a theta join (`ON t >= start AND t < end`) which
the planner can only run as BroadcastNestedLoop or Cartesian — O(P*I)
and the one plan shape this engine bans. The scale path is the standard
bucketization: pick a bucket width, explode each interval over the
buckets it overlaps, bucket each point once, equi-join on the bucket id
and re-check containment exactly. Cost is O(P + I * avg_span/width +
true_matches) — proportional to real overlap, not the cross product.

Width trades explode fan-out (long intervals -> many buckets) against
per-bucket candidate count (wide buckets -> more false candidates); pick
~ the median interval length. `suggest_bucket_width` computes that in
one tiny aggregation. Very long intervals (calendar-scale windows over
microsecond points) should be split upstream or joined via a broadcast
dimension instead — the explode count per interval is ceil(span/width)+1
and is the caller's lever.

Semantics are half-open [start, end) — the convention that makes
adjacent windows partition time with no double-match. Deterministic:
output = every (point, interval) pair with containment, no ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_bucket_width(intervals: DataFrame, start_col: str = "start", end_col: str = "end") -> int:
    """Median interval span (>=1) — a sane default bucket width.

    COST NOTE (r4 verdict minor #4): this is one Spark action
    (percentile_approx + first). interval_join(bucket_width=None) calls
    it per invocation — fine for a one-shot join, noisy in a loop. For
    repeated joins against the same interval table, call this once and
    pass the result as bucket_width explicitly (the width only needs to
    be the right order of magnitude; a stale value stays correct)."""
    row = intervals.select(
        F.percentile_approx(F.col(end_col) - F.col(start_col), 0.5).alias("m")
    ).first()
    return max(int(row["m"] or 1), 1)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """points x intervals where start <= ts < end, as a bucketized
    equi-join (no BNL/Cartesian at any size).

    how='inner' keeps matched pairs; how='left' also keeps unmatched
    points with NULL interval columns (the enrichment shape). Column
    name collisions between the two inputs are the caller's to resolve
    (standard Spark join hygiene)."""
    assert how in ("inner", "left")
    if bucket_width is None:
        bucket_width = suggest_bucket_width(intervals, start_col, end_col)
    w = int(bucket_width)

    # interval -> one row per overlapped bucket: floor(start/w) .. floor((end-1)/w)
    # (end exclusive: an interval never owns the bucket that starts at end)
    last_b = F.floor((F.col(end_col) - F.lit(1)) / F.lit(w)).cast("long")
    first_b = F.floor(F.col(start_col) / F.lit(w)).cast("long")
    iv = (
        intervals.filter(F.col(start_col) < F.col(end_col))
        .withColumn("_b", F.explode(F.sequence(first_b, last_b)))
    )
    # Surrogate row id so the how='left' anti-join below is NULL-safe:
    # comparing point COLUMNS with plain equality would re-emit any matched
    # point whose attributes contain NULL (NULL = NULL is not true), i.e.
    # a QC-nulled row would appear both matched and NULL-extended.
    pid = "_iv_pid"
    pt = points.withColumn(pid, F.monotonically_increasing_id()).withColumn(
        "_b", F.floor(F.col(ts_col) / F.lit(w)).cast("long")
    )
    if how == "left":
        # the id is only stable if both uses of `pt` (matched side and
        # anti side) see the SAME row->id assignment; a nondeterministic
        # upstream (shuffle fetch order) could re-assign ids between the
        # two subtree evaluations, duplicating or dropping rows. Pin the
        # assignment by materializing once (how='inner' never reuses pt,
        # so it stays fully lazy).
        pt = pt.localCheckpoint(eager=True)

    matched = (
        pt.join(iv, "_b")
        .filter((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_b")
    )
    if how == "inner":
        return matched.drop(pid)
    # left: points with no containing interval come back NULL-extended.
    # (a point in several intervals matches several times, so the anti
    # side is the matched POINT-id set, not row-wise)
    unmatched = pt.drop("_b").join(matched.select(pid).distinct(), pid, "left_anti")
    return matched.drop(pid).unionByName(unmatched.drop(pid), allowMissingColumns=True)
