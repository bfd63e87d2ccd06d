"""Skew handling: salted repartition / salted joins for hot cells.

Reference analog: dense ping regions / hot cruises — the reference
serializes per-file so skew only inflates wall-clock
(cruise/resample_regrid.py:62-78 batches by max-depth to bound the working
set); at Spark scale a hot cell key (dense coastal/urban tile) lands an
entire shuffle partition on one task. The north rule mandates explicit
salting on cell-id prefix.

Pattern: the BIG side appends salt = pmod(hash(stable_id), S); the SMALL
side explodes xS. The join key becomes (key, salt) — a hot key's rows
spread over S tasks. AQE skew-join (enabled in session.py) is the runtime
backstop; salting is the declarative fix when the hot keys are known.

For aggregations (counts/sums) salting is NOT needed: Catalyst's partial
aggregation already combines map-side, so each mapper emits one row per
key regardless of row skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, salt_buckets: int, stable_col: str, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, S): pmod(xxhash64(stable_col), S).

    Uses xxhash64 (stable across Spark versions/sessions) of a stable id —
    NOT rand() — so retries and resumed runs land rows in identical
    buckets (determinism anchor, SURVEY.md §7.4)."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.col(stable_col)), F.lit(salt_buckets)).cast("int"))


def explode_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Small-side complement: replicate every row for each salt bucket."""
    return df.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    stable_col: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt appended to the key; spreads hot keys over
    salt_buckets tasks.

    stable_col is REQUIRED and must vary WITHIN a join-key group (a
    row-unique id like url) — salting by the join key itself would give
    every row of a hot key the same salt, leaving the skew untouched
    while still paying the small-side replication.

    how is restricted to inner/left flavors: the small side is EXPLODED
    salt_buckets times, so right/full outer would return salt_buckets
    identical null-padded copies of every unmatched small-side row
    (r4 review)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: the "
            "exploded small side would duplicate unmatched rows under "
            "right/full outer semantics"
        )
    if stable_col in on:
        raise ValueError(
            "stable_col must differ from the join keys: a per-key-constant "
            "salt cannot spread a hot key"
        )
    b = add_salt(big, salt_buckets, stable_col)
    s = explode_salt(small, salt_buckets)
    return b.join(s, on + ["_salt"], how).drop("_salt")
