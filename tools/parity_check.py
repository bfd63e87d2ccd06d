"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf dir, compare
row count, column names, and order-insensitive value hash.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from water_column_sonar_processing_spark.plans.queries import SF_TABLES  # noqa: E402
from water_column_sonar_processing_spark.session import get_spark  # noqa: E402


def norm_cell(v) -> str:
    """Python-TYPE-faithful cell normalization. Round 1's local gate used
    str(v), which renders a DuckDB HUGEINT/decimal128 (arrives as
    decimal.Decimal) identically to a Spark BIGINT (arrives as int) — so the
    gate stayed green while the driver's value hash failed (VERDICT.md
    'What's wrong' #1). Distinguish by Python object type, like repr() does:
    Decimal != int != float != bool. Arrow integer widths (int32 vs int64)
    both surface as Python int and intentionally compare equal — the driver
    accepted row_number int32 vs BIGINT in r01."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def value_hash(rows, cols) -> str:
    lines = sorted(",".join(norm_cell(r[c]) for c in cols) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def arrow_rows(at):
    """(rows-as-dicts, {col: arrow type tag}) from a pyarrow Table."""
    tags = {f.name: str(f.type).lower() for f in at.schema}
    rows = at.to_pylist()
    return rows, tags


def _all_int_no_null(at) -> bool:
    import pyarrow.types as pt

    return all(pt.is_integer(f.type) for f in at.schema) and all(
        at.column(i).null_count == 0 for i in range(at.num_columns)
    )


def fast_int_compare(sat, dat, cols):
    """Vectorized multiset equality for all-integer null-free tables
    (r5: the 17M-row ngram_jaccard sf1 result made the per-row python
    render path a >25-minute job; numpy lexsort + column equality is
    seconds). Widths are normalized to int64, mirroring norm_cell's
    int32==int64 semantics. Returns (equal, spark_hash, duck_hash)."""
    import numpy as np

    def mat(at):
        arrs = [at.column(c).to_numpy(zero_copy_only=False).astype(np.int64) for c in cols]
        order = np.lexsort(arrs[::-1])
        return [a[order] for a in arrs]

    sa, da = mat(sat), mat(dat)
    hs = hashlib.sha256(b"".join(x.tobytes() for x in sa)).hexdigest()[:16]
    hd = hashlib.sha256(b"".join(y.tobytes() for y in da)).hexdigest()[:16]
    return hs == hd, hs, hd


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in SF_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # golden-backed oracles are pinned to the driver's sf tier (sf0.01);
    # when checking another tier locally, retarget them if a golden exists
    from water_column_sonar_processing_spark.plans.queries import (
        GOLDEN_DIR,
        GOLDEN_QUERIES,
        golden_oracle_sql,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    for gq in GOLDEN_QUERIES:
        if os.path.isdir(os.path.join(GOLDEN_DIR, tag)):
            oracles[gq] = golden_oracle_sql(gq, tag)
        else:
            oracles.pop(gq, None)  # no golden for this tier -> rows-only
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sat = sdf.toArrow()
        except Exception as ex:
            print(f"[SPARK-FAIL] {name}: {str(ex)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {sat.num_rows} rows, cols={scols}")
            continue
        try:
            dat = con.execute(oracles[name]).fetch_arrow_table()
            dcols = dat.column_names
        except Exception as ex:
            print(f"[DUCK-FAIL] {name}: {str(ex)[:300]}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = sat.num_rows == dat.num_rows
        cols = sorted(scols)
        if ok_cols and _all_int_no_null(sat) and _all_int_no_null(dat):
            # taken regardless of ok_count: a count mismatch on a huge
            # result must not fall back to the 25-minute python render
            # just to report a failure the counts already decided
            ok_hash, sh, dh = fast_int_compare(sat, dat, cols)
            status = "OK" if (ok_count and ok_hash) else "MISMATCH"
            print(
                f"[{status}] {name}: rows {sat.num_rows}/{dat.num_rows} cols_ok=True "
                f"hash {sh}/{dh} (vectorized int path)"
            )
            if status != "OK":
                failures.append(name)
            continue
        try:
            srows, stags = arrow_rows(sat)
            drows, dtags = arrow_rows(dat)
        except Exception as ex:
            # keep per-query isolation: an unrenderable column type must
            # not abort the remaining parity sweep (r5 review)
            print(f"[RENDER-FAIL] {name}: {str(ex)[:300]}")
            failures.append(name)
            continue
        sh = value_hash(srows, cols) if ok_cols else "-"
        dh = value_hash(drows, cols) if ok_cols else "-"
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        print(
            f"[{status}] {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols} hash {sh}/{dh}"
        )
        if status != "OK":
            failures.append(name)
            if ok_cols and stags != dtags:
                diff = {c: (stags[c], dtags[c]) for c in cols if stags[c] != dtags[c]}
                print("   type diff (spark, duck):", diff)
            if ok_cols:
                sset = {",".join(norm_cell(r[c]) for c in cols) for r in srows}
                dset = {",".join(norm_cell(r[c]) for c in cols) for r in drows}
                for x in list(sorted(sset - dset))[:5]:
                    print("   spark-only:", x[:160])
                for x in list(sorted(dset - sset))[:5]:
                    print("   duck-only: ", x[:160])
            else:
                print("   spark cols:", scols, " duck cols:", dcols)
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
