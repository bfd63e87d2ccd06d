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
            srows, stags = arrow_rows(sdf.toArrow())
        except Exception as ex:
            print(f"[SPARK-FAIL] {name}: {str(ex)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            dat = con.execute(oracles[name]).fetch_arrow_table()
            dcols = dat.column_names
            drows, dtags = arrow_rows(dat)
        except Exception as ex:
            print(f"[DUCK-FAIL] {name}: {str(ex)[:300]}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        cols = sorted(scols)
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
