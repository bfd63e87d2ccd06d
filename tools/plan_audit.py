"""Physical-plan audit: verifies the plans we claim, on the real queries.

Checks (printed per query):
- PushedFilters / ReadSchema on parquet scans (predicate pushdown + column
  pruning actually reached the scan)
- BroadcastHashJoin present where we broadcast (PIP cover, offsets join)
- no CartesianProduct anywhere
- WholeStageCodegen spans exist (native-expr hot paths)
- number of Exchange (shuffle) nodes — the shuffle budget

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from water_column_sonar_processing_spark.session import get_spark  # noqa: E402


def audit(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    jvm = df.sparkSession._jvm
    formatted = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return {
        "query": name,
        "exchanges": len(re.findall(r"Exchange ", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "cartesian": "CartesianProduct" in plan,
        "bnl_joins": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_evals": len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)[:2],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", cores=4, shuffle_partitions=8)
    qs = entrymod.queries()
    names = sys.argv[2:] or [
        "grid_cells",
        "pip_join",
        "knn_grid",
        "tile_pyramid",
        "prefix_offsets",
        "asof_join",
        "track_speed",
        "minhash_lsh_pairs",
        "ann_cosine_topk",
        "s2_cells",
    ]
    for name in names:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # let AQE finalize
        info = audit(name, df)
        print(info)
    spark.stop()


if __name__ == "__main__":
    main()
