"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization round needs).

Usage:
  python bench_extra.py [query ...]            # time queries (best-of-2, noop)
  PLAN_TAG=before python bench_extra.py ...    # also dump explain("formatted")
                                               # to plans/r06/<q>_<tag>.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.
Protocol matches bench.py: lazy queries constructed once then forced with a
noop write (best-of-2); eager queries (dedup_corpus) constructed inside the
timed closure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame

from water_column_sonar_processing_spark.plans import queries as q
from water_column_sonar_processing_spark.session import get_spark

EAGER = {"dedup_corpus"}

DEFAULT = [
    "knn_join",
    "dedup_corpus",
    "ann_cosine_topk",
    "minhash_lsh_pairs",
    "text_metrics",
    "extract_roundtrip",
]


def force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plan_tag = os.environ.get("PLAN_TAG")
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("wcsp-bench-extra", cores=cpus, shuffle_partitions=max(cpus, 16))
    queries = q.build_queries()
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r06-profile: {name}")
        if plan_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = queries[name](spark, sf_dir)
            with open(f"plans/r06/{name}_{plan_tag}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if name in EAGER:
            shot = lambda n=name: force(queries[n](spark, sf_dir))
        else:
            df = queries[name](spark, sf_dir)
            shot = lambda d=df: force(d)
        timings[name] = min(timed(shot), timed(shot))
        print(f"  {name}: {timings[name]}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
