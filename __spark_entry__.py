"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: derived pages -> QC -> cell encode ->
                two-phase PIP join (the engine's benchmark kernel).
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL per query (engineered bit-identical;
                see water_column_sonar_processing_spark/plans/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from water_column_sonar_processing_spark.plans import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: spatial PIP assignment."""
    return q._spark_pip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.build_queries()


def oracle_sql() -> dict[str, str]:
    return q.build_oracles()
