"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()``/``oracle_sql()``
expose the oracle-checked suite from ``erpl_web_spark.suite`` (SURVEY.md
§2.F relational surface + driver-mandated pipeline operators). Queries
with ``oracle=None`` are genuinely non-SQL-expressible (seeded-hash LSH
banding) and get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from erpl_web_spark.session import apply_engine_conf  # noqa: E402
from erpl_web_spark.suite import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    apply_engine_conf(spark)
    q = all_queries()["q01_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                apply_engine_conf(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(q.fn)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
