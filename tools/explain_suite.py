"""Dump formatted physical plans for suite queries.

Usage:
    python tools/explain_suite.py [--sf DIR] [names...]   # default: headline set

Prints each query's `.explain("formatted")` output, plus a one-line scan
summary (PushedFilters / ReadSchema) — the artifacts that show predicate
pushdown, column pruning, broadcast joins, partial aggregation, and
WindowGroupLimit top-k pruning are actually in the executed plan.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from erpl_web_spark.session import get_spark
    from erpl_web_spark.suite import all_queries

    spark = get_spark("explain-suite")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = args.names or [n for n, q in sorted(qs.items()) if q.headline]

    for name in names:
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        df = qs[name].fn(spark, args.sf)
        df._jdf.queryExecution().debug()  # touch to force planning
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


if __name__ == "__main__":
    main()
