#!/usr/bin/env python
"""Vacuity audit: find suite-query output columns the test data never
exercises.

The round-8 `regex_funcs` lesson: a query can stay value-hash green for
rounds while one of its columns is CONSTANT on the test corpus (every
``n_numbers`` was 0 because no document contained a digit), hiding a
crash-on-real-data bug behind a vacuously-passing check. This tool runs
every ``queries()`` entry at a scale factor and reports columns with at
most one distinct value (plus empty results), so vacuous coverage is a
reviewed, deliberate state instead of an accident.

A constant column is not automatically a bug — pivots with one-sided
fills, boolean gates on clean corpora, and planted-duplicate preambles
legitimately produce constants — but each one should be LOOKED AT once.

Usage: python tools/vacuity_audit.py [--sf /root/testdata/sf0.01] [names...]
Emits one JSON line per query: {"query", "rows", "constant_cols": {col:
value}} — only for queries that have at least one constant column.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entrymod
    from erpl_web_spark.operators import release_tracked
    from erpl_web_spark.session import get_spark

    spark = get_spark("vacuity-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.names or sorted(qs)

    flagged = 0
    for name in names:
        release_tracked()
        try:
            df = qs[name](spark, args.sf)
            # one aggregation pass: row count + per-column distinct
            # (complex types via their JSON rendering)
            aggs = [F.count(F.lit(1)).alias("__n")]
            for f in df.schema.fields:
                c = (
                    F.to_json(F.col(f.name))
                    if isinstance(f.dataType, (ArrayType, MapType, StructType))
                    else F.col(f.name)
                )
                aggs.append(F.countDistinct(c).alias(f"d_{f.name}"))
                aggs.append(F.first(c, ignorenulls=False).alias(f"v_{f.name}"))
            row = df.agg(*aggs).first()
        except Exception as e:  # noqa: BLE001 — audit must keep going
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            flagged += 1
            continue
        const = {
            f.name: str(row[f"v_{f.name}"])[:80]
            for f in df.schema.fields
            if row[f"d_{f.name}"] <= 1
        }
        if row["__n"] == 0 or const:
            print(
                json.dumps(
                    {"query": name, "rows": row["__n"], "constant_cols": const}
                )
            )
            flagged += 1
    print(f"# {flagged}/{len(names)} queries flagged", file=sys.stderr)


if __name__ == "__main__":
    main()
