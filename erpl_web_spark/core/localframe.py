"""Driver-local rows -> DataFrame without the pickled-RDD execution path.

``spark.createDataFrame(list, schema)`` parallelizes the rows into
defaultParallelism pickle partitions, so every downstream action forks
one Python worker PER PARTITION just to unpickle a handful of rows —
measured 2.8 s per action for a 12-row frame on this runtime (32
concurrent worker forks, guide §4 fork tax), paid again by every bench
rep of every collect-then-rebuild query. Routing the same rows through
a pandas DataFrame + Arrow lands them as a JVM-side relation: identical
rows and schema, zero Python workers at execution (measured 0.13 s).

Exactness guards — fall back to the classic path whenever the Arrow
conversion could diverge: NaN doubles (Arrow's from_pandas reads NaN as
null — the one measured value divergence), empty row sets (pandas loses
the column count), and nested cells (list/tuple/dict under dtype=object).
dtype=object preserves int64 exactly (no float64 widening), None stays
null, naive datetimes stay NTZ — pinned by tests/test_local_rows.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def local_rows(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a DataFrame from driver-local ``rows`` with the DDL
    ``schema`` — value-identical to ``spark.createDataFrame(rows,
    schema)``, but executed as a JVM local relation (no Python workers)
    whenever the rows are flat, NaN-free scalars."""

    def _safe(v) -> bool:
        if isinstance(v, float) and math.isnan(v):
            return False
        return not isinstance(v, (list, tuple, dict, set))

    if not rows or not all(_safe(v) for r in rows for v in r):
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame([tuple(r) for r in rows], dtype=object)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        # The fast path is an optimization, never a dependency: any
        # pandas/Arrow conversion surprise falls back to the classic
        # (value-defining) path.
        return spark.createDataFrame(rows, schema)
