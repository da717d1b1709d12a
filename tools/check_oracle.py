"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` DuckDB twin on
the same parquet tables, then compares row count, column names, pandas
dtypes, and an order-insensitive value hash. Both sides are fetched as
pandas DataFrames (Spark ``toPandas()``, DuckDB ``.df()``) to mirror the
driver's canonicalizer — this is what catches the int64-vs-float64 dtype
drift class (DuckDB SUM(BIGINT) -> HUGEINT -> float64 while Spark stays
int64), which Python-object ``collect()`` comparison cannot see. Usage:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from datetime import date, datetime, time as dtime

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_MIDNIGHT = dtime(0, 0, 0)


def canon(v):
    """Render a pandas/numpy cell value to the canonical string form.

    Mirrors the driver's pandas-level canonicalization: numpy scalars
    render as their Python equivalents, floats via repr (so int64 662
    -> "662" but float64 662.0 -> "662.0" — the drift we must detect),
    midnight timestamps as bare dates (Spark DATE columns arrive as
    ``datetime.date`` objects while DuckDB DATE arrives as midnight
    ``datetime64`` — both sides normalize to the same rendering).
    """
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, datetime):
        if v.time() == _MIDNIGHT and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):
        d = v.asDict()
        return "{" + ",".join(f"{k}:{canon(d[k])}" for k in sorted(d)) + "}"
    # Decimal and anything else numeric-ish that supports float()
    tname = type(v).__name__
    if tname == "Decimal":
        return repr(float(v))
    s = str(v)
    if s in ("NaT",):
        return "NULL"
    return s


def pdf_lines(pdf):
    """Sorted canonical row renderings of a pandas DataFrame (columns
    sorted by name, to mirror the driver's compare)."""
    cols = sorted(pdf.columns)
    arr = pdf[cols].to_numpy(dtype=object)
    return sorted("|".join(canon(x) for x in row) for row in arr)


def value_hash(lines):
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def spark_kind(dt) -> str | None:
    """Numeric 'kind' of a Spark schema type: 'i' integral, 'f' float.

    Decimal/date/string/etc. return None (no drift hazard — decimals
    canonicalize via float on both sides already)."""
    name = type(dt).__name__
    if name in ("ByteType", "ShortType", "IntegerType", "LongType"):
        return "i"
    if name in ("FloatType", "DoubleType"):
        return "f"
    return None


def dtype_kind(dtype) -> str | None:
    if dtype.kind in ("i", "u"):
        return "i"
    if dtype.kind == "f":
        return "f"
    return None


def dtype_drift(sdf_schema, spdf, dpdf):
    """Columns where Spark's *declared* type is integral but the oracle
    canonicalizes as float64 (or vice versa). Uses the declared Spark
    type, not the pandas one, so runtime NULLs (which flip Spark's
    toPandas to float64 too) cannot mask the hazard."""
    problems = []
    dk = {c: dtype_kind(dpdf[c].dtype) for c in dpdf.columns}
    for field in sdf_schema.fields:
        sk = spark_kind(field.dataType)
        ok = dk.get(field.name)
        if sk and ok and sk != ok:
            problems.append(
                f"dtype drift {field.name}: spark={field.dataType.simpleString()}"
                f" oracle-pandas={dpdf[field.name].dtype}"
            )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from erpl_web_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    from erpl_web_spark.suite import duckdb_parquet_src

    for t in TABLES:
        src = duckdb_parquet_src(f"{args.sf}/{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    names = args.names or sorted(qs)
    failures = []
    from erpl_web_spark.operators import release_tracked

    for name in names:
        release_tracked()  # drop the previous query's internal caches
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(dpdf)}")
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
            )
        else:
            problems.extend(dtype_drift(sdf.schema, spdf, dpdf))
            so, do = pdf_lines(spdf), pdf_lines(dpdf)
            if value_hash(so) != value_hash(do):
                problems.append("value-hash mismatch")
                for a, b in zip(so, do):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"ok    {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
