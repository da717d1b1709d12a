"""Meta-tests for the local correctness gate (tools/check_oracle.py):
the gate must DETECT drift, not just pass green things. A gate that
cannot fail is not a gate."""

import sys

import pandas as pd

sys.path.insert(0, ".")

from tools.check_oracle import dtype_drift, pdf_lines, value_hash  # noqa: E402


def _hash(pdf):
    return value_hash(pdf_lines(pdf))


def test_gate_detects_value_drift():
    a = pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]})
    b = pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.000001]})
    assert _hash(a) != _hash(b)


def test_gate_is_order_insensitive():
    a = pd.DataFrame({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    b = pd.DataFrame({"v": ["z", "x", "y"], "k": [3, 1, 2]})  # rows AND cols scrambled
    assert _hash(a) == _hash(b)


def test_gate_detects_int_float_dtype_drift(spark):
    """The r2 driver-red class: Spark int64 vs oracle float64 rendering
    (662 vs 662.0). The gate's dtype check must flag it."""
    sdf = spark.createDataFrame([(1, 662)], "k long, total long")
    spdf = sdf.toPandas()
    dpdf = pd.DataFrame({"k": [1], "total": [662.0]})  # DuckDB HUGEINT->float64
    drift = dtype_drift(sdf.schema, spdf, dpdf)
    assert drift, "int-vs-float dtype drift must be reported"
    # and the value hashes differ too (662 vs 662.0 render differently)
    assert _hash(spdf) != _hash(dpdf)


def test_gate_accepts_equal_frames(spark):
    sdf = spark.createDataFrame([(1, 1.5), (2, 2.5)], "k long, v double")
    spdf = sdf.toPandas()
    dpdf = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    assert not dtype_drift(sdf.schema, spdf, dpdf)
    assert _hash(spdf) == _hash(dpdf)
