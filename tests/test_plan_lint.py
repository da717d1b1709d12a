"""Whole-suite physical-plan lint: structural scale-killers must never
appear in ANY suite query's plan — not just the hand-audited ones in
PLANS.md. A CartesianProduct is the one plan node with no scale story
(broadcast nested-loop against a bounded side is fine and distinct)."""

import pytest

from erpl_web_spark.suite import all_queries

SF = "/root/testdata/sf0.001"


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_cartesian_product(spark, name):
    """One formatted-plan pass per suite query, two structural bans:
    CartesianProduct (no scale story) and scalar BatchEvalPython
    (row-at-a-time Python UDF — the 10-100x-slower path; Arrow-
    vectorized MapInPandas / ArrowEvalPython remain allowed, and
    BatchEvalPythonUDTF is the deliberate Python-UDTF surface whose
    codegen twin chunk_tokens_native is byte-identical). This pins the
    'zero per-row Python UDFs' claim structurally rather than by code
    review."""
    import re

    q = all_queries()[name]
    if name.startswith("odata_"):
        pytest.skip("needs the loopback OData fixture service")
    df = q.fn(spark, SF)
    plan = _formatted(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan), (
        f"{name} plans a row-at-a-time Python UDF"
    )
