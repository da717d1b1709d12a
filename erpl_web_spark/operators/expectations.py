"""Declarative data-quality expectations — the validation gate a
pipeline runs before publishing a batch (the Deequ/Great-Expectations
shape, engine-native): row-level predicates, table-level aggregate
invariants, and referential integrity, each reported as a
(check_name, n_rows, n_failed, passed) row.

Scale shape: ALL row-level checks evaluate in ONE pass over the table
(one aggregate of conditional sums — adding a check adds a column to
the agg, not a scan); uniqueness rides the same aggregate via
count vs count_distinct; referential integrity is one left-anti join
per (child, parent) pair, broadcast when the parent's key side is
dimension-sized. Nothing corpus-scale reaches the driver — the report
is checks-many rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    row_checks: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One-pass expectations report over ``df``.

    ``row_checks``: name -> boolean Column that must hold on every row
    (NULL counts as a failure — an unknown is not a pass).
    ``unique_keys``: name -> key column list that must be duplicate-free
    (n_failed = n_rows - n_distinct).
    Returns one row per check: (check_name, n_rows, n_failed, passed 0/1).
    """
    row_checks = row_checks or {}
    unique_keys = unique_keys or {}
    if not row_checks and not unique_keys:
        raise ValueError("quality_report needs at least one check")
    aggs = [F.count("*").cast("long").alias("__n")]
    for name, cond in row_checks.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0))
            .cast("long")
            .alias(f"__f_{name}")
        )
    for name, keys in unique_keys.items():
        aggs.append(
            (F.count("*") - F.count_distinct(*[F.col(k) for k in keys]))
            .cast("long")
            .alias(f"__f_{name}")
        )
    one = df.agg(*aggs)
    names = list(row_checks) + list(unique_keys)
    stack = ", ".join(f"'{n}', __f_{n}" for n in names)
    return one.selectExpr(
        f"stack({len(names)}, {stack}) AS (check_name, n_failed)", "__n AS n_rows"
    ).select(
        "check_name",
        "n_rows",
        "n_failed",
        (F.col("n_failed") == 0).cast("int").alias("passed"),
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    keys: list[str],
    check_name: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity check: every non-NULL child key tuple must
    exist in ``parent``. One left-anti join on the keys (parent side
    reduced to distinct keys and broadcast by default — dimension
    tables; pass False for fact-sized parents). Same report schema as
    :func:`quality_report`, union them for one gate."""
    nn = child
    for k in keys:
        nn = nn.where(F.col(k).isNotNull())
    pk = parent.select(*keys).distinct()
    if broadcast_parent:
        pk = F.broadcast(pk)
    orphans = nn.join(pk, keys, "left_anti")
    return (
        nn.agg(
            F.count("*").cast("long").alias("n_rows"),
        )
        .crossJoin(orphans.agg(F.count("*").cast("long").alias("n_failed")))
        .select(
            F.lit(check_name).alias("check_name"),
            "n_rows",
            "n_failed",
            (F.col("n_failed") == 0).cast("int").alias("passed"),
        )
    )
