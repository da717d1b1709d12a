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
    over rows whose key tuple is fully non-NULL (NULL keys cannot be
    compared for uniqueness, matching ``referential_report``'s NULL
    exemption; check them with a completeness row check).
    Returns one row per check: (check_name, n_rows, n_failed, passed
    0/1). An EMPTY input passes every check with n_failed = 0 — the
    publish gate must not three-value an empty batch. Check names are
    carried as typed literals (never spliced into SQL), so any string
    is a valid name; a name used in both dicts raises.
    """
    row_checks = row_checks or {}
    unique_keys = unique_keys or {}
    if not row_checks and not unique_keys:
        raise ValueError("quality_report needs at least one check")
    dup = set(row_checks) & set(unique_keys)
    if dup:
        raise ValueError(f"check names used in both dicts: {sorted(dup)}")
    # positional aliases: check names never appear in SQL identifiers
    aggs = [F.count("*").cast("long").alias("__n")]
    names = list(row_checks) + list(unique_keys)
    for i, cond in enumerate(row_checks.values()):
        aggs.append(
            F.coalesce(
                F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"__f{i}")
        )
    for j, keys in enumerate(unique_keys.values()):
        nn = None
        for k in keys:
            c = F.col(k).isNotNull()
            nn = c if nn is None else nn & c
        aggs.append(
            (
                F.coalesce(F.sum(nn.cast("int")), F.lit(0))
                - F.count_distinct(*[F.col(k) for k in keys])
            )
            .cast("long")
            .alias(f"__f{len(row_checks) + j}")
        )
    one = df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("check_name"),
                    F.col(f"__f{i}").alias("n_failed"),
                )
                for i, n in enumerate(names)
            ]
        )
    ).alias("__c")
    return one.select(pairs, F.col("__n").alias("n_rows")).select(
        F.col("__c.check_name").alias("check_name"),
        "n_rows",
        F.col("__c.n_failed").alias("n_failed"),
        (F.col("__c.n_failed") == 0).cast("int").alias("passed"),
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
