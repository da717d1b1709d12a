"""Spark Data Source filters -> OData ``$filter`` expression strings.

Reproduces the reference's translation table and skip rules
(odata_predicate_pushdown_helper.cpp:528-876; SURVEY.md §2.C):
- comparisons ``= <> < <= > >=`` -> ``eq ne lt le gt ge`` (:763-786);
- strings single-quoted; v2 escapes ``'`` by doubling (:792-810);
- numerics bare (:811-817); booleans lowercase (:818-822);
- IS NULL -> ``col eq null``, IS NOT NULL -> ``col ne null`` (:705-709);
- multiple pushed filters joined with ``and`` (:584-591);
- skip rules: empty-string comparisons (:747-751) and values longer than
  1000 chars (:754-757) are NOT pushed — they are reported back to Spark
  as unsupported so Spark re-applies them (residual evaluation, the same
  belt-and-suspenders the reference gets from its host).

The Python Data Source API hands us a list of implicitly-ANDed
``pyspark.sql.datasource.Filter`` objects; ``pushFilters`` must return
the unsupported remainder.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql.datasource import (
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

_MAX_VALUE_LEN = 1000

_OPS = {
    EqualTo: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "ge",
    LessThan: "lt",
    LessThanOrEqual: "le",
}
_NEGATED_OPS = {
    EqualTo: "ne",
    GreaterThan: "le",
    GreaterThanOrEqual: "lt",
    LessThan: "ge",
    LessThanOrEqual: "gt",
}


def _literal(value: Any, odata_version: int) -> str | None:
    """OData literal encoding; None => not pushable."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, dt.datetime):
        iso = value.isoformat()
        return f"datetime'{iso}'" if odata_version == 2 else iso
    if isinstance(value, dt.date):
        return f"datetime'{value.isoformat()}'" if odata_version == 2 else value.isoformat()
    if isinstance(value, str):
        if value == "" or len(value) > _MAX_VALUE_LEN:
            return None  # reference skip rules -> residual evaluation
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    return None


def _column(attr: tuple[str, ...] | str) -> str:
    if isinstance(attr, tuple):
        return "/".join(attr)  # nested path -> OData path expression
    return str(attr)


def _translate_one(f: Filter, odata_version: int) -> str | None:
    """One filter -> OData expression, or None if not pushable."""
    t = type(f)
    if t in _OPS:
        if f.value is None:
            # Spark's `col = null` / `col > null` match NOTHING (null
            # semantics), but OData `col eq null` matches null rows —
            # leave residual so Spark keeps its own semantics.
            return None
        lit = _literal(f.value, odata_version)
        if lit is None:
            return None
        return f"{_column(f.attribute)} {_OPS[t]} {lit}"
    if t is IsNull:
        return f"{_column(f.attribute)} eq null"
    if t is IsNotNull:
        return f"{_column(f.attribute)} ne null"
    if t is In:
        parts = []
        for v in f.value:  # In.value is the tuple of candidates
            if v is None:
                # A null candidate never matches under Spark's IN (null
                # comparison yields null -> row filtered); pushing
                # `col eq null` would wrongly admit null rows. Skip it.
                continue
            lit = _literal(v, odata_version)
            if lit is None:
                return None
            parts.append(f"{_column(f.attribute)} eq {lit}")
        if not parts:
            return None  # residual: Spark's IN(list-of-nulls) keeps no rows
        return "(" + " or ".join(parts) + ")"
    if t is StringStartsWith:
        lit = _literal(f.value, odata_version)
        if lit is None:
            return None
        return f"startswith({_column(f.attribute)}, {lit})"
    if t is StringEndsWith:
        lit = _literal(f.value, odata_version)
        if lit is None:
            return None
        return f"endswith({_column(f.attribute)}, {lit})"
    if t is StringContains:
        lit = _literal(f.value, odata_version)
        if lit is None:
            return None
        if odata_version == 2:
            return f"substringof({lit}, {_column(f.attribute)})"
        return f"contains({_column(f.attribute)}, {lit})"
    if t is Not:
        inner = f.child
        it = type(inner)
        if it in _NEGATED_OPS:
            if inner.value is None:
                return None  # Spark NOT(col = null) keeps no rows; residual
            lit = _literal(inner.value, odata_version)
            if lit is None:
                return None
            col = _column(inner.attribute)
            # Guard against OData's null semantics diverging from Spark's:
            # `null ne 'v'` is TRUE in OData v4 (null equals only itself)
            # while Spark's NOT(col = v) filters null rows out. Since
            # pushed filters are not re-applied by Spark, AND an explicit
            # null exclusion onto every negated comparison.
            return f"({col} {_NEGATED_OPS[it]} {lit} and {col} ne null)"
        if it is IsNull:
            return f"{_column(inner.attribute)} ne null"
        if it is IsNotNull:
            return f"{_column(inner.attribute)} eq null"
        if not hasattr(inner, "attribute"):
            return None  # Not(Not(...)) etc. — residual
        if it is In and any(v is None for v in inner.value):
            # The positive-context rule "null candidates never match" does
            # not survive negation: NOT(x IN (a, null)) is null (drop) for
            # every non-matching x in Spark, but `not (x eq a)` keeps it.
            return None
        sub = _translate_one(inner, odata_version)
        if sub is None:
            return None
        # Same null guard as the negated comparisons: OData's 2-valued
        # `null eq 'a'` is false, so `not (...)` would KEEP null rows,
        # while Spark's 3-valued NOT drops them.
        col = _column(inner.attribute)
        return f"(not ({sub}) and {col} ne null)"
    return None


def translate_filters(
    filters: list[Filter], odata_version: int = 4
) -> tuple[str | None, list[Filter], list[Filter]]:
    """Translate pushable filters; return ($filter expr, pushed, residual).

    Filters are implicitly ANDed, so each translates independently and the
    expression joins them with ``and`` (reference :584-591). Anything not
    translatable goes into the residual list for Spark to re-apply.
    """
    exprs: list[str] = []
    pushed: list[Filter] = []
    residual: list[Filter] = []
    for f in filters:
        e = _translate_one(f, odata_version)
        if e is None:
            residual.append(f)
        else:
            exprs.append(e)
            pushed.append(f)
    return (" and ".join(exprs) if exprs else None, pushed, residual)
